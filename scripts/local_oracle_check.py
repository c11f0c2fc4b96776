#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 scripts/local_oracle_check.py <verifyOut> <sfDir>

Loads each <verifyOut>/<name> parquet (Spark result), runs the matching
oracle SQL from <verifyOut>/oracle_sql.json in DuckDB over the sfDir
parquet tables, then compares: row count, column names (sorted), and the
multiset of value tuples (columns sorted by name, floats rounded to 7
decimals — the driver's hash compare is order-insensitive and
column-name-keyed, so this is the same pass/fail signal).
"""
import json, sys, math
from pathlib import Path

import duckdb

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        t = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = f"{v:.7f}"
            t.append(repr(v))
        out.append(tuple(t))
    out.sort()
    return [cols[i] for i in order], out


def main(vout, sfdir):
    sql = json.loads((Path(vout) / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sfdir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = n_noor = 0
    for d in sorted(Path(vout).iterdir()):
        if not d.is_dir():
            continue
        name = d.name
        res = con.execute(
            f"SELECT * FROM read_parquet('{d}/*.parquet')")
        scols = [c[0] for c in res.description]
        srows = res.fetchall()
        if name not in sql:
            n_noor += 1
            print(f"{name:24s} NO_ORACLE  spark_rows={len(srows)}")
            continue
        try:
            ores = con.execute(sql[name])
            ocols = [c[0] for c in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            n_fail += 1
            print(f"{name:24s} ORACLE_SQL_ERROR: {e}")
            continue
        sc, sv = canon(srows, scols)
        oc, ov = canon(orows, ocols)
        ok_rows = len(sv) == len(ov)
        ok_schema = sc == oc
        ok_hash = sv == ov
        if ok_rows and ok_schema and ok_hash:
            n_pass += 1
            print(f"{name:24s} PASS  rows={len(sv)}")
        else:
            n_fail += 1
            print(f"{name:24s} FAIL  rows {len(sv)}/{len(ov)} "
                  f"schema_match={ok_schema} hash_match={ok_hash}")
            if not ok_schema:
                print(f"  spark cols:  {sc}\n  oracle cols: {oc}")
            elif ok_rows:
                diff = [(a, b) for a, b in zip(sv, ov) if a != b][:3]
                for a, b in diff:
                    print(f"  spark:  {a}\n  oracle: {b}")
            else:
                so, oo = set(sv), set(ov)
                for x in list(so - oo)[:3]:
                    print(f"  spark-only:  {x}")
                for x in list(oo - so)[:3]:
                    print(f"  oracle-only: {x}")
    print(f"\n{n_pass} pass / {n_fail} fail / {n_noor} no_oracle")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
