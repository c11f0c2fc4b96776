#!/usr/bin/env python3
"""Per-query quiet band: build from committed same-code bench replicates,
then auto-classify ANY bench run (including the driver's) against it.

The round-3/round-4 verdicts both had to reconcile driver bench numbers
that landed in a degraded host phase (co-tenant stalls: q_ktruss 79.7 s vs
5.9-7.4 s committed; PR 1.70M e/s vs 4.49M committed) by prose. This makes
that reconciliation mechanical:

  build    python3 scripts/quiet_band.py build BENCH/quiet_band.json run1.json run2.json run3.json
  classify python3 scripts/quiet_band.py classify BENCH/quiet_band.json BENCH_r05.json

Band per query: [lo, hi] = [min/RTOL, max*RTOL + ATOL] over the replicate
walls, where RTOL=1.5 and ATOL=1.0 s. The band is deliberately generous —
its job is to separate same-code noise (<=1.5x + scheduling jitter) from
the 2-10x co-tenant stall signature, not to detect small regressions
(round-over-round per-query diffs do that). The PR headline gets the same
treatment via pr_edges_per_sec (inverted: a SLOW host gives a LOW number).

classify exit code: 0 if every query is in band, 1 otherwise; the JSON
report goes to stdout so a driver/judge can commit it next to the run.
"""
import json
import sys

RTOL = 1.5
ATOL = 1.0


def load(p):
    with open(p) as f:
        return json.load(f)


def build(out, runs):
    reps = [load(r) for r in runs]
    names = set(reps[0]["queries"])
    for r in reps[1:]:
        names &= set(r["queries"])
    band = {}
    for q in sorted(names):
        vals = [r["queries"][q] for r in reps if r["queries"][q] >= 0]
        if not vals:
            continue
        band[q] = {
            "median": sorted(vals)[len(vals) // 2],
            "lo": min(vals) / RTOL,
            "hi": max(vals) * RTOL + ATOL,
            "samples": vals,
        }
    prs = [r["pr_edges_per_sec"] for r in reps if "pr_edges_per_sec" in r]
    doc = {
        "rtol": RTOL,
        "atol_sec": ATOL,
        "replicates": runs,
        "queries": band,
        "pr_edges_per_sec": {
            "median": sorted(prs)[len(prs) // 2] if prs else None,
            "lo": (min(prs) / RTOL) if prs else None,
            "samples": prs,
        },
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"wrote {out}: {len(band)} query bands from {len(reps)} replicates")


def classify(band_path, run_path):
    band = load(band_path)
    run = load(run_path)
    out = {"run": run_path, "band": band_path, "queries": {}, "new": []}
    n_in = n_slow = n_fast = 0
    for q, wall in sorted(run.get("queries", {}).items()):
        b = band["queries"].get(q)
        if b is None:
            out["new"].append(q)
            continue
        if wall > b["hi"]:
            verdict = "OUT_SLOW"
            n_slow += 1
        elif wall < b["lo"]:
            verdict = "OUT_FAST"
            n_fast += 1
        else:
            verdict = "IN"
            n_in += 1
        out["queries"][q] = {
            "wall": wall,
            "band": [round(b["lo"], 3), round(b["hi"], 3)],
            "x_median": round(wall / b["median"], 2) if b["median"] else None,
            "verdict": verdict,
        }
    pr = run.get("pr_edges_per_sec")
    prb = band.get("pr_edges_per_sec") or {}
    if pr is not None and prb.get("lo") is not None:
        out["pr_edges_per_sec"] = {
            "value": pr,
            "lo": prb["lo"],
            "x_median": round(pr / prb["median"], 2),
            "verdict": "IN" if pr >= prb["lo"] else "OUT_SLOW",
        }
    out["summary"] = {
        "in": n_in,
        "out_slow": n_slow,
        "out_fast": n_fast,
        "new_queries": len(out["new"]),
        "host_phase": (
            "degraded"
            if n_slow > max(2, 0.05 * (n_in + n_slow + n_fast))
            or out.get("pr_edges_per_sec", {}).get("verdict") == "OUT_SLOW"
            else "quiet"
        ),
    }
    print(json.dumps(out, indent=1, sort_keys=True))
    return 0 if n_slow == 0 else 1


def main():
    if len(sys.argv) < 4 or sys.argv[1] not in ("build", "classify"):
        print(__doc__)
        return 2
    if sys.argv[1] == "build":
        build(sys.argv[2], sys.argv[3:])
        return 0
    return classify(sys.argv[2], sys.argv[3])


if __name__ == "__main__":
    sys.exit(main())
