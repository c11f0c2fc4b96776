#!/usr/bin/env bash
# N-vs-4N scaling evidence runner (BENCH/BASELINE.md).
#
# Protocol: identical job + input + shuffle partitioning (P pinned by
# ScalingBench) at two CPU budgets. The N-core level is confined with
# taskset so GC/JIT/IO threads also live inside the N cores — the honest
# analogue of an N-core executor fleet (task brief: "N and 4N cores").
# One JVM per level (one SparkContext per JVM).
set -euo pipefail
cd "$(dirname "$0")/.."
ROWS="${1:-16000000}"
ITERS="${2:-10}"
MEM="${SPARK_DRIVER_MEM:-48g}"
OUT="${3:-/tmp/scaling}"
MODE="${4:-none}"    # comma-set: salted,spmv,declarative,shj ('none' = default)
MAXDEG="${5:-65536}" # hub-chunk size (ScalingBench arg 5); placeholder
                     # values keep the positional args from collapsing
                     # (empty $MODE would shift $MAXDEG into the mode slot)
PAIR="${PAIR:-8 32}" # "N 4N" core counts
read -r N1 N2 <<<"$PAIR"
mkdir -p "$OUT"
# CLUSTER=1: run each level as cores/8 separate 8-thread EXECUTOR JVMs
# (Spark local-cluster) — the literal N-executors-vs-4N-executors form of
# the rule, with per-executor heaps/GC like a real fleet. Requires the
# packaged app jar (executors fetch it; lambdas don't deserialize from
# the inherited system classpath alone).
if [[ "${CLUSTER:-0}" == "1" ]]; then
  sbt -batch package >/dev/null
  export GRAFT_JAR="$PWD/target/scala-2.13/gmsparqlspark_2.13-0.1.0.jar"
  export SPARK_HOME="${SPARK_HOME:-/opt/spark}"
  export SPARK_SCALA_VERSION=2.13
fi
for CORES in $N1 $N2; do
  LAST=$((CORES - 1))
  LVLMODE="$MODE"
  if [[ "${CLUSTER:-0}" == "1" ]]; then
    if (( CORES % 8 != 0 || CORES < 8 )); then
      echo "CLUSTER=1 needs core counts that are multiples of 8 (got $CORES)" >&2
      exit 2
    fi
    EXECS=$((CORES / 8))
    if [[ "$LVLMODE" == "none" ]]; then LVLMODE="cluster$EXECS"
    else LVLMODE="$LVLMODE,cluster$EXECS"; fi
  fi
  echo "=== cores=$CORES rows=$ROWS iters=$ITERS mem=$MEM mode=$LVLMODE maxdeg=$MAXDEG (taskset 0-$LAST)"
  SPARK_DRIVER_MEM="$MEM" taskset -c "0-$LAST" \
    sbt -batch "runMain graft.ScalingBench $CORES $ROWS $ITERS $LVLMODE $MAXDEG" 2>&1 \
    | grep -o '{"bench":"scaling".*}' | tee "$OUT/cores$CORES.json"
done
python3 - "$OUT" "$N1" "$N2" <<'EOF'
import json, sys
out, n1, n2 = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
a = json.load(open(f"{out}/cores{n1}.json"))
b = json.load(open(f"{out}/cores{n2}.json"))
eff = b["edges_per_sec"] / ((n2 / n1) * a["edges_per_sec"])
for t in (a, b):
    print(f'N={t["cores"]}: {t["edges_per_sec"]:.3e} e/s  wall={t["seconds"]:.1f}s gc={t["gc_sec"]:.1f}s util={t["util"]:.2f} cpu={t["cpu_sec"]:.0f}s')
print(f'scaling efficiency {n1}->{n2} = {eff:.3f} (target >= 0.8)')
EOF
