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
mkdir -p "$OUT"
for CORES in 8 32; do
  LAST=$((CORES - 1))
  echo "=== cores=$CORES rows=$ROWS iters=$ITERS mem=$MEM (taskset 0-$LAST)"
  SPARK_DRIVER_MEM="$MEM" taskset -c "0-$LAST" \
    sbt -batch "runMain graft.ScalingBench $CORES $ROWS $ITERS" 2>&1 \
    | grep -o '{"bench":"scaling".*}' | tee "$OUT/cores$CORES.json"
done
python3 - "$OUT" <<'EOF'
import json, sys
out = sys.argv[1]
t8 = json.load(open(f"{out}/cores8.json"))
t32 = json.load(open(f"{out}/cores32.json"))
eff = t32["edges_per_sec"] / (4 * t8["edges_per_sec"])
print(f'N=8:  {t8["edges_per_sec"]:.3e} e/s  wall={t8["seconds"]:.1f}s gc={t8["gc_sec"]:.1f}s util={t8["util"]:.2f} cpu={t8["cpu_sec"]:.0f}s')
print(f'4N=32: {t32["edges_per_sec"]:.3e} e/s  wall={t32["seconds"]:.1f}s gc={t32["gc_sec"]:.1f}s util={t32["util"]:.2f} cpu={t32["cpu_sec"]:.0f}s')
print(f'scaling efficiency = {eff:.3f} (target >= 0.8)')
EOF
