#!/usr/bin/env bash
# Round-4 gated 2->8 replicate campaign (BENCH/BASELINE.md, round-4 gate).
#
# Runs N replicates of the PAIR="2 8" scaling protocol from a pristine
# git-archive copy of HEAD in /tmp (so builder-session edits/locks in the
# working tree cannot touch the measured binary), copies every replicate's
# JSON into BENCH/scaling/, and appends a gate-evaluated row to
# BENCH/scaling/r4_results.md. The gate is PRE-REGISTERED in
# BENCH/BASELINE.md: accept iff 2-core loop cpu_sec in [150,200] AND
# 8-core loop cpu_sec in [165,195]; every replicate is recorded either way.
#
# Usage: scripts/scaling_campaign.sh [numReplicates] [startIndex]
set -euo pipefail
cd "$(dirname "$0")/.."
REPO="$PWD"
N="${1:-1}"
START="${2:-1}"
WORK=/tmp/graft-campaign
# rebuild whenever HEAD moved: a stale work dir would silently measure an
# old binary while recording its JSONs as evidence for current HEAD
if [[ ! -d "$WORK/src" || "$(cat "$WORK/COMMIT" 2>/dev/null)" != "$(git rev-parse HEAD)" ]]; then
  rm -rf "$WORK"
  mkdir -p "$WORK"
  git archive HEAD | tar -x -C "$WORK"
  git rev-parse HEAD > "$WORK/COMMIT"
  # compile once on the full machine — otherwise the first leg compiles
  # inside its 2-core taskset
  ( cd "$WORK" && sbt -batch compile >/dev/null 2>&1 )
fi
echo "campaign source commit: $(cat "$WORK/COMMIT")"
for i in $(seq "$START" $((START + N - 1))); do
  OUT="/tmp/scaling_r4_rep$i"
  ( cd "$WORK" && PAIR="2 8" scripts/scaling_run.sh 16000000 10 "$OUT" ) \
    | tail -4
  cp "$OUT/cores2.json" "$REPO/BENCH/scaling/r4_rep${i}_cores2.json"
  cp "$OUT/cores8.json" "$REPO/BENCH/scaling/r4_rep${i}_cores8.json"
  python3 - "$REPO" "$i" "$(cat "$WORK/COMMIT")" <<'EOF'
import json, sys
repo, i, commit = sys.argv[1], sys.argv[2], sys.argv[3][:9]
a = json.load(open(f"{repo}/BENCH/scaling/r4_rep{i}_cores2.json"))
b = json.load(open(f"{repo}/BENCH/scaling/r4_rep{i}_cores8.json"))
eff = b["edges_per_sec"] / (4 * a["edges_per_sec"])
g2, g8 = 150 <= a["cpu_sec"] <= 200, 165 <= b["cpu_sec"] <= 195
bad = [n for n, ok in (("2-core", g2), ("8-core", g8)) if not ok]
gate = "ACCEPT" if not bad else f"REJECT ({'+'.join(bad)} leg out of band)"
line = (f'| r4_rep{i} | {a["edges_per_sec"]:.3e} | {b["edges_per_sec"]:.3e} '
        f'| {a["cpu_sec"]:.0f} | {b["cpu_sec"]:.0f} | {eff:.3f} | {gate} '
        f'| {commit} |')
print(line)
with open(f"{repo}/BENCH/scaling/r4_results.md", "a") as f:
    f.write(line + "\n")
EOF
done
