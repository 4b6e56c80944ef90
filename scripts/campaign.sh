#!/bin/bash
# Full-grid offline eval campaign driver (VERDICT r1 next-round #2/#4):
# chunked + resumable over the reference 10^3 grid, both accumulator
# families in one pass (baseline measurements shared).  Each chunk is a
# fresh process (bounds jit-cache growth; the CSV done-set makes resume
# free).  Per-shape failures are recorded in the .failures sidecar and
# skipped (see run_suite.py cmd_eval).
#
# Usage: scripts/campaign.sh [log_file] [chunk_size] [extra run_suite args...]
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/campaign.log}"
CHUNK="${2:-100}"
shift $(( $# > 2 ? 2 : $# ))
# single-instance lock: two concurrent campaign loops would contend the
# TPU (corrupting every measurement) and interleave duplicate CSV rows
exec 9>/tmp/tpul2_campaign.lock
if ! flock -n 9; then
  echo "campaign.sh: another campaign loop holds /tmp/tpul2_campaign.lock" >&2
  exit 1
fi
for i in $(seq 1 60); do
  echo "=== chunk $i start $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 5400 python scripts/run_suite.py eval \
    --accs float32 bfloat16 \
    --out 'eval_results/tpul2_v5e_{acc}_speedup_offline.csv' \
    --chunk_shapes "$CHUNK" "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== chunk $i rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
  if tail -n 200 "$LOG" | grep -q "evaluating 0 shapes"; then
    echo "CAMPAIGN DONE" >> "$LOG"
    break
  fi
  # rc 124 = chunk hit its timeout (fine, resume); other nonzero = back off
  # briefly so a wedged TPU pool claim can clear
  if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ]; then sleep 120; fi
done
