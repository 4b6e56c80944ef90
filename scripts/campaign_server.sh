#!/bin/bash
# Server-mode (Poisson-request) eval campaign driver (VERDICT r2 next-round
# #5: extend server coverage beyond the 125-shape sub-grid).  Default scope
# is the full {64..8192} 8-dim sub-grid = 512 shapes — every band of the
# offline grid represented, only the 12288/16384 slices omitted (documented
# in BENCH_NOTES).  Chunked + resumable exactly like campaign.sh; rows
# carry iqr_rel/quality columns and go through the same journaled repair +
# never-lose healing.
#
# Shapes run in stratified order (proportional-fair band merge), so a
# wall-clock truncation preserves the grid's band composition instead of
# dropping everything expensive.
#
# Usage: scripts/campaign_server.sh [log_file] [chunk_size] [extra args...]
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/campaign_server.log}"
CHUNK="${2:-60}"
shift $(( $# > 2 ? 2 : $# ))
exec 9>/tmp/tpul2_campaign.lock
if ! flock -n 9; then
  echo "campaign_server.sh: another campaign loop holds the lock" >&2
  exit 1
fi
for i in $(seq 1 60); do
  echo "=== server chunk $i start $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 5400 python scripts/run_suite.py eval_server \
    --dims 64 128 256 512 1024 2048 4096 8192 \
    --order stratified \
    --accs float32 bfloat16 \
    --out 'eval_results/tpul2_v5e_{acc}_speedup_server.csv' \
    --chunk_shapes "$CHUNK" "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== server chunk $i rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
  if tail -n 200 "$LOG" | grep -q "server-evaluating 0 shapes"; then
    echo "SERVER CAMPAIGN DONE" >> "$LOG"
    break
  fi
  if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ]; then sleep 120; fi
done
