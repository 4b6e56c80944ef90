#!/bin/bash
# Round-5 session-D TPU orchestrator — final scale-up pass after the
# campaign-closure commit (VERDICT r4 next-round #2/#3): interleaves
# server-regime rows (toward >=300/family) with the offline giant tail
# (max dim >= 12288, cost-ascending, resumable).  Takes an ABSOLUTE epoch
# deadline so the driver's end-of-round bench.py always finds the chip
# free.  Stop controls: /tmp/r5_stop_server, /tmp/r5_stop_offline,
# /tmp/r5_stop_all.
#
# Usage: chain_r5d.sh <deadline_epoch_s>
set -u
cd "$(dirname "$0")/.."
DEADLINE="${1:?usage: chain_r5d.sh <deadline_epoch_s>}"
SRVLOG=/tmp/r5d_server.log
OFFLOG=/tmp/r5d_offline.log

left() { echo $(( DEADLINE - $(date +%s) )); }
run_locked() { local t="$1"; shift; flock /tmp/tpul2_campaign.lock timeout "$t" "$@"; }
stopped() { [ -f /tmp/r5_stop_all ]; }

for i in $(seq 1 30); do
  stopped && break
  L=$(left); [ "$L" -lt 900 ] && { echo "deadline" >> "$SRVLOG"; break; }

  if [ ! -f /tmp/r5_stop_server ]; then
    echo "=== r5d server chunk $i start $(date -u +%H:%M:%S) left=${L}s ===" >> "$SRVLOG"
    run_locked $(( L - 720 < 2700 ? L - 720 : 2700 )) python scripts/run_suite.py eval_server \
      --dims 64 128 256 512 1024 2048 4096 8192 \
      --order stratified \
      --accs float32 bfloat16 \
      --n_requests 12 --request_ms 70 \
      --out 'eval_results/tpul2_v5e_{acc}_speedup_server.csv' \
      --chunk_shapes 30 >> "$SRVLOG" 2>&1
    echo "=== r5d server chunk $i rc=$? $(date -u +%H:%M:%S) ===" >> "$SRVLOG"
    sleep 45
  fi

  stopped && break
  L=$(left); [ "$L" -lt 1500 ] && { echo "deadline" >> "$OFFLOG"; break; }
  if [ ! -f /tmp/r5_stop_offline ]; then
    echo "=== r5d offline chunk $i start $(date -u +%H:%M:%S) left=${L}s ===" >> "$OFFLOG"
    run_locked $(( L - 900 < 2700 ? L - 900 : 2700 )) python scripts/run_suite.py eval \
      --accs float32 bfloat16 \
      --tune_mode transfer \
      --out 'eval_results/tpul2_v5e_{acc}_speedup_offline.csv' \
      --chunk_shapes 12 >> "$OFFLOG" 2>&1
    echo "=== r5d offline chunk $i rc=$? $(date -u +%H:%M:%S) ===" >> "$OFFLOG"
    sleep 45
  fi
done

touch /tmp/r5d_all_done
echo "chain_r5d: done $(date -u +%H:%M:%S)" >> "$SRVLOG"
