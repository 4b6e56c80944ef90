#!/bin/bash
# Round-5 session-C TPU orchestrator — continues the round-5 scale-up
# (VERDICT r4 #2/#3) after chain_r5b.sh's budget expires.  Takes an
# ABSOLUTE epoch deadline so the driver's end-of-round bench.py always
# finds the chip free regardless of when this chain starts.
#
# Usage: chain_r5c.sh <deadline_epoch_s>
# Stop controls: same files as chain_r5b (/tmp/r5_stop_*).
set -u
cd "$(dirname "$0")/.."
DEADLINE="${1:?usage: chain_r5c.sh <deadline_epoch_s>}"
SRVLOG=/tmp/r5c_server.log
OFFLOG=/tmp/r5c_offline.log

left() { echo $(( DEADLINE - $(date +%s) )); }
run_locked() { local t="$1"; shift; flock /tmp/tpul2_campaign.lock timeout "$t" "$@"; }
stopped() { [ -f /tmp/r5_stop_all ]; }

for i in $(seq 1 20); do
  stopped && break
  L=$(left); [ "$L" -lt 900 ] && { echo "deadline" >> "$SRVLOG"; break; }

  if [ ! -f /tmp/r5_stop_server ]; then
    echo "=== r5c server chunk $i start $(date -u +%H:%M:%S) left=${L}s ===" >> "$SRVLOG"
    run_locked $(( L - 720 < 3600 ? L - 720 : 3600 )) python scripts/run_suite.py eval_server \
      --dims 64 128 256 512 1024 2048 4096 8192 \
      --order stratified \
      --accs float32 bfloat16 \
      --n_requests 12 --request_ms 70 \
      --out 'eval_results/tpul2_v5e_{acc}_speedup_server.csv' \
      --chunk_shapes 40 >> "$SRVLOG" 2>&1
    echo "=== r5c server chunk $i rc=$? $(date -u +%H:%M:%S) ===" >> "$SRVLOG"
    sleep 60
  fi

  stopped && break
  L=$(left); [ "$L" -lt 1500 ] && { echo "deadline" >> "$OFFLOG"; break; }
  if [ ! -f /tmp/r5_stop_offline ]; then
    echo "=== r5c offline chunk $i start $(date -u +%H:%M:%S) left=${L}s ===" >> "$OFFLOG"
    run_locked $(( L - 900 < 2400 ? L - 900 : 2400 )) python scripts/run_suite.py eval \
      --accs float32 bfloat16 \
      --tune_mode transfer \
      --out 'eval_results/tpul2_v5e_{acc}_speedup_offline.csv' \
      --chunk_shapes 20 >> "$OFFLOG" 2>&1
    echo "=== r5c offline chunk $i rc=$? $(date -u +%H:%M:%S) ===" >> "$OFFLOG"
    sleep 60
  fi
done

touch /tmp/r5c_all_done
echo "chain_r5c: done $(date -u +%H:%M:%S)" >> "$SRVLOG"
