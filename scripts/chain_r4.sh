#!/bin/bash
# Round-4 TPU orchestrator — ONE TPU process at a time (CLAUDE.md protocol),
# phases in VERDICT r3 priority order, everything resumable:
#
#   1. on-chip correctness campaign (next-round #8) — bounded first slice,
#      completed opportunistically at the end
#   2. server campaign, fresh CSVs under per-mode dispatch (next-round #3):
#      full {64..8192}^3 stratified sub-grid, both families per pass
#   3. offline grid completion (next-round #4), transfer-mode tail
#   4. serving-CSV repair pass under the round-4 methodology
#   5. finish the correctness campaign if phase 1 hit its budget
#
# Usage: scripts/chain_r4.sh [log_dir]
set -u
cd "$(dirname "$0")/.."
LOGD="${1:-/tmp}"
CORLOG="$LOGD/r4_correctness_tpu.log"
SRVLOG="$LOGD/r4_server.log"
OFFLOG="$LOGD/r4_offline.log"

run_locked() {  # run_locked <timeout_s> <cmd...>
  local t="$1"; shift
  flock /tmp/tpul2_campaign.lock timeout "$t" "$@"
}

# Phase 1: on-TPU correctness, first slice (~50 min budget, resumable).
echo "chain_r4: correctness phase $(date -u +%H:%M:%S)" >> "$CORLOG"
run_locked 3900 python scripts/correctness_campaign_tpu.py \
  --budget_s 3000 >> "$CORLOG" 2>&1
sleep 60

# Phase 2: server campaign (fresh start; stratified; chunked).
for i in $(seq 1 40); do
  grep -q "SERVER CAMPAIGN DONE" "$SRVLOG" 2>/dev/null && break
  echo "=== server chunk $i start $(date -u +%H:%M:%S) ===" >> "$SRVLOG"
  run_locked 5400 python scripts/run_suite.py eval_server \
    --dims 64 128 256 512 1024 2048 4096 8192 \
    --order stratified \
    --accs float32 bfloat16 \
    --n_requests 12 --request_ms 70 \
    --out 'eval_results/tpul2_v5e_{acc}_speedup_server.csv' \
    --chunk_shapes 60 >> "$SRVLOG" 2>&1
  rc=$?
  echo "=== server chunk $i rc=$rc $(date -u +%H:%M:%S) ===" >> "$SRVLOG"
  if tail -n 200 "$SRVLOG" | grep -q "server-evaluating 0 shapes"; then
    echo "SERVER CAMPAIGN DONE" >> "$SRVLOG"; break
  fi
  # stop the server phase when its wall share is spent so phase 3 gets time
  if [ -f /tmp/r4_stop_server ]; then
    echo "chain_r4: server phase stopped by /tmp/r4_stop_server" >> "$SRVLOG"
    break
  fi
  [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ] && sleep 120
done
sleep 120

# Phase 3: offline grid completion (cost-ascending tail; transfer tuning).
for i in $(seq 1 40); do
  grep -q "CAMPAIGN DONE" "$OFFLOG" 2>/dev/null && break
  echo "=== offline chunk $i start $(date -u +%H:%M:%S) ===" >> "$OFFLOG"
  run_locked 5400 python scripts/run_suite.py eval \
    --accs float32 bfloat16 \
    --tune_mode transfer \
    --out 'eval_results/tpul2_v5e_{acc}_speedup_offline.csv' \
    --chunk_shapes 40 >> "$OFFLOG" 2>&1
  rc=$?
  echo "=== offline chunk $i rc=$rc $(date -u +%H:%M:%S) ===" >> "$OFFLOG"
  if tail -n 200 "$OFFLOG" | grep -q "evaluating 0 shapes"; then
    echo "CAMPAIGN DONE" >> "$OFFLOG"; break
  fi
  if [ -f /tmp/r4_stop_offline ]; then
    echo "chain_r4: offline phase stopped" >> "$OFFLOG"; break
  fi
  [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ] && sleep 120
done
sleep 120

# Phase 4: serving CSVs under round-4 methodology (repair re-measures
# tainted rows only; 20 shapes, minutes).
run_locked 3600 python scripts/run_suite.py eval \
  --accs float32 bfloat16 \
  --shapes @scripts/serving_shapes.txt \
  --out 'eval_results/tpul2_v5e_{acc}_speedup_serving.csv' \
  >> "$OFFLOG" 2>&1
sleep 60

# Phase 5: finish the correctness campaign if anything is left.
run_locked 3900 python scripts/correctness_campaign_tpu.py \
  --budget_s 3300 >> "$CORLOG" 2>&1

echo "chain_r4: all phases done $(date -u +%H:%M:%S)" | tee -a "$SRVLOG" >> "$OFFLOG"
