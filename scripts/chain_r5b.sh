#!/bin/bash
# Round-5 session-B TPU orchestrator — resumes the round-5 plan after the
# VM restart wiped /tmp (the chain_r5.sh state files and logs).  Same
# protocol: ONE TPU process at a time via flock, every phase resumable,
# stop files + a global deadline so the driver's end-of-round bench.py
# always finds the chip free.
#
#   1. on-chip correctness campaign (config-aware resume: re-verifies the
#      entries retuned/demoted since the last pass; VERDICT r4 #4)
#   2. serving shapes under the SERVER regime (VERDICT r4 #10)
#   3. bounded deep retune of 8192^3 (VERDICT r4 #5: the MFU gap)
#   4. interleaved scale-up until the deadline (VERDICT r4 #2/#3):
#      server chunk (60 shapes) : offline chunk (30 shapes), repeating —
#      both campaigns advance even if the wall runs out mid-way
#   5. final on-chip correctness pass over anything the loops retuned
#
# Stop controls: touch /tmp/r5_stop_server, /tmp/r5_stop_offline, or
# /tmp/r5_stop_all.  Deadline: $1 seconds of loop budget (default 15000).
set -u
cd "$(dirname "$0")/.."
BUDGET="${1:-15000}"
T0=$(date +%s)
CORLOG=/tmp/r5b_correctness.log
SRVLOG=/tmp/r5b_server.log
OFFLOG=/tmp/r5b_offline.log
RTLOG=/tmp/r5b_retunes.log

left() { echo $(( BUDGET - ($(date +%s) - T0) )); }
run_locked() {  # run_locked <timeout_s> <cmd...>
  local t="$1"; shift
  flock /tmp/tpul2_campaign.lock timeout "$t" "$@"
}
stopped() { [ -f /tmp/r5_stop_all ]; }

# Phase 1: correctness re-verify (1 pending config + any new demotions).
echo "chain_r5b: correctness phase $(date -u +%H:%M:%S)" >> "$CORLOG"
stopped || run_locked 1500 python scripts/correctness_campaign_tpu.py \
  --budget_s 1200 >> "$CORLOG" 2>&1
sleep 60

# Phase 2: serving shapes under the SERVER regime — fixed cost, runs early.
echo "chain_r5b: serving-server $(date -u +%H:%M:%S)" >> "$SRVLOG"
stopped || run_locked 4200 python scripts/run_suite.py eval_server \
  --shapes @scripts/serving_shapes.txt \
  --accs float32 bfloat16 \
  --n_requests 12 --request_ms 70 \
  --out 'eval_results/tpul2_v5e_{acc}_speedup_serving_server.csv' \
  >> "$SRVLOG" 2>&1
sleep 60

# Phase 3: bounded 8192^3 deep retune under the widened bm=2048 space.
printf '8192,8192,8192\n' > /tmp/square_targets_r5b.txt
echo "chain_r5b: square retunes $(date -u +%H:%M:%S)" >> "$RTLOG"
for acc in float32 bfloat16; do
  stopped && break
  run_locked 1500 python scripts/retune_thin_k.py \
    --targets /tmp/square_targets_r5b.txt --acc "$acc" \
    --max_candidates 28 --finalists 6 --stage2_rounds 20 \
    --budget_s 1200 >> "$RTLOG" 2>&1
  sleep 60
done

# Phase 4: interleaved server/offline scale-up until the deadline.
SRV_DONE=0; OFF_DONE=0
for i in $(seq 1 60); do
  stopped && break
  [ "$(left)" -lt 600 ] && { echo "deadline" >> "$SRVLOG"; break; }
  [ "$SRV_DONE" = 1 ] && [ "$OFF_DONE" = 1 ] && break

  if [ "$SRV_DONE" = 0 ] && [ ! -f /tmp/r5_stop_server ]; then
    echo "=== server chunk $i start $(date -u +%H:%M:%S) ===" >> "$SRVLOG"
    run_locked 4800 python scripts/run_suite.py eval_server \
      --dims 64 128 256 512 1024 2048 4096 8192 \
      --order stratified \
      --accs float32 bfloat16 \
      --n_requests 12 --request_ms 70 \
      --out 'eval_results/tpul2_v5e_{acc}_speedup_server.csv' \
      --chunk_shapes 60 >> "$SRVLOG" 2>&1
    rc=$?
    echo "=== server chunk $i rc=$rc $(date -u +%H:%M:%S) ===" >> "$SRVLOG"
    tail -n 200 "$SRVLOG" | grep -q "server-evaluating 0 shapes" && SRV_DONE=1
    [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ] && sleep 120
    sleep 60
  fi

  stopped && break
  [ "$(left)" -lt 600 ] && { echo "deadline" >> "$OFFLOG"; break; }
  if [ "$OFF_DONE" = 0 ] && [ ! -f /tmp/r5_stop_offline ]; then
    echo "=== offline chunk $i start $(date -u +%H:%M:%S) ===" >> "$OFFLOG"
    run_locked 4800 python scripts/run_suite.py eval \
      --accs float32 bfloat16 \
      --tune_mode transfer \
      --out 'eval_results/tpul2_v5e_{acc}_speedup_offline.csv' \
      --chunk_shapes 30 >> "$OFFLOG" 2>&1
    rc=$?
    echo "=== offline chunk $i rc=$rc $(date -u +%H:%M:%S) ===" >> "$OFFLOG"
    tail -n 200 "$OFFLOG" | grep -q "evaluating 0 shapes" && OFF_DONE=1
    [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ] && sleep 120
    sleep 60
  fi
done

# Phase 5: final on-chip correctness pass (covers heal-demoted and
# transfer-adopted winners from phase 4).
echo "chain_r5b: final correctness $(date -u +%H:%M:%S)" >> "$CORLOG"
run_locked 2400 python scripts/correctness_campaign_tpu.py \
  --budget_s 1800 >> "$CORLOG" 2>&1

touch /tmp/r5b_all_done
echo "chain_r5b: all phases done $(date -u +%H:%M:%S)" | tee -a "$SRVLOG" >> "$OFFLOG"
