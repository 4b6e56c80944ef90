#!/bin/bash
# Round-3 end-game orchestrator: drive the offline grid campaign to
# completion (resuming across chunk-cap exits), then hand the TPU to the
# server-mode campaign.  ONE TPU process at a time (CLAUDE.md protocol):
# campaign.sh/campaign_server.sh share /tmp/tpul2_campaign.lock, and we
# sleep 180 s between phases so the axon pool claim clears.
#
# Usage: scripts/chain_campaigns.sh [offline_log] [server_log]
set -u
cd "$(dirname "$0")/.."
OFFLOG="${1:-/tmp/campaign_r3_passAB.log}"
SRVLOG="${2:-/tmp/campaign_r3_server.log}"

# Phase 1: wait out any currently-running offline driver, then relaunch
# until the DONE marker lands.
while true; do
  if grep -q "CAMPAIGN DONE" "$OFFLOG" 2>/dev/null; then break; fi
  if flock -n /tmp/tpul2_campaign.lock true 2>/dev/null; then
    # lock free -> no campaign running; relaunch (resume is free)
    echo "chain: (re)launching offline campaign $(date -u +%H:%M:%S)" >> "$OFFLOG"
    bash scripts/campaign.sh "$OFFLOG" 120 --shapes @/tmp/passAB.txt --tune_mode transfer
    sleep 180
  else
    sleep 60
  fi
done

echo "chain: offline campaign done, starting server phase $(date -u +%H:%M:%S)" >> "$SRVLOG"
# Inter-phase gap: no TPU process is running, so the CPU-only tail seeding
# (VERDICT r2 #4: a DB entry for every grid shape) cannot race campaign DB
# writes here.  Doubles as the 3-min pool-clearance wait.
python scripts/seed_tail_entries.py >> "$SRVLOG" 2>&1
sleep 180

# Phase 2a: repair pass over the EXISTING round-2 server sub-grid first
# (VERDICT r2 #2: the bf16 family's -max losses live there; the journaled
# repair drops tainted rows at chunk start and re-measures them through
# healing — ~45 min, so the highest-value server fix lands even if the
# wall clock dies before full coverage).
REPAIR_MARK=/tmp/tpul2_server_repair.done
while [ ! -f "$REPAIR_MARK" ]; do
  if flock -n /tmp/tpul2_campaign.lock true 2>/dev/null; then
    echo "chain: server repair pass $(date -u +%H:%M:%S)" >> "$SRVLOG"
    flock /tmp/tpul2_campaign.lock timeout 5400 \
      python scripts/run_suite.py eval_server \
        --dims 64 256 1024 4096 8192 \
        --accs float32 bfloat16 \
        --out 'eval_results/tpul2_v5e_{acc}_speedup_server.csv' \
        >> "$SRVLOG" 2>&1
    rc=$?
    if [ "$rc" -eq 0 ]; then touch "$REPAIR_MARK"; else sleep 120; fi
  else
    sleep 60
  fi
done

# Phase 2b: full stratified server campaign (8-dim sub-grid, 512 shapes).
while true; do
  if grep -q "SERVER CAMPAIGN DONE" "$SRVLOG" 2>/dev/null; then break; fi
  if flock -n /tmp/tpul2_campaign.lock true 2>/dev/null; then
    echo "chain: (re)launching server campaign $(date -u +%H:%M:%S)" >> "$SRVLOG"
    bash scripts/campaign_server.sh "$SRVLOG" 60
    sleep 180
  else
    sleep 60
  fi
done
echo "chain: all campaigns done $(date -u +%H:%M:%S)" >> "$SRVLOG"
