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

# Phase 2: server campaign over the 8-dim sub-grid (512 shapes).
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
