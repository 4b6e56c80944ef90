#!/usr/bin/env python
"""Repair pass: re-tune shapes where an eval CSV shows the candidate losing.

The dispatch invariant is 'never lose to stock XLA' — the XLA sentinel
competes in every search, so a CSV row with speedup < 1 against any XLA
baseline means the stored config is stale or was tuned under noise.  This
tool re-tunes those shapes with a bigger measurement budget and drops their
rows from the CSV so a subsequent `run_suite.py eval` re-measures them.

  python scripts/repair_losses.py --csv eval_results/foo.csv \
      --threshold 0.97 [--acc float32]
"""

from __future__ import annotations

import argparse
import csv
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--csv", required=True)
    ap.add_argument("--threshold", type=float, default=0.97)
    ap.add_argument("--acc", default="float32")
    ap.add_argument("--stage2_rounds", type=int, default=10)
    ap.add_argument("--max_candidates", type=int, default=20)
    ap.add_argument("--dry_run", action="store_true")
    args = ap.parse_args(argv)

    path = Path(args.csv)
    with path.open() as f:
        rows = list(csv.DictReader(f))
        fieldnames = list(rows[0].keys()) if rows else []

    losers = []
    for r in rows:
        vals = [float(v) for c, v in r.items() if c != "mnk" and v]
        if vals and min(vals) < args.threshold:
            losers.append(r["mnk"])
    print(f"{len(losers)} losing rows: {losers}", file=sys.stderr)
    if args.dry_run or not losers:
        return 0

    shapes = [tuple(map(int, s.split("x"))) for s in losers]
    from tpul2.autotune.search import tune_many
    from tpul2.autotune.db import default_db

    tune_many(shapes, acc=args.acc, db=default_db(), skip_tuned=False,
              max_candidates=args.max_candidates,
              stage1_rounds=4, stage2_rounds=args.stage2_rounds,
              finalists=5, verbose=True)

    keep = [r for r in rows if r["mnk"] not in set(losers)]
    with path.open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fieldnames)
        w.writeheader()
        w.writerows(keep)
    print(f"dropped {len(rows) - len(keep)} rows from {path}; "
          f"re-run run_suite.py eval to refill", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
