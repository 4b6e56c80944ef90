#!/usr/bin/env python
"""Re-tune thin-K retune targets with a band-specific, larger budget.

VERDICT r3 next-round #5: the thin-K rows NOT at the write-allocate
roofline and NOT already winning (scripts/thin_k_report.py emits the list)
get a second, deeper search: full candidate enumeration (the campaign's
transfer/mini passes searched a handful of seeds), more finalists, longer
stage-2 timing.  candidate_configs already emits the band's structural
variants (full-K-resident bk=k blocks, widest-bn output stripes, full-dim
bm, masked edges); what the campaign lacked was BUDGET, which this tool
supplies for the ~45 shapes per family where headroom provably exists.

Winners persist through the normal 'improve' noise-guard; re-tuned shapes'
CSV rows are then dropped (journal-free — this is a deliberate
re-measurement, not a taint repair) so the next campaign chunk re-measures
them through the standard eval + heal path.

MUST hold the campaign lock (one TPU process; concurrent TuneDB writers
lose updates):
  flock /tmp/tpul2_campaign.lock timeout 5400 \
    python scripts/retune_thin_k.py --targets /tmp/thin_k_targets_f32.txt \
        --acc float32
"""

from __future__ import annotations

import argparse
import csv
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def drop_rows(path: Path, mnks: set) -> int:
    if not path.exists():
        return 0
    with path.open() as f:
        rows = list(csv.DictReader(f))
        fieldnames = rows[0].keys() if rows else None
    keep = [r for r in rows if r["mnk"] not in mnks]
    if fieldnames is None or len(keep) == len(rows):
        return 0
    tmp = path.with_suffix(".tmp")
    with tmp.open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(fieldnames))
        w.writeheader()
        w.writerows(keep)
    tmp.replace(path)
    return len(rows) - len(keep)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--targets", required=True,
                    help="'m,n,k' per line (thin_k_report.py --targets_out)")
    ap.add_argument("--acc", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--csv", default=None,
                    help="offline CSV whose re-tuned rows to drop "
                         "(default: eval_results/tpul2_v5e_<acc>_"
                         "speedup_offline.csv)")
    ap.add_argument("--max_candidates", type=int, default=32)
    ap.add_argument("--finalists", type=int, default=8)
    ap.add_argument("--stage1_rounds", type=int, default=4)
    ap.add_argument("--stage2_rounds", type=int, default=12)
    ap.add_argument("--budget_s", type=float, default=4800.0)
    ap.add_argument("--dry_run", action="store_true")
    args = ap.parse_args(argv)

    shapes = []
    for ln in Path(args.targets).read_text().splitlines():
        ln = ln.strip()
        if ln and not ln.startswith("#"):
            shapes.append(tuple(int(x) for x in ln.split(",")))
    csv_path = Path(args.csv or
                    f"eval_results/tpul2_v5e_{args.acc}"
                    f"_speedup_offline.csv")
    print(f"retune_thin_k: {len(shapes)} shapes / {args.acc}",
          file=sys.stderr)
    if args.dry_run:
        return 0

    from tpul2.autotune.db import default_db
    from tpul2.autotune.search import tune_shape
    from tpul2.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    db = default_db()
    t0 = time.time()
    improved, retuned = [], []
    for (m, n, k) in shapes:
        if time.time() - t0 > args.budget_s:
            print(f"budget reached after {len(retuned)} shapes; resumable "
                  f"(re-run with the remaining targets)", file=sys.stderr)
            break
        before = db.get_entry(m, n, k, args.acc)
        before_tf = (before or {}).get("tflops", 0.0)
        try:
            res = tune_shape(m, n, k, acc=args.acc, db=db,
                             max_candidates=args.max_candidates,
                             stage1_rounds=args.stage1_rounds,
                             stage2_rounds=args.stage2_rounds,
                             finalists=args.finalists,
                             save="improve", verbose=False)
        except Exception as e:
            print(f"{m}x{n}x{k}: retune failed "
                  f"({type(e).__name__}: {str(e)[:120]})", file=sys.stderr)
            continue
        retuned.append(f"{m}x{n}x{k}")
        gain = res.best_tflops / before_tf if before_tf else float("inf")
        if gain > 1.10:
            improved.append(f"{m}x{n}x{k}")
        print(f"{m}x{n}x{k}/{args.acc}: {res.speedup:.3f}x vs XLA, "
              f"{res.best_tflops:.1f} TFLOPS "
              f"({gain:.2f}x vs stored) "
              f"[{time.time() - t0:.0f}s]", file=sys.stderr)

    # drop ALL retuned rows — the re-measurement under the standard eval
    # publishes the (possibly unchanged) honest number either way
    dropped = drop_rows(csv_path, set(retuned))
    print(f"retuned {len(retuned)} shapes ({len(improved)} improved "
          f">10%); dropped {dropped} CSV rows for re-measurement",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
