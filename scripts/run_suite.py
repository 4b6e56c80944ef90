#!/usr/bin/env python
"""Shape-suite runner: tune and/or evaluate the full (M, N, K) grid.

Reproduces the reference's two suite-level artifacts (SURVEY.md C9/C14):
  tune mode  → the per-shape tuned-config database (the reference ships this
               as 3,736 .cu files; we ship tpul2/data/tunedb_<gen>.json+bin)
  eval mode  → per-shape speedup CSVs vs every baseline
               (eval_results/cuda_l2_*_speedup_{offline,server}.csv
               analogues: eval_results/tpul2_<gen>_<acc>_speedup_<mode>.csv,
               columns 'mnk, jnp.matmul, XLA-dot-{tn,nn,max}, ...')

The grid defaults to the reference's {64,128,256,512,1024,2048,4096,8192,
12288,16384}^3 (SURVEY.md §6).  Both modes are resumable: tuned shapes are
skipped, evaluated shapes are skipped if already present in the CSV.

Usage:
  python scripts/run_suite.py tune --dims 64 128 256 --acc float32
  python scripts/run_suite.py eval --mode offline --benchmark_seconds 3 \
      --out eval_results/tpul2_v5e_float32_speedup_offline.csv
"""

from __future__ import annotations

import argparse
import csv
import itertools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REFERENCE_DIMS = [64, 128, 256, 512, 1024, 2048, 4096, 8192, 12288, 16384]

CSV_COLUMNS = ["mnk", "jnp.matmul",
               "XLA-dot-tn", "XLA-dot-nn", "XLA-dot-max",
               "XLA-highest-tn", "XLA-highest-nn", "XLA-highest-max",
               "XLA-AutoTuned-tn", "XLA-AutoTuned-nn", "XLA-AutoTuned-max"]


def grid(dims, max_shapes=None, max_elems=None):
    shapes = [s for s in itertools.product(dims, dims, dims)]
    if max_elems:
        shapes = [s for s in shapes
                  if max(s[0] * s[2], s[2] * s[1], s[0] * s[1]) <= max_elems]
    if max_shapes:
        shapes = shapes[:max_shapes]
    return shapes


def cmd_tune(args) -> int:
    from tpul2.autotune.db import default_db
    from tpul2.autotune.search import tune_many

    db = default_db()
    shapes = grid(args.dims, args.max_shapes, args.max_elems)
    print(f"tuning {len(shapes)} shapes (DB has {len(db)} entries)",
          file=sys.stderr)
    t0 = time.time()
    done = 0
    # chunked so the DB persists incrementally (resume-safe)
    for i in range(0, len(shapes), args.chunk):
        chunk = shapes[i:i + args.chunk]
        results = tune_many(chunk, acc=args.acc, db=db, skip_tuned=True,
                            max_candidates=args.max_candidates,
                            stage1_rounds=args.stage1_rounds,
                            stage2_rounds=args.stage2_rounds,
                            finalists=args.finalists,
                            verbose=args.verbose)
        done += len(results)
        print(f"[{time.time() - t0:.0f}s] {i + len(chunk)}/{len(shapes)} "
              f"({done} newly tuned)", file=sys.stderr)
    return 0


def _load_done(path: Path) -> set:
    if not path.exists():
        return set()
    with path.open() as f:
        return {row["mnk"] for row in csv.DictReader(f)}


def cmd_eval(args) -> int:
    from tpul2.harness.bench_offline import benchmark_offline_all
    from tpul2.harness.bench_server import benchmark_server_all
    from tpul2.harness.summarize import DISPLAY_NAMES, _MAX_FAMILIES

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    done = _load_done(out)
    shapes = [s for s in grid(args.dims, args.max_shapes, args.max_elems)
              if f"{s[0]}x{s[1]}x{s[2]}" not in done]
    print(f"evaluating {len(shapes)} shapes ({len(done)} already in CSV)",
          file=sys.stderr)

    write_header = not out.exists()
    with out.open("a", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=CSV_COLUMNS)
        if write_header:
            writer.writeheader()
        for (m, n, k) in shapes:
            try:
                if args.mode == "server":
                    results = benchmark_server_all(
                        m, n, k, target_qps=args.target_qps, acc=args.acc,
                        warmup_seconds=args.warmup_seconds,
                        benchmark_seconds=args.benchmark_seconds)
                else:
                    results = benchmark_offline_all(
                        m, n, k, acc=args.acc,
                        warmup_seconds=args.warmup_seconds,
                        benchmark_seconds=args.benchmark_seconds)
            except Exception as e:
                print(f"{m}x{n}x{k}: FAILED {e}", file=sys.stderr)
                return 1
            row = {"mnk": f"{m}x{n}x{k}"}
            by_disp = {DISPLAY_NAMES.get(fn, fn): r["speedup"]
                       for fn, r in results.items()}
            for fam in _MAX_FAMILIES:
                tn = by_disp.get(DISPLAY_NAMES[f"{fam}_tn"])
                nn = by_disp.get(DISPLAY_NAMES[f"{fam}_nn"])
                if tn is not None and nn is not None:
                    fam_disp = DISPLAY_NAMES[f"{fam}_tn"].rsplit("-", 1)[0]
                    by_disp[f"{fam_disp}-max"] = min(tn, nn)
            for col in CSV_COLUMNS[1:]:
                if col in by_disp:
                    row[col] = round(by_disp[col], 4)
            writer.writerow(row)
            f.flush()
            print(f"{row['mnk']}: " + " ".join(
                f"{c}={row.get(c, '-')}" for c in CSV_COLUMNS[1:2]),
                file=sys.stderr)
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--dims", type=int, nargs="*",
                        default=REFERENCE_DIMS)
    common.add_argument("--max_shapes", type=int, default=None)
    common.add_argument("--max_elems", type=int, default=None,
                        help="skip shapes whose largest operand exceeds "
                             "this element count")
    common.add_argument("--acc", choices=["float32", "bfloat16"],
                        default="float32")

    t = sub.add_parser("tune", parents=[common])
    t.add_argument("--chunk", type=int, default=8)
    t.add_argument("--max_candidates", type=int, default=16)
    t.add_argument("--stage1_rounds", type=int, default=3)
    t.add_argument("--stage2_rounds", type=int, default=6)
    t.add_argument("--finalists", type=int, default=4)
    t.add_argument("--verbose", action="store_true")
    t.set_defaults(fn=cmd_tune)

    e = sub.add_parser("eval", parents=[common])
    e.add_argument("--mode", choices=["offline", "server"],
                   default="offline")
    e.add_argument("--target_qps", type=float, default=10.0)
    e.add_argument("--warmup_seconds", type=float, default=0.5)
    e.add_argument("--benchmark_seconds", type=float, default=2.0)
    e.add_argument("--out", type=str, required=True)
    e.set_defaults(fn=cmd_eval)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
