"""Autotuner CLI (role parity with the reference's compile.py: the
build-ahead entry that prepares a shape before evaluation).

  python -m tpul2.autotune --mnk 4096 4096 4096 --acc float32
  python -m tpul2.autotune --mnk 64 8192 8192 --max_candidates 32 -v
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="python -m tpul2.autotune",
                                 description=__doc__)
    ap.add_argument("--mnk", type=int, nargs=3, required=True,
                    metavar=("M", "N", "K"))
    ap.add_argument("--acc", choices=["float32", "bfloat16"],
                    default="float32")
    ap.add_argument("--max_candidates", type=int, default=24)
    ap.add_argument("--stage1_rounds", type=int, default=4)
    ap.add_argument("--stage2_rounds", type=int, default=8)
    ap.add_argument("--finalists", type=int, default=5)
    ap.add_argument("--no_save", action="store_true")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args(argv)

    from tpul2.autotune.search import tune_shape
    m, n, k = args.mnk
    res = tune_shape(m, n, k, acc=args.acc,
                     max_candidates=args.max_candidates,
                     stage1_rounds=args.stage1_rounds,
                     stage2_rounds=args.stage2_rounds,
                     finalists=args.finalists,
                     save=not args.no_save,
                     verbose=args.verbose)
    import dataclasses
    out = dataclasses.asdict(res)
    out["best"] = dataclasses.asdict(res.best)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
