#!/usr/bin/env python
"""Round benchmark: tuned tpul2 matmul vs XLA over a representative suite.

Prints ONE JSON line:
  {"metric": "geomean_speedup_vs_xla_dot", "value": N, "unit": "x",
   "vs_baseline": N}

The shape suite samples the reference's 10^3 evaluation grid
({64..16384}^3, SURVEY.md §6) plus LLM-serving skinny shapes: squares for
MXU saturation, skinny-M for the dispatch/tiling regime where per-shape
tuning wins.  Each shape: candidate (tuning-DB config, tuned on the fly if
absent) vs XLA dot_general, offline methodology (fresh on-device data,
shuffled order, median of many fenced calls).

Env knobs: TPUL2_BENCH_SECONDS (per-shape budget, default 3),
TPUL2_BENCH_SHAPES ("m,n,k;m,n,k;..." override).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SHAPES = [
    # squares across the grid
    (512, 512, 512),
    (1024, 1024, 1024),
    (2048, 2048, 2048),
    (4096, 4096, 4096),
    (8192, 8192, 8192),
    # skinny-M LLM serving shapes (the reference's headline win region)
    (64, 4096, 4096),
    (64, 8192, 8192),
    (128, 4096, 11008),
    (16, 8192, 8192),
    # tall/odd shapes
    (4096, 64, 4096),
    (8192, 128, 8192),
    (2048, 8192, 512),
    # thin-K band (~27% of the reference 10^3 grid has a 64-dim; XLA's
    # tiling degrades on sub-lane contractions)
    (512, 512, 64),
    (4096, 512, 512),
    (64, 4096, 512),
]


def main() -> int:
    import numpy as np

    from tpul2.autotune.db import default_db
    from tpul2.autotune.search import tune_many
    from tpul2.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    db = default_db()

    seconds = float(os.environ.get("TPUL2_BENCH_SECONDS", "3"))
    shapes_env = os.environ.get("TPUL2_BENCH_SHAPES")
    shapes = ([tuple(map(int, s.split(","))) for s in shapes_env.split(";")]
              if shapes_env else DEFAULT_SHAPES)

    tuned = any(db.get(m, n, k) for (m, n, k) in shapes)
    # tune_many re-times stored winners and the XLA sentinel with the same
    # methodology; all shapes are timed before any device→host transfer.
    # save=False: the round benchmark MEASURES — its low-fidelity re-times
    # must never overwrite campaign-quality DB entries (VERDICT r1 / ADVICE).
    results = tune_many(
        shapes,
        stage1_rounds=2 if tuned else 3,
        stage2_rounds=max(4, int(seconds * 2)),
        max_candidates=8 if tuned else 24,
        finalists=3,
        save=False,
        verbose=False,
    )

    speedups = []
    per_shape = {}
    for res in results:
        per_shape[f"{res.m}x{res.n}x{res.k}"] = {
            "speedup": round(res.speedup, 4),
            "tflops": round(res.best_tflops, 2),
            "xla_tflops": round(res.xla_tflops, 2),
        }
        speedups.append(res.speedup)
        print(f"# {res.m}x{res.n}x{res.k}: {res.speedup:.4f}x "
              f"({res.best_tflops:.1f} vs {res.xla_tflops:.1f} TFLOPS)",
              file=sys.stderr)

    geomean = float(np.exp(np.mean(np.log(speedups))))
    print(json.dumps({
        "metric": "geomean_speedup_vs_xla_dot",
        "value": round(geomean, 4),
        "unit": "x",
        "vs_baseline": round(geomean, 4),
        "shapes": per_shape,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
