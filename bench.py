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

    from tpul2.harness.bench_suite import eval_shape_lean
    from tpul2.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    trials = int(os.environ.get("TPUL2_BENCH_TRIALS", "5"))
    shapes_env = os.environ.get("TPUL2_BENCH_SHAPES")
    shapes = ([tuple(map(int, s.split(","))) for s in shapes_env.split(";")]
              if shapes_env else DEFAULT_SHAPES)

    # Same phase-split methodology as the campaign CSVs (selection vs
    # publication samples, calibrated rep sizing, fresh shuffled trials):
    # the headline measures the DISPATCHED library (tuning-DB config or
    # derived sentinel) against stock XLA — it never writes the DB, so a
    # round benchmark cannot clobber campaign-quality entries.
    speedups = []
    per_shape = {}
    for (m, n, k) in shapes:
        res = eval_shape_lean(m, n, k, accs=("float32",), trials=trials)
        sp = res["speedups"]["float32"]["xla_matmul"]
        cand = res["per_func"]["tpul2_float32"]
        per_shape[f"{m}x{n}x{k}"] = {
            "speedup": round(sp, 4),
            "tflops": round(cand["tflops"], 2),
            "xla_tflops": round(res["per_func"]["xla_matmul"]["tflops"], 2),
            "at_max": round(min(
                res["speedups"]["float32"]["xla_autotuned_nn"],
                res["speedups"]["float32"]["xla_autotuned_tn"]), 4),
        }
        speedups.append(sp)
        print(f"# {m}x{n}x{k}: {sp:.4f}x "
              f"({cand['tflops']:.1f} vs "
              f"{res['per_func']['xla_matmul']['tflops']:.1f} TFLOPS)",
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
