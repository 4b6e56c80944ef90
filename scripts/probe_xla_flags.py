#!/usr/bin/env python
"""Probe: do per-compilation XLA TPU flags change matmul performance?

VERDICT r3 next-round #7: the reference's cuBLASLt-AutoTuning baseline picks
among ≤100 vendor algos (hgemm_cublaslt_auto_tuning.cu:153-162); tpul2's
XLA-AutoTuned analogue sweeps 5 dot formulations.  XLA's per-compilation TPU
flags (scoped-VMEM limit, latency-hiding scheduler, ...) are the genuine
analogue of the unlisted algo space.  This probe measures whether any of
them moves the needle on representative shapes, per band — the data that
decides which flag variants join the measured AutoTuned variant set
(ops/baselines.py) and whether the sentinel needs them as candidates.

Run on the real chip:  timeout 540 python scripts/probe_xla_flags.py
Appends one JSON line per (shape, option-set) to
eval_results/probe_xla_flags_r4.jsonl.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SHAPES = [
    (8192, 128, 64),      # thin-K
    (2048, 512, 64),      # thin-K
    (64, 8192, 8192),     # skinny streaming
    (128, 4096, 4096),    # streaming
    (4096, 4096, 4096),   # MXU-bound square
    (256, 256, 256),      # dispatch floor
    (16384, 16384, 64),   # C-write bound giant
]

OPTION_SETS = {
    "base": None,
    "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem112m": {"xla_tpu_scoped_vmem_limit_kib": "114688"},
    "no_lhs": {"xla_tpu_enable_latency_hiding_scheduler": "false"},
    "aggr_fusion": {"xla_tpu_enable_aggressive_loop_fusion_layout_opt":
                    "true"},
}


def main() -> int:
    import jax.numpy as jnp
    import numpy as np

    from tpul2.harness import bench_utils as bu
    from tpul2.ops.baselines import xla_dot_nn
    from tpul2.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    out_path = Path("eval_results/probe_xla_flags_r4.jsonl")
    rng = np.random.default_rng(0)
    trials = 5

    # raw (unjitted) dot so each option set compiles its own chain program
    def dot_nn(a, b, b_t):
        return xla_dot_nn.__wrapped__(a, b, b_t)

    for (m, n, k) in SHAPES:
        data0 = bu.fresh_inputs(rng, m, n, k, jnp.bfloat16)
        reps = bu.calibrated_reps(dot_nn, data0, m, n, k, jnp.bfloat16,
                                  target_ms=150.0)
        timers = {}
        for name, opts in OPTION_SETS.items():
            fn = lambda a, b, b_t: dot_nn(a, b, b_t)  # noqa: E731
            if opts:
                fn._compiler_options = opts
            try:
                t = bu.LeanTimer(fn, m, n, k, jnp.bfloat16, reps)
                t.warmup(data0)
                timers[name] = t
            except Exception as e:
                print(f"{m}x{n}x{k} {name}: COMPILE FAIL "
                      f"{type(e).__name__}: {str(e)[:200]}", file=sys.stderr)
        records = {name: [] for name in timers}
        import random
        order = list(timers)
        for _ in range(trials):
            data = bu.fresh_inputs(rng, m, n, k, jnp.bfloat16)
            random.shuffle(order)
            for name in order:
                records[name].append(timers[name].measure(data))
        meds = {name: float(np.median(v)) for name, v in records.items()}
        base = meds.get("base")
        rel = {name: round(base / v, 4) for name, v in meds.items()}
        row = {"mnk": [m, n, k], "reps": reps, "median_ms": meds,
               "speedup_vs_base": rel, "ts": time.time()}
        out_path.parent.mkdir(exist_ok=True)
        with out_path.open("a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"{m}x{n}x{k}: " + " ".join(
            f"{nm}={rel[nm]:.3f}" for nm in OPTION_SETS if nm in rel),
            file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
