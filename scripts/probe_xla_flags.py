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

Run on the real chip:  timeout 1200 python scripts/probe_xla_flags.py
Appends one JSON line per (shape, option-set) to
eval_results/probe_xla_flags_r5.jsonl (round-4 battery preserved in
probe_xla_flags_r4.jsonl).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SHAPES = [
    # ordered most-informative-first so --max_shapes trims the tail:
    # thin-K headroom rows (BENCH_NOTES roofline tables), the 8192^3
    # flagship gap, then the round-4 band representatives
    (8192, 128, 64),      # thin-K
    (2048, 8192, 512),    # thin-K, unexplained headroom
    (8192, 4096, 512),    # thin-K, unexplained headroom
    (128, 2048, 256),     # thin-K, unexplained headroom
    (8192, 8192, 8192),   # flagship square (88% MFU in r4)
    (4096, 4096, 4096),   # MXU-bound square
    (64, 8192, 8192),     # skinny streaming
    (256, 256, 256),      # dispatch floor
    (2048, 512, 64),      # thin-K
    (128, 4096, 4096),    # streaming
    (16384, 16384, 64),   # C-write bound giant
]

# Round-4 battery (kept for reference / re-runs).
OPTION_SETS_R4 = {
    "base": None,
    "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem112m": {"xla_tpu_scoped_vmem_limit_kib": "114688"},
    "no_lhs": {"xla_tpu_enable_latency_hiding_scheduler": "false"},
    "aggr_fusion": {"xla_tpu_enable_aggressive_loop_fusion_layout_opt":
                    "true"},
}

# Round-5 battery (VERDICT r4 next-round #7: widen the per-compilation
# flag axis — scheduler, layout, MSA, and XLA's own autotuner knobs).
# Names harvested from this container's libtpu (strings libtpu.so); an
# option the backend rejects shows up as COMPILE FAIL and is simply
# excluded from that shape's medians.
OPTION_SETS_R5 = {
    "base": None,
    "no_lhs": {"xla_tpu_enable_latency_hiding_scheduler": "false"},
    # XLA's own per-compilation autotuners — the closest analogue of
    # cuBLASLt's algo search living inside the compiler itself
    "autotune_dots": {"xla_tpu_autotune_dots": "true"},
    "autotune_all": {"xla_tpu_autotune_dots": "true",
                     "xla_tpu_autotune_fusions": "true",
                     "xla_tpu_autotune_layouts": "true",
                     "xla_tpu_autotune_schedules": "true"},
    # alternative schedulers
    "ilp_sched": {"xla_tpu_enable_ilp_latency_hiding_scheduler": "true"},
    "aggr_sched": {"xla_tpu_use_aggressive_scheduling": "true"},
    "expt_sched": {"xla_tpu_enable_all_experimental_scheduler_features":
                   "true"},
    # dot canonicalization / layout knobs (judge's explicit ask)
    "no_dot_sr": {"xla_tpu_enable_dot_strength_reduction": "false"},
    "dot_grouping": {"xla_tpu_layout_use_dot_grouping": "true"},
    "layout_negot": {"xla_tpu_allow_layout_negotiation": "true"},
    # memory-space-assignment / VMEM allocator alternatives
    "msa_minimalloc": {"xla_tpu_msa_use_minimalloc": "true"},
    "scavenge_vmem": {"xla_tpu_scavenge_vmem_for_fusions": "true"},
    "vmem_dmas": {"xla_tpu_enable_vmem_to_vmem_dmas": "true"},
    # loop pipelining
    "loop_unroll": {"xla_tpu_enable_pipelined_loop_unrolling": "true"},
}
OPTION_SETS = OPTION_SETS_R5


def main() -> int:
    import jax.numpy as jnp
    import numpy as np

    from tpul2.harness import bench_utils as bu
    from tpul2.ops.baselines import xla_dot_nn
    from tpul2.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="eval_results/probe_xla_flags_r5.jsonl")
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--max_shapes", type=int, default=None)
    args = ap.parse_args()
    out_path = Path(args.out)
    rng = np.random.default_rng(0)
    trials = args.trials

    # raw (unjitted) dot so each option set compiles its own chain program
    def dot_nn(a, b, b_t):
        return xla_dot_nn.__wrapped__(a, b, b_t)

    for (m, n, k) in SHAPES[:args.max_shapes]:
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
