"""Profiling + roofline reporting.

Covers the tracing/profiling auxiliary subsystem (SURVEY.md §5): the
reference's only profiling aid is ``-Xptxas -v`` register dumps at compile
time (tools/utils.py:70-72) plus wall-clock timing.  The TPU-native
equivalent is richer: per-shape roofline analysis (%-of-MXU-peak and
%-of-HBM-bandwidth from measured per-call time) and optional
``jax.profiler`` traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpul2.utils.platform import tpu_generation, tpu_peak_flops

#: HBM bandwidth per chip, bytes/s (public numbers).
_HBM_BW = {
    "v4": 1.2e12,
    "v5e": 8.19e11,
    "v5p": 2.76e12,
    "v6e": 1.64e12,
    "cpu": float("nan"),
}


def roofline(m: int, n: int, k: int, ms: float,
             in_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16) -> dict:
    """Roofline placement of one GEMM measurement."""
    gen = tpu_generation()
    peak = tpu_peak_flops()
    bw = _HBM_BW.get(gen, float("nan"))
    flops = 2.0 * m * n * k
    bytes_moved = ((m * k + k * n) * jnp.dtype(in_dtype).itemsize
                   + m * n * jnp.dtype(out_dtype).itemsize)
    t = ms * 1e-3
    achieved_flops = flops / t
    achieved_bw = bytes_moved / t
    intensity = flops / bytes_moved
    ridge = peak / bw if (np.isfinite(peak) and np.isfinite(bw)) else None
    return {
        "gen": gen,
        "ms": ms,
        "tflops": achieved_flops / 1e12,
        "pct_mxu_peak": 100.0 * achieved_flops / peak
        if np.isfinite(peak) else None,
        "gb_per_s": achieved_bw / 1e9,
        "pct_hbm_bw": 100.0 * achieved_bw / bw
        if np.isfinite(bw) else None,
        "arithmetic_intensity": intensity,
        "ridge_intensity": ridge,
        "bound": ("compute" if ridge is not None and intensity >= ridge
                  else "memory" if ridge is not None else "unknown"),
    }


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str]):
    """jax.profiler trace context (no-op when trace_dir is None)."""
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield


def profile_shape(m: int, n: int, k: int,
                  acc: str = "float32",
                  in_dtype=jnp.bfloat16,
                  trials: int = 5,
                  trace_dir: Optional[str] = None,
                  include_xla: bool = True) -> dict:
    """Measure the dispatched candidate (and optionally XLA) for one shape
    and place both on the roofline.  Writes a profiler trace if asked."""
    from tpul2.dispatch import candidate_fn
    from tpul2.harness import bench_utils as bu
    from tpul2.ops.baselines import xla_matmul

    rng = np.random.default_rng(0)
    data = bu.fresh_inputs(rng, m, n, k, in_dtype)
    report = {"mnk": [m, n, k], "acc": acc}

    funcs = {"tpul2": candidate_fn(acc)}
    if include_xla:
        funcs["xla"] = xla_matmul
    for name, fn in funcs.items():
        est = bu.estimate_per_call_ms(fn, data, m, n, k, in_dtype)
        timer = bu.ChainedTimer(fn, m, n, k, in_dtype,
                                bu.pick_reps(est, target_ms=150.0))
        timer.warmup(data)
        with maybe_trace(trace_dir if name == "tpul2" else None):
            trials_t = [timer.measure(data) for _ in range(trials)]
        ms = bu.ChainedTimer.per_call_ms(
            trials_t, timer.reps_lo, timer.reps_hi,
            phys_min_ms=bu.physical_min_ms(m, n, k, in_dtype))
        report[name] = roofline(m, n, k, ms, in_dtype)
    if "xla" in report:
        report["speedup_vs_xla"] = (report["xla"]["ms"]
                                    / report["tpul2"]["ms"])
    if trace_dir:
        report["trace_dir"] = trace_dir
    return report
