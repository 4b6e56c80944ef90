"""Shared benchmark timing core.

Port of the reference's benchmarking_utils.py (SURVEY.md C5): wall-clock
timing around full-device fences, fresh random tensors per iteration,
shuffled function order per iteration, TFLOPS = 2·M·N·K/t.  The CUDA
``torch.cuda.synchronize()`` fences become ``jax.block_until_ready`` — the
honest way to time an async-dispatch runtime (and the thing defense.py's
async-cheat check cross-validates).
"""

from __future__ import annotations

import random
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

VERSION_STAMP = "tpul2-0.1"


def fresh_inputs(rng, m: int, n: int, k: int, in_dtype=jnp.bfloat16):
    """Fresh normal-random operands + transposed layout, fenced on device.

    Mirrors benchmarking_utils.py:36-47: new randn tensors every iteration
    (defeats value-specific caching) and both B layouts always materialized
    (as_col_major analogue, tools/utils.py:110-115)."""
    a = jnp.asarray(rng.standard_normal((m, k), np.float32), in_dtype)
    b = jnp.asarray(rng.standard_normal((k, n), np.float32), in_dtype)
    b_t = jnp.swapaxes(b, 0, 1)  # materialized below by block_until_ready
    a, b, b_t = jax.block_until_ready((a, b, b_t))
    return a, b, b_t


def run_benchmark(fn: Callable, a, b, b_t, inner: int = 1) -> float:
    """One timed measurement of ``fn(a, b, b_t)``: fence, wall-clock,
    fence.  Returns milliseconds per call (reference :22-31)."""
    jax.block_until_ready((a, b, b_t))
    t0 = time.perf_counter()
    out = None
    for _ in range(inner):
        out = fn(a, b, b_t)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) * 1e3 / inner


def tflops(m: int, n: int, k: int, ms: float) -> float:
    return 2.0 * m * n * k * 1e-12 * 1e3 / ms


def run_all_perf_funcs_once(funcs: Dict[str, Callable], rng,
                            m: int, n: int, k: int,
                            in_dtype=jnp.bfloat16,
                            inner: int = 1) -> Dict[str, float]:
    """One benchmark iteration: fresh inputs, shuffled func order, time each.

    (reference benchmarking_offline.py:127-139 / benchmarking_utils.py:61-68)
    """
    a, b, b_t = fresh_inputs(rng, m, n, k, in_dtype)
    order = list(funcs)
    random.shuffle(order)
    return {name: run_benchmark(funcs[name], a, b, b_t, inner=inner)
            for name in order}


def calibrate_inner(fn: Callable, a, b, b_t, target_ms: float = 0.5) -> int:
    """Pick an inner-iteration count so one measurement is >= target_ms.

    Dispatch overhead dominates tiny GEMMs on an async runtime (SURVEY.md §7
    hard part (c)); batching keeps the measurement honest without letting
    timer noise swamp it.  Returns 1 for any call >= target_ms (matching the
    reference's single-call timing for non-tiny shapes)."""
    jax.block_until_ready(fn(a, b, b_t))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(a, b, b_t))
    ms = (time.perf_counter() - t0) * 1e3
    return max(1, int(target_ms / max(ms, 1e-6)))


def percentile_stats(ms_list) -> dict:
    arr = np.asarray(ms_list, np.float64)
    return {
        "mean_ms": float(arr.mean()),
        "median_ms": float(np.median(arr)),
        "p50_ms": float(np.percentile(arr, 50)),
        "p99_ms": float(np.percentile(arr, 99)),
        "min_ms": float(arr.min()),
        "iters": int(arr.size),
    }
