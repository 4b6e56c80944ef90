"""Shared benchmark timing core.

Port of the reference's benchmarking_utils.py (SURVEY.md C5) — fresh random
tensors per iteration, shuffled function order, TFLOPS = 2·M·N·K/t — with
the timing primitive redesigned twice over for TPU runtimes reached through
an async tunnel (the 'axon' backend), where three CUDA-era assumptions die:

  1. ``jax.block_until_ready`` does not actually wait — the only true fence
     is a device→host transfer (``device_fence``), which carries a fixed
     ~30 ms session latency with ±5 ms jitter;
  2. host↔device transfers are slow (MB/ms scale), so benchmark data must be
     generated on device;
  3. repeatedly enqueueing the SAME (program, args) execution can be
     deduplicated/cached by the relay, so naive back-to-back batching
     under-counts work.

The honest measurement is therefore **chained in-program batching**: build
one jitted program that runs R data-dependent iterations of the function
under test (each iteration's A input derives from the previous output, so
no iteration can be elided, cached, or reordered), execute it ONCE per
measurement, and fence once.  Per-call time comes from the difference of
two rep counts — medians of T(R) minus medians of T(R/4) — which cancels
the fence floor exactly.  On well-behaved backends the same method is
simply a low-overhead device-side loop.
"""

from __future__ import annotations

import functools
import random
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

VERSION_STAMP = "tpul2-0.3"


# ---------------------------------------------------------------------------
# device data generation
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _gen_operands(key, m: int, n: int, k: int, dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    ka, kb = jax.random.split(key)
    a = jax.random.normal(ka, (m, k), jnp.float32).astype(dtype)
    b = jax.random.normal(kb, (k, n), jnp.float32).astype(dtype)
    # Distinct materialized layout for the transposed operand
    # (as_col_major analogue, tools/utils.py:110-115).
    b_t = jnp.swapaxes(b, 0, 1) + jnp.zeros((n, k), dtype)
    return a, b, b_t


def fresh_inputs(rng, m: int, n: int, k: int, in_dtype=jnp.bfloat16):
    """Fresh normal-random operands + transposed layout, on device."""
    seed = int(rng.integers(0, 2**31 - 1))
    return _gen_operands(jax.random.key(seed), m, n, k,
                         jnp.dtype(in_dtype).name)


# ---------------------------------------------------------------------------
# fencing
# ---------------------------------------------------------------------------

def device_fence(x) -> None:
    """TRUE completion wait: 1-element device→host transfer of (part of) x.

    In-order execution on the PJRT stream means this drains everything
    enqueued before it."""
    while isinstance(x, (tuple, list)):
        x = x[-1]
    arr = x if getattr(x, "ndim", 0) == 0 else x[(0,) * x.ndim]
    float(jax.device_get(arr).real)


def fence_floor_ms(n: int = 3) -> float:
    """Median fixed cost of a fence on an empty queue (~30 ms on tunneled
    backends once any D2H has occurred, ~0 elsewhere)."""
    z = jnp.zeros((8, 128))
    device_fence(z + 1.0)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        device_fence(z + 1.0)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


# Recorded in result JSONs.
sync_latency_probe = fence_floor_ms


# ---------------------------------------------------------------------------
# chained in-program measurement
# ---------------------------------------------------------------------------

def _adapt_output(a, c, i, k: int, in_dtype):
    """Derive the next A input (m, k) from the output (m, n) — cheap, a true
    data dependency, and NOT algebraically reducible.

    Two compiler rewrites must be defeated (both observed producing
    impossible 'above-peak' measurements):

      n < k: ``tile(c) @ b`` folds to ``c @ (summed slices of b)``,
      collapsing the workload k/n×.  Instead c overwrites a sliding window
      of the previous A (dynamic_update_slice) — history-dependent, nothing
      to factor.

      n > k: ``(a @ b)[:, :k]`` narrows to ``a @ b[:, :k]``, and the rest
      of c becomes dead code — shrinking the measured matmul n/k× (and,
      worse, only for narrowable implementations: an opaque Pallas kernel
      can't be narrowed, so XLA baselines would be measured on a smaller
      problem than the candidate).  A NaN-guard on the full-c sum keeps
      every element of c live at ~one extra VPU reduce of cost."""
    n = c.shape[1]
    if n > k:
        tail = jnp.sum(c[:, k:].astype(jnp.float32))
        guard = jnp.where(jnp.isnan(tail), 1.0, 0.0).astype(in_dtype)
        return c[:, :k].astype(in_dtype) + guard
    if n == k:
        return c.astype(in_dtype)
    max_off = k - n
    off = jax.lax.rem(i * n, max_off + 1) if max_off > 0 else 0
    return jax.lax.dynamic_update_slice(a, c.astype(in_dtype), (0, off))


def make_chained_runner(fn: Callable, m: int, n: int, k: int,
                        in_dtype, reps: int) -> Callable:
    """Jitted program running `reps` chained iterations of fn(a, b, b_t).

    A function carrying a ``_compiler_options`` attribute (the XLA-flag
    baseline variants, ops.baselines) gets those options passed to the
    chain's jit — per-compilation XLA TPU flags are the closest analogue
    of cuBLASLt's per-algo knobs and can only apply at program scope.
    TPU-only: the CPU backend rejects unknown TPU flags, so off-TPU the
    variant falls back to its base formulation (numerics identical)."""
    from tpul2.utils.platform import on_tpu
    options = getattr(fn, "_compiler_options", None)
    if options is not None and not on_tpu():
        options = None

    def run(a, b, b_t):
        def body(carry, _):
            a, i = carry
            c = fn(a, b, b_t)
            return (_adapt_output(a, c, i, k, in_dtype), i + 1), None
        (a_fin, _), _ = jax.lax.scan(body, (a, jnp.int32(0)), None,
                                     length=reps)
        return a_fin

    return jax.jit(run, compiler_options=options)


class ChainedTimer:
    """Per-function measurement harness for one (M, N, K, dtype) problem.

    Builds two chained programs (R and R//4 reps); ``measure`` returns the
    difference-method per-call milliseconds for one trial."""

    def __init__(self, fn: Callable, m: int, n: int, k: int,
                 in_dtype, reps: int):
        self.m, self.n, self.k = m, n, k
        self.reps_hi = max(int(reps), 8)
        self.reps_lo = max(self.reps_hi // 4, 1)
        self.run_hi = make_chained_runner(fn, m, n, k, in_dtype,
                                          self.reps_hi)
        self.run_lo = make_chained_runner(fn, m, n, k, in_dtype,
                                          self.reps_lo)

    def warmup(self, data) -> None:
        device_fence(self.run_lo(*data))
        device_fence(self.run_hi(*data))

    def _t(self, run, data) -> float:
        t0 = time.perf_counter()
        device_fence(run(*data))
        return time.perf_counter() - t0

    def measure(self, data) -> tuple:
        """One trial: returns (t_lo_seconds, t_hi_seconds)."""
        return self._t(self.run_lo, data), self._t(self.run_hi, data)

    @staticmethod
    def per_call_ms(trials, reps_lo: int, reps_hi: int,
                    phys_min_ms: float = 0.0) -> float:
        """Median-of-trials difference estimate, floor-free.

        Clamped below by the physical minimum (chip peak / HBM bandwidth):
        measurement noise must never report faster-than-hardware results
        (the reference's defense module exists for the same reason —
        benchmark numbers must be unfoolable, including by our own noise)."""
        lo = float(np.median([t[0] for t in trials]))
        hi = float(np.median([t[1] for t in trials]))
        est = max(hi - lo, 1e-9) * 1e3 / (reps_hi - reps_lo)
        return max(est, phys_min_ms)


class LeanTimer:
    """Single-program chained timer for suite-scale campaigns.

    ChainedTimer compiles TWO programs per function (hi/lo rep counts) so
    the fence floor cancels exactly — the right tool for tight tuning
    margins, but at 1,000-shape campaign scale compile time dominates wall
    clock.  LeanTimer compiles ONE chained program per function and
    subtracts a floor sampled immediately before each trial; with
    target_ms >= 150 the +-5 ms floor jitter is a <=3% error — adequate for
    per-shape CSV rows, and the physical-minimum clamp still applies."""

    def __init__(self, fn: Callable, m: int, n: int, k: int,
                 in_dtype, reps: int):
        self.m, self.n, self.k = m, n, k
        self.in_dtype = in_dtype
        self.reps = max(int(reps), 4)
        self.run = make_chained_runner(fn, m, n, k, in_dtype, self.reps)

    def warmup(self, data) -> None:
        device_fence(self.run(*data))

    def measure(self, data) -> float:
        """One trial: floor-subtracted per-call milliseconds."""
        floor = fence_floor_ms(1)
        t0 = time.perf_counter()
        device_fence(self.run(*data))
        total = (time.perf_counter() - t0) * 1e3
        est = max(total - floor, 1e-6) / self.reps
        return max(est, physical_min_ms(self.m, self.n, self.k,
                                        self.in_dtype))


def physical_min_ms(m: int, n: int, k: int, in_dtype=jnp.bfloat16) -> float:
    """Lower bound on per-call time from chip physics (MXU peak + HBM BW).

    Clamps the rep-count sizing: a noisy floor estimate must never make us
    believe a GEMM runs faster than the hardware allows (which would blow
    rep counts up by orders of magnitude).  No-op off TPU."""
    from tpul2.utils.platform import on_tpu, tpu_peak_flops
    if not on_tpu():
        return 1e-5
    peak = tpu_peak_flops()
    if not np.isfinite(peak):
        peak = 2e14
    hbm_bw = 819e9  # v5e; order-of-magnitude is all that matters here
    item = jnp.dtype(in_dtype).itemsize
    t_flops = 2.0 * m * n * k / peak
    t_mem = ((m * k + k * n + m * n) * item) / hbm_bw
    return max(t_flops, t_mem) * 0.7 * 1e3


def estimate_per_call_ms(fn: Callable, data, m, n, k, in_dtype,
                         probe_reps: int = 64) -> float:
    """Quick floor-subtracted estimate used to size the rep counts."""
    run = make_chained_runner(fn, m, n, k, in_dtype, probe_reps)
    device_fence(run(*data))
    floor = fence_floor_ms(2)
    t0 = time.perf_counter()
    device_fence(run(*data))
    total = (time.perf_counter() - t0) * 1e3
    return max((total - floor) / probe_reps,
               physical_min_ms(m, n, k, in_dtype), 1e-5)


#: Timing-methodology revision, stamped into TuneDB entries.  Rev 2 lifted
#: the rep-count cap from 100k to 4M: with the old cap, shapes whose
#: per-call time is sub-microsecond ran ~10 ms chained programs against a
#: ±5 ms fence-floor jitter — per-call noise of ±50 ns on 60–100 ns
#: measurements, i.e. every number in the dispatch-floor regime was noise
#: (and tuner winners there were arbitrary).  Entries stamped with an older
#: rev in that regime are re-tuned by the campaign's mini-tune pass.
TIMING_REV = 2


def pick_reps(per_call_ms: float, target_ms: float = 200.0,
              max_reps: int = 4_000_000) -> int:
    """Reps so the chained program runs ~target_ms.  The cap only guards
    against a pathological per-call estimate; a lax.scan's compile time is
    O(body), not O(length), so multi-million-rep programs are fine."""
    return int(min(max_reps, max(8, target_ms / per_call_ms)))


def calibrated_reps(fn: Callable, data, m: int, n: int, k: int, in_dtype,
                    target_ms: float = 200.0, probe_reps: int = 64,
                    max_rounds: int = 4) -> int:
    """Size the chained rep count so the program actually runs ~target_ms.

    In the dispatch-floor regime (per-call ≲ 1 µs) a short probe cannot
    resolve the per-call time at all: a 64-rep program's total is fence
    floor ± jitter, so (total − floor)/64 is dominated by the ±ms jitter.
    Refine iteratively: size reps from the probe estimate, re-measure at
    that size, and resize until the program lands within 2× of target —
    every refinement measures a LONGER program, whose floor-subtracted
    per-call estimate is proportionally more accurate.  Growth per round
    is bounded (est ≥ 1 ms/reps) so a jitter-negative measurement cannot
    explode the rep count."""
    est = estimate_per_call_ms(fn, data, m, n, k, in_dtype, probe_reps)
    reps = pick_reps(est, target_ms)
    for _ in range(max_rounds):
        if reps < 8 * probe_reps:
            break  # probe resolved the per-call time directly
        t = LeanTimer(fn, m, n, k, in_dtype, reps)
        t.warmup(data)
        est2 = max(t.measure(data), 1.0 / reps)
        new = pick_reps(est2, target_ms)
        if reps // 2 <= new <= reps * 2:
            return new
        reps = new
    return reps


def tflops(m: int, n: int, k: int, ms: float) -> float:
    return 2.0 * m * n * k * 1e-12 * 1e3 / ms


def run_all_perf_funcs_once(timers: Dict[str, ChainedTimer], rng,
                            m: int, n: int, k: int,
                            in_dtype=jnp.bfloat16) -> Dict[str, tuple]:
    """One benchmark iteration: fresh inputs, shuffled func order, one
    chained trial each (reference benchmarking_offline.py:127-139)."""
    data = fresh_inputs(rng, m, n, k, in_dtype)
    order = list(timers)
    random.shuffle(order)
    return {name: timers[name].measure(data) for name in order}


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
