"""Offline (max-throughput) benchmark mode.

Port of the reference benchmarking_offline.py (SURVEY.md C5): per run, the
candidate plus ONE baseline are timed head-to-head (the driver
scripts/eval_one_shape.py orchestrates all baselines in shuffled order);
the loop is time-boxed (warmup seconds then benchmark seconds), every
iteration draws fresh random operands and shuffles function order, and
results land in ``benchmark_result_<perf_func>.json`` with mean/median
TFLOPS + a version stamp.  Timing uses the chained in-program method (see
bench_utils docstring for why plain fenced calls are not trustworthy on
tunneled TPU backends).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

from tpul2.dispatch import candidate_fn
from tpul2.harness import bench_utils as bu
from tpul2.ops.baselines import BASELINES, find_best_xla_variant
from tpul2.utils.platform import enable_compilation_cache


def _build_timers(funcs, rng, m, n, k, in_dtype, target_ms):
    from tpul2.utils.platform import debug_log
    data0 = bu.fresh_inputs(rng, m, n, k, in_dtype)
    debug_log(f"{m}x{n}x{k}: data ready")
    timers = {}
    for name, fn in funcs.items():
        est = bu.estimate_per_call_ms(fn, data0, m, n, k, in_dtype)
        reps = bu.pick_reps(est, target_ms=target_ms)
        debug_log(f"{m}x{n}x{k} {name}: est {est:.4f} ms/call -> reps {reps}")
        timers[name] = bu.ChainedTimer(fn, m, n, k, in_dtype, reps)
        timers[name].warmup(data0)
        debug_log(f"{m}x{n}x{k} {name}: warmed")
    return timers


def _collect(records, timers, m, n, k):
    out = {}
    for name, trials in records.items():
        t = timers[name]
        diffs = [max(hi - lo, 1e-9) * 1e3 / (t.reps_hi - t.reps_lo)
                 for (lo, hi) in trials]
        stats = bu.percentile_stats(diffs)
        per_call = bu.ChainedTimer.per_call_ms(
            trials, t.reps_lo, t.reps_hi,
            phys_min_ms=bu.physical_min_ms(m, n, k))
        out[name] = {
            **stats,
            "per_call_ms": per_call,
            "reps": [t.reps_lo, t.reps_hi],
            "tflops_mean": bu.tflops(m, n, k, stats["mean_ms"]),
            "tflops_median": bu.tflops(m, n, k, per_call),
        }
    return out


def _run_mode(mode: str, m, n, k, perf_funcs, acc, in_dtype,
              warmup_seconds, benchmark_seconds, base_dir, seed,
              target_ms, candidate_name, between_iterations=None) -> dict:
    """Shared engine: time the candidate + N baselines in ONE shuffled loop.

    The reference isolates each baseline in its own process (SURVEY C5
    :96-99); on a tunneled backend every process pays ~100 s of session
    start and each program pays a first-load cost, so the default here is
    one loop with per-iteration shuffled order — the same order-bias control
    with the fixed costs amortized.  (--isolate in the driver restores
    per-baseline processes.)"""
    enable_compilation_cache()
    for pf in perf_funcs:
        if pf not in BASELINES:
            raise ValueError(f"unknown perf_func {pf}; "
                             f"choose from {list(BASELINES)}")
        if pf.startswith("xla_autotuned"):
            # Pre-tune before timing (reference :71-84).
            find_best_xla_variant(m, n, k, in_dtype, pf.rsplit("_", 1)[1])

    funcs = {candidate_name: candidate_fn(acc)}
    funcs.update({pf: BASELINES[pf] for pf in perf_funcs})
    rng = np.random.default_rng(seed)
    timers = _build_timers(funcs, rng, m, n, k, in_dtype, target_ms)

    # Warmup loop (time-boxed, same shape as benchmark — reference :115-126).
    t_end = time.time() + warmup_seconds
    while time.time() < t_end:
        bu.run_all_perf_funcs_once(timers, rng, m, n, k, in_dtype)
        if between_iterations:
            between_iterations()

    records = {name: [] for name in funcs}
    t_end = time.time() + benchmark_seconds
    while time.time() < t_end:
        trial = bu.run_all_perf_funcs_once(timers, rng, m, n, k, in_dtype)
        for name, v in trial.items():
            records[name].append(v)
        if between_iterations:
            between_iterations()

    collected = _collect(records, timers, m, n, k)
    floor = bu.fence_floor_ms()
    results = {}
    for pf in perf_funcs:
        result = {
            "mode": mode,
            "mnk": [m, n, k],
            "acc": acc,
            "in_dtype": jnp.dtype(in_dtype).name,
            "perf_func": pf,
            "version": bu.VERSION_STAMP,
            "sync_latency_ms": floor,
            pf: collected[pf],
            candidate_name: collected[candidate_name],
            "speedup": (collected[pf]["per_call_ms"]
                        / collected[candidate_name]["per_call_ms"]),
        }
        if base_dir:
            p = Path(base_dir)
            p.mkdir(parents=True, exist_ok=True)
            (p / f"benchmark_result_{pf}.json").write_text(
                json.dumps(result, indent=1))
        results[pf] = result
    return results


def benchmark_offline(m: int, n: int, k: int,
                      perf_func: str,
                      acc: str = "float32",
                      in_dtype=jnp.bfloat16,
                      warmup_seconds: float = 2.0,
                      benchmark_seconds: float = 10.0,
                      base_dir: Optional[str] = None,
                      seed: int = 0,
                      target_ms: float = 150.0,
                      candidate_name: str = "tpul2") -> dict:
    """Benchmark the candidate vs one baseline; write + return the result."""
    return _run_mode("offline", m, n, k, [perf_func], acc, in_dtype,
                     warmup_seconds, benchmark_seconds, base_dir, seed,
                     target_ms, candidate_name)[perf_func]


def benchmark_offline_all(m: int, n: int, k: int,
                          perf_funcs=None,
                          **kw) -> dict:
    """Candidate vs ALL (or the given) baselines in one amortized loop."""
    if perf_funcs is None:
        perf_funcs = list(BASELINES)
    return _run_mode("offline", m, n, k, perf_funcs,
                     kw.pop("acc", "float32"),
                     kw.pop("in_dtype", jnp.bfloat16),
                     kw.pop("warmup_seconds", 2.0),
                     kw.pop("benchmark_seconds", 10.0),
                     kw.pop("base_dir", None),
                     kw.pop("seed", 0),
                     kw.pop("target_ms", 150.0),
                     kw.pop("candidate_name", "tpul2"))
