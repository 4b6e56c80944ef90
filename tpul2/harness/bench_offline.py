"""Offline (max-throughput) benchmark mode.

Port of the reference benchmarking_offline.py (SURVEY.md C5): per run, the
candidate plus ONE baseline are timed head-to-head (reference isolates each
baseline in its own process, :96-99 — our driver scripts/eval_one_shape.py
preserves that per-baseline isolation at the orchestration level); the loop
is time-boxed (warmup seconds then benchmark seconds), every iteration draws
fresh random operands and shuffles function order, and results land in
``benchmark_result_<perf_func>.json`` with mean TFLOPS + a version stamp.
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


def benchmark_offline(m: int, n: int, k: int,
                      perf_func: str,
                      acc: str = "float32",
                      in_dtype=jnp.bfloat16,
                      warmup_seconds: float = 2.0,
                      benchmark_seconds: float = 10.0,
                      base_dir: Optional[str] = None,
                      seed: int = 0,
                      candidate_name: str = "tpul2") -> dict:
    """Benchmark the candidate vs one baseline; write + return the result.

    perf_func: a key of ops.baselines.BASELINES.
    """
    enable_compilation_cache()
    if perf_func not in BASELINES:
        raise ValueError(f"unknown perf_func {perf_func}; "
                         f"choose from {list(BASELINES)}")
    # Pre-tune the auto-tuned baseline before timing (reference :71-84 calls
    # find_best_algo_*_v2_torch ahead of the benchmark loop).
    if perf_func.startswith("xla_autotuned"):
        layout = perf_func.rsplit("_", 1)[1]
        find_best_xla_variant(m, n, k, in_dtype, layout)

    funcs = {candidate_name: candidate_fn(acc), perf_func: BASELINES[perf_func]}
    rng = np.random.default_rng(seed)

    # Warmup (time-boxed, same loop as benchmark — reference :115-126).
    a, b, b_t = bu.fresh_inputs(rng, m, n, k, in_dtype)
    inner = bu.calibrate_inner(funcs[candidate_name], a, b, b_t)
    t_end = time.time() + warmup_seconds
    while time.time() < t_end:
        bu.run_all_perf_funcs_once(funcs, rng, m, n, k, in_dtype, inner=inner)

    # Benchmark loop.
    records = {name: [] for name in funcs}
    t_end = time.time() + benchmark_seconds
    while time.time() < t_end:
        ms = bu.run_all_perf_funcs_once(funcs, rng, m, n, k, in_dtype,
                                        inner=inner)
        for name, v in ms.items():
            records[name].append(v)

    result = {
        "mode": "offline",
        "mnk": [m, n, k],
        "acc": acc,
        "in_dtype": jnp.dtype(in_dtype).name,
        "perf_func": perf_func,
        "inner": inner,
        "version": bu.VERSION_STAMP,
    }
    for name, ms_list in records.items():
        stats = bu.percentile_stats(ms_list)
        result[name] = {
            **stats,
            "tflops_mean": bu.tflops(m, n, k, stats["mean_ms"]),
            "tflops_median": bu.tflops(m, n, k, stats["median_ms"]),
        }
    result["speedup"] = (result[perf_func]["mean_ms"]
                         / result[candidate_name]["mean_ms"])

    if base_dir:
        p = Path(base_dir)
        p.mkdir(parents=True, exist_ok=True)
        (p / f"benchmark_result_{perf_func}.json").write_text(
            json.dumps(result, indent=1))
    return result
