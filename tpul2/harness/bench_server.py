"""Server (Poisson-arrival) benchmark mode.

Port of the reference benchmarking_server.py (SURVEY.md C6): identical to the
offline loop except each iteration is followed by
``sleep(Exponential(1/target_qps))`` so requests arrive as a Poisson process
and every GEMM runs on a cooled-down chip — the latency-shaped regime where
the reference's kernels win biggest (README.md:32-36).  We additionally
report p50/p99 latency (the serving metric named in BASELINE.json).
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


def benchmark_server(m: int, n: int, k: int,
                     perf_func: str,
                     target_qps: float,
                     acc: str = "float32",
                     in_dtype=jnp.bfloat16,
                     warmup_seconds: float = 2.0,
                     benchmark_seconds: float = 10.0,
                     base_dir: Optional[str] = None,
                     seed: int = 0,
                     candidate_name: str = "tpul2") -> dict:
    """Benchmark candidate vs one baseline under Poisson arrivals."""
    enable_compilation_cache()
    if perf_func not in BASELINES:
        raise ValueError(f"unknown perf_func {perf_func}")
    if target_qps <= 0:
        raise ValueError("--target_qps must be > 0 in server mode "
                         "(reference benchmarking_server.py:30)")
    if perf_func.startswith("xla_autotuned"):
        find_best_xla_variant(m, n, k, in_dtype, perf_func.rsplit("_", 1)[1])

    funcs = {candidate_name: candidate_fn(acc), perf_func: BASELINES[perf_func]}
    rng = np.random.default_rng(seed)

    def poisson_sleep():
        # reference :127-128,144-145
        time.sleep(float(np.random.exponential(1.0 / target_qps)))

    t_end = time.time() + warmup_seconds
    while time.time() < t_end:
        bu.run_all_perf_funcs_once(funcs, rng, m, n, k, in_dtype)
        poisson_sleep()

    records = {name: [] for name in funcs}
    t_end = time.time() + benchmark_seconds
    while time.time() < t_end:
        ms = bu.run_all_perf_funcs_once(funcs, rng, m, n, k, in_dtype)
        for name, v in ms.items():
            records[name].append(v)
        poisson_sleep()

    result = {
        "mode": "server",
        "mnk": [m, n, k],
        "acc": acc,
        "in_dtype": jnp.dtype(in_dtype).name,
        "perf_func": perf_func,
        "target_qps": target_qps,
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
