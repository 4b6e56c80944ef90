"""Server (Poisson-arrival) benchmark mode.

Port of the reference benchmarking_server.py (SURVEY.md C6): identical to
the offline loop except each iteration is followed by
``sleep(Exponential(1/target_qps))`` so requests arrive as a Poisson process
and every measurement runs on a cooled-down chip — the latency-shaped regime
where the reference's kernels win biggest (README.md:32-36).  We report
p50/p99 over iterations (the serving metric named in BASELINE.json).

Measurements use short chained bursts (small rep counts) rather than the
offline mode's long steady-state chains, approximating per-request cost
while remaining robust to the tunneled backend's fence floor (see
bench_utils docstring).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

from tpul2.ops.baselines import BASELINES
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
                     target_ms: float = 40.0,
                     candidate_name: str = "tpul2") -> dict:
    """Benchmark candidate vs one baseline under Poisson arrivals."""
    enable_compilation_cache()
    if perf_func not in BASELINES:
        raise ValueError(f"unknown perf_func {perf_func}")
    if target_qps <= 0:
        raise ValueError("--target_qps must be > 0 in server mode "
                         "(reference benchmarking_server.py:30)")
    # NOTE: autotuned baselines are pre-tuned inside _run_mode
    # (bench_offline.py) — no pre-tune needed here.
    result = benchmark_server_all(
        m, n, k, perf_funcs=[perf_func], target_qps=target_qps, acc=acc,
        in_dtype=in_dtype, warmup_seconds=warmup_seconds,
        benchmark_seconds=benchmark_seconds, base_dir=base_dir, seed=seed,
        target_ms=target_ms, candidate_name=candidate_name)[perf_func]
    return result


def benchmark_server_all(m: int, n: int, k: int,
                         target_qps: float,
                         perf_funcs=None,
                         acc: str = "float32",
                         in_dtype=jnp.bfloat16,
                         warmup_seconds: float = 2.0,
                         benchmark_seconds: float = 10.0,
                         base_dir: Optional[str] = None,
                         seed: int = 0,
                         target_ms: float = 40.0,
                         candidate_name: str = "tpul2") -> dict:
    """Candidate vs all given baselines under Poisson arrivals."""
    from tpul2.harness.bench_offline import _run_mode
    if target_qps <= 0:
        raise ValueError("--target_qps must be > 0 in server mode "
                         "(reference benchmarking_server.py:30)")
    if perf_funcs is None:
        perf_funcs = list(BASELINES)

    def poisson_sleep():
        # reference :127-128,144-145
        time.sleep(float(np.random.exponential(1.0 / target_qps)))

    results = _run_mode("server", m, n, k, perf_funcs, acc, in_dtype,
                        warmup_seconds, benchmark_seconds, base_dir, seed,
                        target_ms, candidate_name,
                        between_iterations=poisson_sleep)
    for r in results.values():
        r["target_qps"] = target_qps
    if base_dir:
        # rewrite with target_qps included
        p = Path(base_dir)
        for pf, r in results.items():
            (p / f"benchmark_result_{pf}.json").write_text(
                json.dumps(r, indent=1))
    return results
