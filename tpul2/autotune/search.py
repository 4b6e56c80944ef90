"""Per-shape kernel autotuner — the search that replaces the reference's RL.

The reference's 3,736 tuned kernels were produced by an offline RL pipeline
(paper arXiv:2512.02551) whose code is not in the repo; the repo only ships
the *outputs*.  The closest in-repo model is the cuBLASLt auto-tuning
baseline's pre-tune loop (SURVEY.md §3.5: enumerate ≤100 candidate algos →
50 warmup + 100 timed rounds with fresh random data per round and per-round
shuffled algo order → median per algo selects the winner, cached for exec).

tpul2 adopts exactly that methodology over the Pallas config space:

  1. enumerate candidates (config.candidate_configs: static-VMEM-pruned tile
     points + the XLA sentinel),
  2. compile + quick-exactness-screen each candidate (0/1 inputs, SURVEY C4),
  3. stage 1: few timed rounds over all candidates → keep top finalists,
  4. stage 2: many timed rounds, fresh data per round, shuffled order,
     median-of-N per candidate,
  5. persist the winner (+ measured TFLOPS + speedup vs the XLA sentinel)
     in the TuneDB.
"""

from __future__ import annotations

import dataclasses
import random
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpul2.config import KernelConfig, candidate_configs
from tpul2.ops.matmul import pallas_matmul
from tpul2.autotune.db import TuneDB, default_db


@dataclasses.dataclass
class TuneResult:
    m: int
    n: int
    k: int
    acc: str
    best: KernelConfig
    best_tflops: float
    xla_tflops: float
    speedup: float          # best vs XLA sentinel (>= 1.0 by construction)
    n_candidates: int
    n_compiled: int
    elapsed_s: float


def _make_fn(cfg: KernelConfig, out_dtype, interpret):
    if cfg.use_xla:
        def f(a, b):
            return jnp.matmul(a, b, preferred_element_type=jnp.float32
                              ).astype(out_dtype)
    else:
        def f(a, b):
            return pallas_matmul(a, b, cfg, out_dtype=out_dtype,
                                 interpret=interpret)
    return jax.jit(f)


def _fresh_data(rng, m, n, k, in_dtype, zero_one=False):
    if zero_one:
        a = jnp.asarray(rng.integers(0, 2, (m, k)), in_dtype)
        b = jnp.asarray(rng.integers(0, 2, (k, n)), in_dtype)
    else:
        a = jnp.asarray(rng.standard_normal((m, k), np.float32), in_dtype)
        b = jnp.asarray(rng.standard_normal((k, n), np.float32), in_dtype)
    return jax.block_until_ready(a), jax.block_until_ready(b)


def _median_time(fn, datasets, rounds, inner=1):
    """Median wall-clock seconds of `fn` over `rounds` timed calls."""
    ts = []
    for r in range(rounds):
        a, b = datasets[r % len(datasets)]
        t0 = time.perf_counter()
        out = None
        for _ in range(inner):
            out = fn(a, b)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / inner)
    return float(np.median(ts))


def tune_shape(m: int, n: int, k: int,
               acc: str = "float32",
               in_dtype=jnp.bfloat16,
               out_dtype=None,
               db: Optional[TuneDB] = None,
               interpret: Optional[bool] = None,
               max_candidates: int = 48,
               stage1_rounds: int = 5,
               stage2_rounds: int = 20,
               finalists: int = 6,
               n_datasets: int = 3,
               seed: int = 0,
               save: bool = True,
               verbose: bool = False) -> TuneResult:
    """Search the config space for one (M, N, K, acc) and record the winner."""
    from tpul2.utils.platform import default_interpret, enable_compilation_cache
    enable_compilation_cache()
    t_start = time.perf_counter()
    if interpret is None:
        interpret = default_interpret()
    if out_dtype is None:
        out_dtype = in_dtype
    if db is None:
        db = default_db()

    rng = np.random.default_rng(seed)
    cands = candidate_configs(m, n, k, acc, in_dtype,
                              max_candidates=max_candidates)

    # --- exactness screen data: 0/1 inputs, f32 CPU truth (SURVEY C4) ---
    sa, sb = _fresh_data(rng, m, n, k, in_dtype, zero_one=True)
    truth = np.asarray(sa, np.float32) @ np.asarray(sb, np.float32)
    if jnp.dtype(out_dtype).name == "bfloat16" or acc == "bfloat16":
        mask = np.abs(truth) <= 256  # bf16 integer-exact bound
    else:
        mask = np.ones_like(truth, bool)

    compiled = []
    for cfg in cands:
        fn = _make_fn(cfg, out_dtype, interpret)
        try:
            out = np.asarray(jax.block_until_ready(fn(sa, sb)), np.float32)
        except Exception as e:  # compile/VMEM failure → candidate invalid
            if verbose:
                print(f"  skip {cfg}: {type(e).__name__}: {e}")
            continue
        if not np.array_equal(out[mask], truth[mask]):
            if verbose:
                print(f"  WRONG RESULT {cfg}")
            continue
        compiled.append((cfg, fn))

    if not any(c.use_xla for c, _ in compiled):
        raise RuntimeError("XLA sentinel failed to run — cannot tune")

    # --- timing datasets (fresh-ish data; rotated per round) ---
    datasets = [_fresh_data(rng, m, n, k, in_dtype) for _ in range(n_datasets)]

    # Adaptive inner iterations so each measurement is >= ~0.5 ms.
    xla_fn = next(f for c, f in compiled if c.use_xla)
    jax.block_until_ready(xla_fn(*datasets[0]))
    t1 = time.perf_counter()
    jax.block_until_ready(xla_fn(*datasets[0]))
    dt = time.perf_counter() - t1
    inner = max(1, int(5e-4 / max(dt, 1e-7)))

    def run_stage(entries, rounds):
        med = {}
        order = list(range(len(entries)))
        # warmup: one call each
        for cfg, fn in entries:
            jax.block_until_ready(fn(*datasets[0]))
        times = {i: [] for i in order}
        for r in range(rounds):
            random.shuffle(order)  # per-round shuffled candidate order (C12)
            a, b = datasets[r % len(datasets)]
            for i in order:
                fn = entries[i][1]
                t0 = time.perf_counter()
                out = None
                for _ in range(inner):
                    out = fn(a, b)
                jax.block_until_ready(out)
                times[i].append((time.perf_counter() - t0) / inner)
        for i in order:
            med[i] = float(np.median(times[i]))
        return med

    med1 = run_stage(compiled, stage1_rounds)
    ranked = sorted(med1, key=med1.get)
    keep = set(ranked[:finalists])
    keep.add(next(i for i, (c, _) in enumerate(compiled) if c.use_xla))
    stage2 = [compiled[i] for i in sorted(keep)]

    med2 = run_stage(stage2, stage2_rounds)
    flops = 2.0 * m * n * k
    best_i = min(med2, key=med2.get)
    best_cfg = stage2[best_i][0]
    best_t = med2[best_i]
    xla_i = next(i for i, (c, _) in enumerate(stage2) if c.use_xla)
    xla_t = med2[xla_i]

    result = TuneResult(
        m=m, n=n, k=k, acc=acc,
        best=best_cfg,
        best_tflops=flops / best_t / 1e12,
        xla_tflops=flops / xla_t / 1e12,
        speedup=xla_t / best_t,
        n_candidates=len(cands),
        n_compiled=len(compiled),
        elapsed_s=time.perf_counter() - t_start,
    )
    if save:
        db.put(m, n, k, best_cfg, result.best_tflops, acc=acc,
               in_dtype=in_dtype,
               extra={"speedup_vs_xla": result.speedup,
                      "xla_tflops": result.xla_tflops})
        db.save()
    if verbose:
        print(f"tuned {m}x{n}x{k}/{acc}: {best_cfg} "
              f"{result.best_tflops:.2f} TFLOPS "
              f"({result.speedup:.3f}x vs XLA)")
    return result


def tune_grid(shapes: Sequence[tuple],
              accs: Sequence[str] = ("float32",),
              db: Optional[TuneDB] = None,
              skip_tuned: bool = True,
              verbose: bool = True,
              **kw) -> list:
    """Tune a list of (M, N, K) shapes; resumable via the TuneDB
    (already-tuned shapes are skipped — the checkpoint/resume subsystem
    the reference lacks, SURVEY.md §5)."""
    if db is None:
        db = default_db()
    results = []
    for (m, n, k) in shapes:
        for acc in accs:
            if skip_tuned and db.get(m, n, k, acc) is not None:
                continue
            results.append(tune_shape(m, n, k, acc=acc, db=db,
                                      verbose=verbose, **kw))
    return results
