"""Per-shape kernel autotuner — the search that replaces the reference's RL.

The reference's 3,736 tuned kernels were produced by an offline RL pipeline
(paper arXiv:2512.02551) whose code is not in the repo; the repo only ships
the *outputs*.  The closest in-repo model is the cuBLASLt auto-tuning
baseline's pre-tune loop (SURVEY.md §3.5: enumerate ≤100 candidate algos →
warmup + timed rounds with fresh random data per round and per-round
shuffled algo order → median per algo selects the winner, cached for exec).

tpul2 adopts exactly that methodology over the Pallas config space:

  1. enumerate candidates (config.candidate_configs: static-VMEM-pruned tile
     points + the XLA sentinel),
  2. compile-screen each candidate (execute once; failures drop out),
  3. stage 1: few timed rounds over all candidates → keep top finalists,
  4. stage 2: many timed rounds, fresh on-device data, shuffled order,
     median-of-N per candidate,
  5. exactness-screen the ranked finalists (0/1 inputs vs CPU f32 truth) and
     pick the fastest EXACT one,
  6. persist winner (+ TFLOPS + speedup vs the XLA sentinel) in the TuneDB.

Ordering constraint: steps 1–4 perform NO device→host transfer.  On
tunneled TPU backends (axon), the first D2H permanently flips completion
waits into a ~30 ms polling mode, which would bury every subsequent timing;
so all D2H (step 5) happens after all timing.  ``tune_many`` extends this
discipline across a whole shape batch: every shape is timed before any
shape is screened — one process, clean timings throughout.
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
    speedup: float          # best vs XLA sentinel
    n_candidates: int
    n_compiled: int
    elapsed_s: float


def _make_fn(cfg: KernelConfig, out_dtype, interpret):
    """Candidate as a uniform f(a, b, b_t) — the harness ABI (both RHS
    layouts supplied; the config decides which is consumed)."""
    if cfg.use_xla:
        from tpul2.ops.baselines import (XLA_VARIANT_COMPILER_OPTIONS,
                                         XLA_VARIANT_FNS)
        raw = XLA_VARIANT_FNS[cfg.xla_variant]

        def f(a, b, b_t):
            return raw(a, b, b_t).astype(out_dtype)

        jf = jax.jit(f)
        opts = XLA_VARIANT_COMPILER_OPTIONS.get(cfg.xla_variant)
        if opts:
            # Flag-variant sentinels win through program-scope compiler
            # options; the timing chain (make_chained_runner) applies them
            # from this attribute.  Without it the tuner times nolhs_*/
            # scavenge_* identically to the plain dot and can only ever
            # select them by noise.
            jf._compiler_options = opts
        return jf
    elif cfg.pipeline_depth >= 2:
        from tpul2.ops.pipelined import pallas_matmul_pipelined

        def f(a, b, b_t):
            rhs = b_t if cfg.rhs_layout == "nk" else b
            return pallas_matmul_pipelined(a, rhs, cfg,
                                           out_dtype=out_dtype,
                                           interpret=interpret)
    elif cfg.rhs_layout == "nk":
        from tpul2.ops.matmul import pallas_matmul_tn

        def f(a, b, b_t):
            return pallas_matmul_tn(a, b_t, cfg, out_dtype=out_dtype,
                                    interpret=interpret)
    else:
        def f(a, b, b_t):
            return pallas_matmul(a, b, cfg, out_dtype=out_dtype,
                                 interpret=interpret)
    return jax.jit(f)


def _device_data(rng, m, n, k, in_dtype):
    """Fresh normal operands (+ transposed layout) generated ON DEVICE."""
    from tpul2.harness.bench_utils import _gen_operands
    seed = int(rng.integers(0, 2**31 - 1))
    return _gen_operands(jax.random.key(seed), m, n, k,
                         jnp.dtype(in_dtype).name)


class _ShapeTuning:
    """Timing phase for one shape: compile screen + 2-stage timing.

    Produces a ranked finalist list; exactness screening happens later
    (see module docstring for why)."""

    def __init__(self, m, n, k, acc, in_dtype, out_dtype, interpret,
                 max_candidates, stage1_rounds, stage2_rounds, finalists,
                 n_datasets, seed, seed_configs, verbose):
        self.m, self.n, self.k, self.acc = m, n, k, acc
        self.in_dtype, self.out_dtype = in_dtype, out_dtype
        self.interpret, self.verbose = interpret, verbose
        self.t_start = time.perf_counter()
        rng = np.random.default_rng(seed)
        self.rng = rng

        cands = candidate_configs(m, n, k, acc, in_dtype,
                                  max_candidates=max_candidates)
        if seed_configs:
            cands = list(seed_configs) + [c for c in cands
                                          if c not in seed_configs]
        self.n_candidates = len(cands)

        from tpul2.harness import bench_utils as bu

        # Warmup dataset, generated on device (no host↔device transfer).
        # Timing rounds each draw FRESH on-device operands (below): cycling
        # a fixed pool would re-enqueue identical (program, args) pairs,
        # which the axon relay's execution dedup can serve from cache —
        # the very pathology the chained design defends against.
        data0 = _device_data(rng, m, n, k, in_dtype)

        # Chained in-program timing (see bench_utils docstring: plain fenced
        # or batched calls are not trustworthy on tunneled TPU backends).
        # The speedup reference is the PLAIN sentinel (xla_variant='matmul'
        # == stock jnp.matmul); other xla_variant sentinels are ordinary
        # candidates competing alongside the Pallas configs.
        xla_fn = _make_fn(KernelConfig.xla(), out_dtype, interpret)
        try:
            xla_fn.lower(*data0).compile()
        except Exception as e:
            raise RuntimeError(
                f"XLA sentinel failed to compile — cannot tune: {e}")
        # calibrated sizing (resolves the dispatch-floor regime where a
        # short probe cannot see sub-µs per-call times)
        reps2 = bu.calibrated_reps(xla_fn, data0, m, n, k, in_dtype,
                                   target_ms=160.0)
        reps1 = max(8, reps2 // 4)

        # compile screen MERGED into the stage-1 chained-program build: the
        # chain compile subsumes a separate raw compile (half the compile
        # count — the campaign's dominant cost); the raw fn compiles lazily
        # only for the finalists reaching the exactness screen
        compiled = []
        runners1 = []
        for cfg in cands:
            fn = _make_fn(cfg, out_dtype, interpret)
            r = bu.make_chained_runner(fn, m, n, k, in_dtype, reps1)
            try:
                bu.device_fence(r(*data0))  # compile + warmup
            except Exception as e:
                if verbose:
                    print(f"  skip {cfg}: {type(e).__name__}: "
                          f"{str(e)[:120]}")
                continue
            compiled.append((cfg, fn))
            runners1.append(r)
        if not any(c.use_xla and c.xla_variant == "matmul"
                   for c, _ in compiled):
            raise RuntimeError("XLA sentinel failed to run — cannot tune")
        self.n_compiled = len(compiled)
        floor = bu.fence_floor_ms()

        def t_of(runner, data):
            t0 = time.perf_counter()
            bu.device_fence(runner(*data))
            return time.perf_counter() - t0

        order = list(range(len(compiled)))
        times1 = {i: [] for i in order}
        for r in range(stage1_rounds):
            random.shuffle(order)  # per-round shuffled order (C12)
            data = _device_data(rng, m, n, k, in_dtype)  # fresh per round
            for i in order:
                t = t_of(runners1[i], data) * 1e3
                times1[i].append(max(t - floor, 1e-6) / reps1)
        med1 = {i: float(np.median(times1[i])) for i in order}

        ranked = sorted(med1, key=med1.get)
        keep = set(ranked[:finalists])
        keep.add(next(i for i, (c, _) in enumerate(compiled)
                      if c.use_xla and c.xla_variant == "matmul"))
        self.stage2 = [compiled[i] for i in sorted(keep)]

        # stage 2: difference-of-reps with medians (floor cancels exactly)
        timers = [bu.ChainedTimer(fn, m, n, k, in_dtype, reps2)
                  for cfg, fn in self.stage2]
        for t in timers:
            t.warmup(data0)
        order = list(range(len(self.stage2)))
        trials = {i: [] for i in order}
        for r in range(stage2_rounds):
            random.shuffle(order)
            data = _device_data(rng, m, n, k, in_dtype)  # fresh per round
            for i in order:
                trials[i].append(timers[i].measure(data))
        phys = bu.physical_min_ms(m, n, k, in_dtype)
        self.med2 = {
            i: bu.ChainedTimer.per_call_ms(
                trials[i], timers[i].reps_lo, timers[i].reps_hi,
                phys_min_ms=phys)
            for i in order}
        del data0
        self.elapsed_timing = time.perf_counter() - self.t_start

    def finish(self, db: Optional[TuneDB], save: bool) -> TuneResult:
        """Exactness screen + winner selection + persist.

        The screen reference is an INDEPENDENT on-device computation: XLA
        dot_general at f32/HIGHEST precision on 0/1-valued inputs is
        integer-exact (sums ≪ 2²⁴), so max|cand − ref| must be exactly 0
        below the output dtype's integer bound.  Comparing on device keeps
        the D2H to one scalar per finalist — a full-output transfer of a
        16384² f32 result through a tunneled backend takes minutes.  (The
        harness correctness gate separately checks against CPU f32 truth —
        the reference's trust anchor — at gate time.)"""
        from tpul2.harness.correctness import zero_one_density
        m, n, k = self.m, self.n, self.k
        bf16ish = (self.acc == "bfloat16"
                   or jnp.dtype(self.out_dtype).name == "bfloat16")
        dens = zero_one_density(k, "bfloat16" if bf16ish else "float32")
        seed = int(self.rng.integers(0, 2**31 - 1))
        key = jax.random.key(seed)

        @jax.jit
        def gen_01(key):
            ka, kb = jax.random.split(key)
            sa = (jax.random.uniform(ka, (m, k)) < dens).astype(self.in_dtype)
            sb = (jax.random.uniform(kb, (k, n)) < dens).astype(self.in_dtype)
            return sa, sb

        sa, sb = gen_01(key)
        sbt = jnp.swapaxes(sb, 0, 1)
        bound = 256.0 if bf16ish else float(1 << 24)

        @jax.jit
        def ref_out(sa, sb):
            return jax.lax.dot_general(
                sa.astype(jnp.float32), sb.astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)

        truth = ref_out(sa, sb)

        @jax.jit
        def max_masked_diff(out, truth):
            d = jnp.abs(out.astype(jnp.float32) - truth)
            d = jnp.where(jnp.abs(truth) <= bound, d, 0.0)
            finite = jnp.all(jnp.isfinite(out.astype(jnp.float32)))
            return jnp.where(finite, jnp.max(d), jnp.inf)

        ranked = sorted(self.med2, key=self.med2.get)
        xla_i = next(i for i, (c, _) in enumerate(self.stage2)
                     if c.use_xla and c.xla_variant == "matmul")
        best_i = None
        for i in ranked:
            cfg, fn = self.stage2[i]
            diff = float(jax.device_get(max_masked_diff(fn(sa, sb, sbt), truth)))
            if diff == 0.0:
                best_i = i
                break
            if self.verbose:
                print(f"  WRONG RESULT (post-timing screen, diff={diff}) "
                      f"{cfg}")
        if best_i is None:
            raise RuntimeError("no finalist passed the exactness screen")

        flops = 2.0 * m * n * k
        best_cfg = self.stage2[best_i][0]
        best_t = self.med2[best_i]
        xla_t = self.med2[xla_i]
        result = TuneResult(
            m=m, n=n, k=k, acc=self.acc,
            best=best_cfg,
            best_tflops=flops / (best_t * 1e-3) / 1e12,  # med2 is in ms
            xla_tflops=flops / (xla_t * 1e-3) / 1e12,
            speedup=xla_t / best_t,
            n_candidates=self.n_candidates,
            n_compiled=self.n_compiled,
            elapsed_s=time.perf_counter() - self.t_start,
        )
        if save:
            # NOT `db or default_db()`: an empty TuneDB is falsy (__len__),
            # which would silently redirect writes to the default DB.
            db = db if db is not None else default_db()
            persist = True
            if save == "improve":
                # Noise guard (VERDICT r1 / ADVICE: a low-fidelity re-tune
                # must not clobber a campaign-quality entry): only persist
                # when the shape is untuned or the new measurement beats the
                # stored TFLOPS by more than the documented ±10% run-to-run
                # jitter margin.
                stored = db.get_entry(m, n, k, self.acc, self.in_dtype)
                if stored is not None and \
                        result.best_tflops <= stored.get("tflops", 0.0) * 1.10:
                    persist = False
            if persist:
                from tpul2.config import SPACE_REV
                from tpul2.harness.bench_utils import TIMING_REV
                db.put(m, n, k, best_cfg, result.best_tflops, acc=self.acc,
                       in_dtype=self.in_dtype,
                       extra={"speedup_vs_xla": result.speedup,
                              "xla_tflops": result.xla_tflops,
                              "timing_rev": TIMING_REV,
                              "space_rev": SPACE_REV})
                db.save()
        if self.verbose:
            print(f"tuned {m}x{n}x{k}/{self.acc}: "
                  f"bm={best_cfg.bm} bn={best_cfg.bn} bk={best_cfg.bk} "
                  f"{best_cfg.grid_order} "
                  f"{result.best_tflops:.2f} TFLOPS "
                  f"({result.speedup:.3f}x vs XLA)")
        return result


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
               save="improve",
               seed_configs: Optional[list] = None,
               verbose: bool = False) -> TuneResult:
    """Search the config space for one (M, N, K, acc); record the winner.

    NOTE: the final exactness screen performs a device→host transfer; on
    tunneled backends, time-sensitive work in the same process should happen
    before calling this (or use tune_many for batches)."""
    from tpul2.utils.platform import default_interpret, enable_compilation_cache
    enable_compilation_cache()
    if interpret is None:
        interpret = default_interpret()
    if out_dtype is None:
        out_dtype = in_dtype
    st = _ShapeTuning(m, n, k, acc, in_dtype, out_dtype, interpret,
                      max_candidates, stage1_rounds, stage2_rounds,
                      finalists, n_datasets, seed, seed_configs, verbose)
    return st.finish(db, save)


def tune_many(shapes: Sequence[tuple],
              acc: str = "float32",
              in_dtype=jnp.bfloat16,
              out_dtype=None,
              db: Optional[TuneDB] = None,
              interpret: Optional[bool] = None,
              skip_tuned: bool = False,
              seed_from_db: bool = True,
              save="improve",
              verbose: bool = True,
              **kw) -> list:
    """Tune a batch of (M, N, K) shapes with batch-wide phase ordering:
    ALL shapes are timed first (zero device→host transfers), then all
    winners are exactness-screened and persisted.  Resumable: with
    skip_tuned=True, already-tuned shapes are skipped (the checkpoint/
    resume subsystem the reference lacks, SURVEY.md §5).

    save: True (always persist), False (measure only — the round benchmark
    uses this so its low-fidelity re-times never clobber campaign entries),
    or "improve" (persist only beyond the noise margin; the default)."""
    from tpul2.utils.platform import default_interpret, enable_compilation_cache
    enable_compilation_cache()
    if interpret is None:
        interpret = default_interpret()
    if out_dtype is None:
        out_dtype = in_dtype
    if db is None:
        db = default_db()

    pending = []
    for (m, n, k) in shapes:
        stored = db.get(m, n, k, acc, in_dtype)
        if skip_tuned and stored is not None:
            continue
        seeds = [stored] if (seed_from_db and stored is not None) else None
        st = _ShapeTuning(
            m, n, k, acc, in_dtype, out_dtype, interpret,
            kw.get("max_candidates", 48), kw.get("stage1_rounds", 5),
            kw.get("stage2_rounds", 20), kw.get("finalists", 6),
            kw.get("n_datasets", 3), kw.get("seed", 0),
            seeds, verbose)
        pending.append(st)
        if verbose:
            print(f"timed {m}x{n}x{k}/{acc} "
                  f"({st.n_compiled}/{st.n_candidates} candidates, "
                  f"{st.elapsed_timing:.1f}s)")

    results = [st.finish(db, save=save) for st in pending]
    return results
