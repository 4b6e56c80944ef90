"""XLA baselines — the TPU 'vendor library' the candidate must beat.

Role-for-role mapping of the reference's seven baseline perf funcs
(SURVEY.md C1 PERF_FUNCS, C10–C12) onto TPU:

  torch.matmul                  → xla_matmul        (stock jnp.matmul)
  cublas_{nn,tn}                → xla_dot_{nn,tn}   (lax.dot_general, f32 acc)
  cublaslt_heuristic_{nn,tn}    → xla_highest_{nn,tn} (precision=HIGHEST)
  cublaslt_auto_tuning_{nn,tn}  → xla_autotuned_{nn,tn} (pre-tuned best-of-
                                   formulations; see find_best_xla_variant)

All funcs share the reference's universal ABI (pybind/hgemm_a100_fp32.cc:11-27,
adapted to a functional runtime): f(a, b, b_t) -> C where a:(M,K) and both
row-major b:(K,N) and its transposed layout b_t:(N,K) are always supplied;
each func consumes the layout it prefers.  Unlike the reference's CUDA
out-param style, outputs are returned (JAX arrays are immutable).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_NN_DIMS = (((1,), (0,)), ((), ()))  # a:(M,K) @ b:(K,N)
_TN_DIMS = (((1,), (1,)), ((), ()))  # a:(M,K) @ b_t:(N,K) contracted on K


@jax.jit
def xla_matmul(a, b, b_t):
    """Stock jnp.matmul — the torch.matmul analogue."""
    return jnp.matmul(a, b)


@jax.jit
def xla_dot_nn(a, b, b_t):
    return lax.dot_general(a, b, _NN_DIMS,
                           preferred_element_type=jnp.float32).astype(a.dtype)


@jax.jit
def xla_dot_tn(a, b, b_t):
    return lax.dot_general(a, b_t, _TN_DIMS,
                           preferred_element_type=jnp.float32).astype(a.dtype)


@jax.jit
def xla_highest_nn(a, b, b_t):
    return lax.dot_general(a, b, _NN_DIMS, precision=lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32).astype(a.dtype)


@jax.jit
def xla_highest_tn(a, b, b_t):
    return lax.dot_general(a, b_t, _TN_DIMS, precision=lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32).astype(a.dtype)


@jax.jit
def xla_sameacc_nn(a, b, b_t):
    """dot_general with same-dtype accumulation (no f32 carry)."""
    return lax.dot_general(a, b, _NN_DIMS)


@jax.jit
def xla_sameacc_tn(a, b, b_t):
    return lax.dot_general(a, b_t, _TN_DIMS)


# Round-4 XLA-flag variants (VERDICT r3 next-round #7): per-compilation
# XLA TPU flags are the genuine analogue of cuBLASLt-AT's unlisted vendor
# algo space (hgemm_cublaslt_auto_tuning.cu:153-162 requests <=100 algos).
# scripts/probe_xla_flags.py measured four flag sets across the bands
# (eval_results/probe_xla_flags_r4.jsonl): disabling the latency-hiding
# scheduler is the one consistent winner (+3.6% on 8192x128x64, +2.6% on
# 4096^3, max loss -1%); the scoped-VMEM and aggressive-fusion sets are
# mixed-to-losing (vmem112m: -14% on 4096^3) and are excluded from the
# measured set by that evidence.  Compiler options apply at PROGRAM scope,
# so the timing harness passes them to the chained program's jit
# (bench_utils.make_chained_runner reads ``_compiler_options``); the math
# is identical to the base formulation, only the schedule differs.
NOLHS_OPTIONS = {"xla_tpu_enable_latency_hiding_scheduler": "false"}


def xla_nolhs_nn(a, b, b_t):
    """dot_general, f32 acc, latency-hiding scheduler disabled."""
    return lax.dot_general(a, b, _NN_DIMS,
                           preferred_element_type=jnp.float32).astype(a.dtype)


def xla_nolhs_tn(a, b, b_t):
    return lax.dot_general(a, b_t, _TN_DIMS,
                           preferred_element_type=jnp.float32).astype(a.dtype)


xla_nolhs_nn._compiler_options = NOLHS_OPTIONS
xla_nolhs_tn._compiler_options = NOLHS_OPTIONS


# Round-5 flag variant (VERDICT r4 next-round #7): scripts/probe_xla_flags.py
# swept 14 per-compilation flag sets over 8 band-representative shapes
# (eval_results/probe_xla_flags_r5.jsonl).  VMEM scavenging for fusions is
# the one big reproducible winner: +6.0% on 8192^3 (the round-4 MFU-gap
# flagship), +1.3-2.0% across the other squares and streaming shapes,
# never below 0.992.  The runners-up (expt_sched +3.7% / no_dot_sr +2.2%
# on single shapes, mixed elsewhere) stay out of the measured set by the
# same evidence standard that excluded vmem112m in round 4.
SCAVENGE_OPTIONS = {"xla_tpu_scavenge_vmem_for_fusions": "true"}


def xla_scavenge_nn(a, b, b_t):
    """dot_general, f32 acc, VMEM scavenging for fusions enabled."""
    return lax.dot_general(a, b, _NN_DIMS,
                           preferred_element_type=jnp.float32).astype(a.dtype)


def xla_scavenge_tn(a, b, b_t):
    return lax.dot_general(a, b_t, _TN_DIMS,
                           preferred_element_type=jnp.float32).astype(a.dtype)


xla_scavenge_nn._compiler_options = SCAVENGE_OPTIONS
xla_scavenge_tn._compiler_options = SCAVENGE_OPTIONS


# ---------------------------------------------------------------------------
# Auto-tuned baseline: pick the best XLA formulation per shape.
# Mirrors cuBLASLt auto-tuning's explicit pre-tune step
# (find_best_algo_{nn,tn}_v2, SURVEY.md §3.5): enumerate variants, time with
# fresh data and warmup, cache the winner per (M, N, K, layout).
# ---------------------------------------------------------------------------

def _variants(layout: str):
    """Candidate XLA formulations for one requested layout.

    The reference's analogue enumerates ≤100 cuBLASLt algos
    (cublas/fp32/hgemm_cublaslt_auto_tuning.cu:153-162); XLA exposes far
    fewer orthogonal knobs, so the set is: accumulator handling (f32 carry
    vs same-dtype), precision flag (DEFAULT vs HIGHEST), and — genuinely a
    different algorithm on TPU — computing through the OPPOSITE operand
    layout (both layouts are always supplied by the harness ABI, so e.g.
    an 'nn' request may be served by contracting against b_t)."""
    dims = _NN_DIMS if layout == "nn" else _TN_DIMS
    opp_dims = _TN_DIMS if layout == "nn" else _NN_DIMS

    def pick(b, b_t):
        return b if layout == "nn" else b_t

    def opp(b, b_t):
        return b_t if layout == "nn" else b

    vs = {}
    vs["default_f32acc"] = lambda a, b, b_t: lax.dot_general(
        a, pick(b, b_t), dims,
        preferred_element_type=jnp.float32).astype(a.dtype)
    vs["default_sameacc"] = lambda a, b, b_t: lax.dot_general(
        a, pick(b, b_t), dims)
    vs["highest"] = lambda a, b, b_t: lax.dot_general(
        a, pick(b, b_t), dims, precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32).astype(a.dtype)
    vs["opp_layout_f32acc"] = lambda a, b, b_t: lax.dot_general(
        a, opp(b, b_t), opp_dims,
        preferred_element_type=jnp.float32).astype(a.dtype)
    vs["opp_layout_sameacc"] = lambda a, b, b_t: lax.dot_general(
        a, opp(b, b_t), opp_dims)
    # compiler-flag variant (round 4; see NOLHS_OPTIONS above)
    nolhs = lambda a, b, b_t: lax.dot_general(  # noqa: E731
        a, pick(b, b_t), dims,
        preferred_element_type=jnp.float32).astype(a.dtype)
    nolhs._compiler_options = NOLHS_OPTIONS
    vs["nolhs"] = nolhs
    scavenge = lambda a, b, b_t: lax.dot_general(  # noqa: E731
        a, pick(b, b_t), dims,
        preferred_element_type=jnp.float32).astype(a.dtype)
    scavenge._compiler_options = SCAVENGE_OPTIONS
    vs["scavenge"] = scavenge
    return vs


#: (m, n, k, dtype, layout) -> winning variant name.
_tuned_cache: dict = {}
#: layout -> {name: jitted fn}, built once (no per-call jax.jit — see
#: VERDICT r1 Weak #2: a fresh jit-wrapped lambda per call retraces).
_jitted_variants: dict = {}


def _jit_options(fn):
    """compiler options a jit of fn should carry (TPU only — the CPU
    backend rejects unknown TPU flags)."""
    from tpul2.utils.platform import on_tpu
    opts = getattr(fn, "_compiler_options", None)
    return opts if (opts and on_tpu()) else None


def _jitted(layout: str) -> dict:
    if layout not in _jitted_variants:
        _jitted_variants[layout] = {
            name: jax.jit(fn, compiler_options=_jit_options(fn))
            for name, fn in _variants(layout).items()}
    return _jitted_variants[layout]


def find_best_xla_variant(m: int, n: int, k: int, dtype, layout: str,
                          trials: int = 5, target_ms: float = 40.0) -> str:
    """Pre-tune: time each XLA formulation, cache the median winner.

    Methodology mirrors the reference C12 autotuner (fresh random data per
    round, per-round shuffled order, median-of-N selection,
    cublas/fp32/hgemm_cublaslt_auto_tuning.cu:195-291) — but timing uses the
    chained difference-of-reps method from bench_utils, the only primitive
    this repo trusts on tunneled TPU backends (``block_until_ready`` is NOT
    a fence there; see bench_utils docstring).  Selection is deterministic
    enough to reproduce across runs: medians over `trials` shuffled rounds
    of multi-rep chained programs.
    """
    import random as _random

    import numpy as _np

    from tpul2.harness import bench_utils as bu

    key = (m, n, k, jnp.dtype(dtype).name, layout)
    if key in _tuned_cache:
        return _tuned_cache[key]

    # RAW variants for timing: the chained program is the top-level jit and
    # applies any _compiler_options itself — a jitted-with-options twin
    # nested inside the chain is rejected by JAX (options are top-level
    # only).  The jitted twins serve the eager exec path (_autotuned).
    vs = _variants(layout)
    rng = _np.random.default_rng(0)
    data0 = bu.fresh_inputs(rng, m, n, k, dtype)
    est = bu.estimate_per_call_ms(vs["default_f32acc"], data0, m, n, k, dtype)
    reps = bu.pick_reps(est, target_ms=target_ms)
    timers = {name: bu.ChainedTimer(fn, m, n, k, dtype, reps)
              for name, fn in vs.items()}
    for t in timers.values():
        t.warmup(data0)
    trials_by = {name: [] for name in vs}
    order = list(vs)
    for _ in range(trials):
        data = bu.fresh_inputs(rng, m, n, k, dtype)
        _random.shuffle(order)
        for name in order:
            trials_by[name].append(timers[name].measure(data))
    phys = bu.physical_min_ms(m, n, k, dtype)
    med = {name: bu.ChainedTimer.per_call_ms(
        trials_by[name], timers[name].reps_lo, timers[name].reps_hi,
        phys_min_ms=phys) for name in vs}
    # Deterministic near-tie resolution (VERDICT r1 #5 'reproducible
    # selection'): variants routinely measure within noise of each other,
    # where a bare argmin flips run-to-run.  Take the FIRST variant in the
    # fixed declaration order within 2% of the minimum — stable whenever
    # the within-noise set is stable, and never more than 2% off optimum.
    floor_ms = min(med.values())
    best = next(name for name in vs if med[name] <= floor_ms * 1.02)
    _tuned_cache[key] = best
    return best


def _autotuned(layout: str):
    def fn(a, b, b_t):
        m, k = a.shape
        n = b.shape[1]
        name = find_best_xla_variant(m, n, k, a.dtype, layout)
        # Raw variant when tracing (inlined into the caller's jit); the
        # pre-built jitted twin when called eagerly — never a fresh jit.
        if isinstance(a, jax.core.Tracer):
            return _variants(layout)[name](a, b, b_t)
        return _jitted(layout)[name](a, b, b_t)
    fn.__name__ = f"xla_autotuned_{layout}"
    return fn


xla_autotuned_nn = _autotuned("nn")
xla_autotuned_tn = _autotuned("tn")


#: Ordered baseline registry — the analogue of eval_one_file.sh's PERF_FUNCS
#: list (SURVEY.md C1 :82-90).
BASELINES = {
    "xla_matmul": xla_matmul,
    "xla_dot_nn": xla_dot_nn,
    "xla_dot_tn": xla_dot_tn,
    "xla_highest_nn": xla_highest_nn,
    "xla_highest_tn": xla_highest_tn,
    "xla_autotuned_nn": xla_autotuned_nn,
    "xla_autotuned_tn": xla_autotuned_tn,
}


def baseline_fn(name: str):
    return BASELINES[name]


#: Measured function set for suite-scale (lean) evaluation: every concrete
#: XLA formulation is timed once, and the AutoTuned-{nn,tn} columns are
#: DERIVED as the per-shape best of each layout's variant set (exactly the
#: winner find_best_xla_variant would pre-tune to, minus the re-measure
#: noise of timing it twice).
LEAN_EVAL_FUNCS = {
    "xla_matmul": xla_matmul,
    "xla_dot_nn": xla_dot_nn,
    "xla_dot_tn": xla_dot_tn,
    "xla_highest_nn": xla_highest_nn,
    "xla_highest_tn": xla_highest_tn,
    "xla_sameacc_nn": xla_sameacc_nn,
    "xla_sameacc_tn": xla_sameacc_tn,
    "xla_nolhs_nn": xla_nolhs_nn,
    "xla_nolhs_tn": xla_nolhs_tn,
    "xla_scavenge_nn": xla_scavenge_nn,
    "xla_scavenge_tn": xla_scavenge_tn,
}

#: Variant sets backing each derived autotuned column — mirrors
#: _variants(layout) above (default/sameacc/highest/compiler-flag +
#: opposite-layout).
AUTOTUNED_VARIANT_SETS = {
    "xla_autotuned_nn": ("xla_dot_nn", "xla_sameacc_nn", "xla_highest_nn",
                         "xla_nolhs_nn", "xla_scavenge_nn", "xla_dot_tn",
                         "xla_sameacc_tn", "xla_nolhs_tn",
                         "xla_scavenge_tn"),
    "xla_autotuned_tn": ("xla_dot_tn", "xla_sameacc_tn", "xla_highest_tn",
                         "xla_nolhs_tn", "xla_scavenge_tn", "xla_dot_nn",
                         "xla_sameacc_nn", "xla_nolhs_nn",
                         "xla_scavenge_nn"),
}


#: Raw (unjitted) XLA formulations keyed by KernelConfig.xla_variant —
#: the sentinel's dispatch table.  The tuner enumerates these as candidates
#: (config.XLA_VARIANTS_FOR_ACC) so the stored winner competes with the
#: full formulation set the XLA-AutoTuned baseline draws from; dispatch
#: inlines the raw fn into the caller's jit.  All return the f32 (or
#: native-acc) product; the caller applies the output cast.
XLA_VARIANT_FNS = {
    "matmul": lambda a, b, b_t: jnp.matmul(
        a, b, preferred_element_type=jnp.float32),
    "dot_nn": lambda a, b, b_t: lax.dot_general(
        a, b, _NN_DIMS, preferred_element_type=jnp.float32),
    "dot_tn": lambda a, b, b_t: lax.dot_general(
        a, b_t, _TN_DIMS, preferred_element_type=jnp.float32),
    "highest_nn": lambda a, b, b_t: lax.dot_general(
        a, b, _NN_DIMS, precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32),
    "highest_tn": lambda a, b, b_t: lax.dot_general(
        a, b_t, _TN_DIMS, precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32),
    "sameacc_nn": lambda a, b, b_t: lax.dot_general(a, b, _NN_DIMS),
    "sameacc_tn": lambda a, b, b_t: lax.dot_general(a, b_t, _TN_DIMS),
    # Flag variants compute the plain f32-acc dot; their win comes from the
    # program-scope compiler options below, which the harness applies when
    # the sentinel is the whole measured program (the same footing as a
    # reference kernel controlling its own launch configuration).  Inside a
    # larger user jit the options are unreachable and the variant degrades
    # to its base formulation — numerics identical either way.
    "nolhs_nn": lambda a, b, b_t: lax.dot_general(
        a, b, _NN_DIMS, preferred_element_type=jnp.float32),
    "nolhs_tn": lambda a, b, b_t: lax.dot_general(
        a, b_t, _TN_DIMS, preferred_element_type=jnp.float32),
    "scavenge_nn": lambda a, b, b_t: lax.dot_general(
        a, b, _NN_DIMS, preferred_element_type=jnp.float32),
    "scavenge_tn": lambda a, b, b_t: lax.dot_general(
        a, b_t, _TN_DIMS, preferred_element_type=jnp.float32),
}

#: Program-scope compiler options per sentinel variant (empty for most).
#: The benchmark harness attaches these to the candidate's chained program
#: when the dispatched config is a flag-variant sentinel.
XLA_VARIANT_COMPILER_OPTIONS = {
    "nolhs_nn": NOLHS_OPTIONS,
    "nolhs_tn": NOLHS_OPTIONS,
    "scavenge_nn": SCAVENGE_OPTIONS,
    "scavenge_tn": SCAVENGE_OPTIONS,
}
