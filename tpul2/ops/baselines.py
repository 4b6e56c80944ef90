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


# ---------------------------------------------------------------------------
# Auto-tuned baseline: pick the best XLA formulation per shape.
# Mirrors cuBLASLt auto-tuning's explicit pre-tune step
# (find_best_algo_{nn,tn}_v2, SURVEY.md §3.5): enumerate variants, time with
# fresh data and warmup, cache the winner per (M, N, K, layout).
# ---------------------------------------------------------------------------

def _variants(layout: str):
    dims = _NN_DIMS if layout == "nn" else _TN_DIMS

    def pick(a, b, b_t):
        return b if layout == "nn" else b_t

    vs = {}
    vs["default_f32acc"] = lambda a, b, b_t: lax.dot_general(
        a, pick(a, b, b_t), dims,
        preferred_element_type=jnp.float32).astype(a.dtype)
    vs["default_sameacc"] = lambda a, b, b_t: lax.dot_general(
        a, pick(a, b, b_t), dims)
    vs["highest"] = lambda a, b, b_t: lax.dot_general(
        a, pick(a, b, b_t), dims, precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32).astype(a.dtype)
    return vs


_tuned_cache: dict = {}


def find_best_xla_variant(m: int, n: int, k: int, dtype, layout: str,
                          rounds: int = 20, warmup: int = 5) -> str:
    """Pre-tune: time each XLA formulation, cache the median winner.

    Same methodology as the reference C12 autotuner: fresh random data per
    round, per-round shuffled variant order, warmup rounds, median-of-N
    selection (cublas/fp32/hgemm_cublaslt_auto_tuning.cu:195-291).
    """
    import random as _random
    import time as _time

    import numpy as _np

    key = (m, n, k, jnp.dtype(dtype).name, layout)
    if key in _tuned_cache:
        return _tuned_cache[key]

    vs = {name: jax.jit(fn) for name, fn in _variants(layout).items()}
    times = {name: [] for name in vs}
    rng = _np.random.default_rng(0)
    order = list(vs)
    for r in range(warmup + rounds):
        a = jnp.asarray(rng.standard_normal((m, k)), dtype)
        b = jnp.asarray(rng.standard_normal((k, n)), dtype)
        b_t = b.T.reshape(n, k)
        jax.block_until_ready((a, b, b_t))
        _random.shuffle(order)
        for name in order:
            fn = vs[name]
            jax.block_until_ready(fn(a, b, b_t))
            t0 = _time.perf_counter()
            jax.block_until_ready(fn(a, b, b_t))
            dt = _time.perf_counter() - t0
            if r >= warmup:
                times[name].append(dt)
    best = min(times, key=lambda nm: float(_np.median(times[nm])))
    _tuned_cache[key] = best
    return best


def _autotuned(layout: str):
    def fn(a, b, b_t):
        m, k = a.shape
        n = b.shape[1]
        name = find_best_xla_variant(m, n, k, a.dtype, layout)
        return jax.jit(_variants(layout)[name])(a, b, b_t)
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
