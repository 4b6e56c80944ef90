"""Batched matmul (B, M, K) @ (B, K, N) on the tuned Pallas template.

No reference counterpart file — the reference library is strictly 2D GEMM —
but LLM serving (the reference's motivating workload, README shape grid)
needs batched GEMMs for attention; a TPU-native rebuild ships it as a
first-class op.  The batch dimension becomes the outermost ("parallel")
grid axis; each batch element reuses the same tuned (bm, bn, bk) tiling.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpul2.config import KernelConfig
from tpul2.utils.padding import round_up
from tpul2.utils.platform import default_interpret


def _bmm_kernel(a_ref, b_ref, o_ref, acc_ref, *, acc_dtype, out_dtype):
    k = pl.program_id(3)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    part = jnp.dot(a_ref[0], b_ref[0], preferred_element_type=jnp.float32)
    acc_ref[:] = (acc_ref[:].astype(jnp.float32) + part).astype(acc_dtype)

    @pl.when(k == pl.num_programs(3) - 1)
    def _epilogue():
        o_ref[0] = acc_ref[:].astype(out_dtype)


def _bmm_kernel_single_k(a_ref, b_ref, o_ref, *, out_dtype):
    o_ref[0] = jnp.dot(a_ref[0], b_ref[0],
                       preferred_element_type=jnp.float32).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _bmm_vjp(a, b, cfg, out_dtype_name, interpret):
    return _bmm_forward(a, b, cfg, jnp.dtype(out_dtype_name), interpret)


def _bmm_fwd(a, b, cfg, out_dtype_name, interpret):
    return _bmm_vjp(a, b, cfg, out_dtype_name, interpret), (a, b)


def _bmm_bwd(cfg, out_dtype_name, interpret, res, g):
    # Backward via XLA batched dots (correct and MXU-optimal for the
    # transposed layouts; same policy as ops.matmul._matmul_bwd).
    a, b = res
    gf = g.astype(jnp.float32)
    da = jnp.matmul(gf, jnp.swapaxes(b.astype(jnp.float32), 1, 2))
    db = jnp.matmul(jnp.swapaxes(a.astype(jnp.float32), 1, 2), gf)
    return da.astype(a.dtype), db.astype(b.dtype)


_bmm_vjp.defvjp(_bmm_fwd, _bmm_bwd)


def pallas_batched_matmul(a: jax.Array, b: jax.Array,
                          config: Optional[KernelConfig] = None,
                          out_dtype=None,
                          interpret: Optional[bool] = None) -> jax.Array:
    """C[b] = A[b] @ B[b] for b in range(batch).  Differentiable."""
    cfg = config or KernelConfig()
    if out_dtype is None:
        out_dtype = a.dtype
    if interpret is None:
        interpret = default_interpret()
    err = cfg.validate(a.dtype, shape=(a.shape[1], b.shape[2], a.shape[2]))
    if err:
        raise ValueError(f"invalid kernel config for dtype {a.dtype}: {err}")
    return _bmm_vjp(a, b, cfg, jnp.dtype(out_dtype).name, bool(interpret))


def _bmm_forward(a: jax.Array, b: jax.Array,
                 config: Optional[KernelConfig] = None,
                 out_dtype=None,
                 interpret: Optional[bool] = None) -> jax.Array:
    cfg = config or KernelConfig()
    if out_dtype is None:
        out_dtype = a.dtype
    if interpret is None:
        interpret = default_interpret()
    err = cfg.validate(a.dtype, shape=(a.shape[1], b.shape[2], a.shape[2]))
    if err:
        raise ValueError(f"invalid kernel config for dtype {a.dtype}: {err}")

    bt, m, k = a.shape
    bt2, k2, n = b.shape
    assert bt == bt2 and k == k2, \
        f"bmm shape mismatch: {a.shape} @ {b.shape}"
    bm, bn, bk = cfg.bm, cfg.bn, cfg.bk
    mp, np_, kp = round_up(m, bm), round_up(n, bn), round_up(k, bk)
    if (mp, kp) != (m, k):
        a = jnp.pad(a, ((0, 0), (0, mp - m), (0, kp - k)))
    if (kp, np_) != (k, n):
        b = jnp.pad(b, ((0, 0), (0, kp - k), (0, np_ - n)))

    gm, gn, gk = mp // bm, np_ // bn, kp // bk
    grid = (bt, gm, gn, gk)
    acc_dtype = jnp.dtype(cfg.acc_dtype)

    if gk == 1:
        kernel = functools.partial(_bmm_kernel_single_k,
                                   out_dtype=jnp.dtype(out_dtype))
        scratch = []
    else:
        kernel = functools.partial(_bmm_kernel, acc_dtype=acc_dtype,
                                   out_dtype=jnp.dtype(out_dtype))
        scratch = [pltpu.VMEM((bm, bn), acc_dtype)]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, bk), lambda t, i, j, k: (t, i, k)),
            pl.BlockSpec((1, bk, bn), lambda t, i, j, k: (t, k, j)),
        ],
        out_specs=pl.BlockSpec((1, bm, bn), lambda t, i, j, k: (t, i, j)),
        out_shape=jax.ShapeDtypeStruct((bt, mp, np_), jnp.dtype(out_dtype)),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * bt * mp * np_ * kp,
            bytes_accessed=bt * ((mp * kp + kp * np_) * 2 + mp * np_ * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, b)
    if (mp, np_) != (m, n):
        out = out[:, :m, :n]
    return out
