"""Parameterized Pallas MXU matmul — the kernel generator.

TPU-native replacement for the reference kernel zoo (SURVEY.md C9:
``kernels/{3090,a100,h100}_*/M_N_K.cu``, 3,736 files, one frozen tactic per
shape).  One template, every shape: the (M, N, K) problem is tiled onto a
(grid_m, grid_n, grid_k) Pallas grid; each grid step loads one (bm, bk) block
of A and one (bk, bn) block of B into VMEM (Mosaic double-buffers the HBM→VMEM
DMAs across steps — the role of the reference's multi-stage ``cp.async``
pipeline, kernels/a100_F32F16F16F32/4096_4096_4096.cu:88-141), feeds the MXU
via ``jnp.dot(..., preferred_element_type=f32)`` (the role of the
SM80_16x8x16 MMA atoms), and carries a (bm, bn) accumulator in VMEM scratch
across the K steps (the role of the register-file accumulator fragments).
The epilogue casts the accumulator to the output dtype on the final K step
(the role of the smem-staged r2s→s2g epilogue, ibid.:143-176).

Shape contract (SURVEY.md C3) — two edge modes, selected per tuned config:
  edge='pad'  — inputs zero-padded to block multiples and the output sliced
                back (the reference's design choice: caller-side padding,
                tools/utils.py);
  edge='mask' — in-kernel predication (VERDICT r2 next-round #3a): the grid
                is cdiv-sized over the RAW problem dims, Pallas drops
                out-of-bounds output stores on the partial M/N edge blocks,
                and the K-tail of the final k step is zeroed in-kernel
                before it reaches the MXU (out-of-bounds HBM reads are
                undefined, and 0·garbage would still poison the
                accumulator if the garbage is non-finite — both operands'
                tails are masked).  No padding round trip over HBM, no
                output slice copy, and unaligned dims no longer force
                full-dim blocks.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpul2.config import KernelConfig
from tpul2.utils.padding import pad_operands
from tpul2.utils.platform import default_interpret


#: Fused epilogues applied to the f32 accumulator before the output cast —
#: the role of the reference kernels' smem-staged epilogue (:143-176),
#: extended with elementwise fusion (a classic Pallas win: XLA fuses these
#: into ITS dots; the tuned kernel must not lose that fusion to an extra
#: HBM round trip).
ACTIVATIONS = {
    None: lambda x: x,
    "relu": lambda x: jnp.maximum(x, 0.0),
    "gelu": jax.nn.gelu,
    "silu": jax.nn.silu,
    "tanh": jnp.tanh,
}


def _apply_epilogue(acc_f32, bias_ref, activation):
    if bias_ref is not None:
        acc_f32 = acc_f32 + bias_ref[:].astype(jnp.float32)
    return ACTIVATIONS[activation](acc_f32)


_TN_DIMS = (((1,), (1,)), ((), ()))  # a:(bm,bk) x b_t:(bn,bk) -> (bm,bn)


def _block_dot(a_blk, b_blk, rhs_nk: bool):
    """MXU block product; rhs_nk consumes the transposed-B layout (the
    reference's TN contract — kernels take b_col_major)."""
    if rhs_nk:
        return jax.lax.dot_general(a_blk, b_blk, _TN_DIMS,
                                   preferred_element_type=jnp.float32)
    return jnp.dot(a_blk, b_blk, preferred_element_type=jnp.float32)


def _masked_block_dot(a_blk, b_blk, rhs_nk: bool, k_rem: int):
    """Block product with the K-tail zeroed (edge='mask', final k step).

    The K-edge is the one edge Pallas's out-of-bounds store masking cannot
    cover: garbage loaded past K contaminates VALID output rows/cols.
    Both operands are masked — a_tail·garbage would still be 0·NaN = NaN
    if only one side were zeroed.  k_rem is STATIC (the final block's
    valid width), so the mask lowers to a compile-time-shaped select on
    the VPU, negligible next to the MXU block product."""
    ka = jax.lax.broadcasted_iota(jnp.int32, a_blk.shape, 1) < k_rem
    a_blk = jnp.where(ka, a_blk, jnp.zeros_like(a_blk))
    k_dim = 1 if rhs_nk else 0
    kb = jax.lax.broadcasted_iota(jnp.int32, b_blk.shape, k_dim) < k_rem
    b_blk = jnp.where(kb, b_blk, jnp.zeros_like(b_blk))
    return _block_dot(a_blk, b_blk, rhs_nk)


def _kernel_multi_k(a_ref, b_ref, *rest, acc_dtype, out_dtype, has_bias,
                    activation, rhs_nk=False, k_rem=None):
    """Grid step with K-accumulation carry (grid_k > 1).

    k_rem (static) is the valid width of the FINAL K block when edge='mask'
    and bk does not divide K; interior steps run the unmasked fast path."""
    if has_bias:
        bias_ref, o_ref, acc_ref = rest
    else:
        (o_ref, acc_ref), bias_ref = rest, None
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    last = k == pl.num_programs(2) - 1
    if k_rem is None:
        # MXU: one block product, f32 MACs.
        part = _block_dot(a_ref[:], b_ref[:], rhs_nk)
        acc_ref[:] = (acc_ref[:].astype(jnp.float32) + part).astype(acc_dtype)
    else:
        @pl.when(jnp.logical_not(last))
        def _interior():
            part = _block_dot(a_ref[:], b_ref[:], rhs_nk)
            acc_ref[:] = (acc_ref[:].astype(jnp.float32)
                          + part).astype(acc_dtype)

        @pl.when(last)
        def _edge():
            part = _masked_block_dot(a_ref[:], b_ref[:], rhs_nk, k_rem)
            acc_ref[:] = (acc_ref[:].astype(jnp.float32)
                          + part).astype(acc_dtype)

    @pl.when(last)
    def _epilogue():
        acc = acc_ref[:].astype(jnp.float32)
        o_ref[:] = _apply_epilogue(acc, bias_ref, activation).astype(out_dtype)


def _kernel_single_k(a_ref, b_ref, *rest, out_dtype, has_bias, activation,
                     rhs_nk=False, k_rem=None):
    """Grid step when the whole K dimension fits one block: no carry, no
    scratch — the analogue of the reference's hand-rolled small-shape WMMA
    kernels (SURVEY.md C9, e.g. kernels/h100_F32F16F16F32/64_64_64.cu)."""
    if has_bias:
        bias_ref, o_ref = rest
    else:
        (o_ref,), bias_ref = rest, None
    if k_rem is None:
        acc = _block_dot(a_ref[:], b_ref[:], rhs_nk)
    else:
        acc = _masked_block_dot(a_ref[:], b_ref[:], rhs_nk, k_rem)
    o_ref[:] = _apply_epilogue(acc, bias_ref, activation).astype(out_dtype)


def _build_call(mp: int, np_: int, kp: int, cfg: KernelConfig,
                in_dtype, out_dtype, interpret: bool,
                has_bias: bool = False, activation=None):
    """Assemble the pallas_call for an (mp, np_, kp) problem.

    With edge='pad' the dims arrive pre-padded to block multiples (grid
    divides exactly); with edge='mask' they are the RAW problem dims — the
    grid is cdiv-sized, partial M/N edge blocks rely on Pallas's
    out-of-bounds store masking, and the K-tail is zeroed in-kernel
    (``k_rem``)."""
    from tpul2.utils.padding import cdiv
    bm, bn, bk = cfg.bm, cfg.bn, cfg.bk
    gm, gn, gk = cdiv(mp, bm), cdiv(np_, bn), cdiv(kp, bk)
    # static valid width of the final K block; None = no masking needed
    k_rem_val = kp - (gk - 1) * bk
    k_rem = None if k_rem_val == bk else k_rem_val
    acc_dtype = jnp.dtype(cfg.acc_dtype)

    mn_parallel = "parallel" if cfg.parallel_mn else "arbitrary"
    dim_sem = (mn_parallel, mn_parallel, "arbitrary")

    rhs_nk = cfg.rhs_layout == "nk"
    if cfg.grid_order == "mn":
        grid = (gm, gn, gk)
        a_map = lambda i, j, k: (i, k)  # noqa: E731
        b_map = (lambda i, j, k: (j, k)) if rhs_nk else \
            (lambda i, j, k: (k, j))  # noqa: E731
        o_map = lambda i, j, k: (i, j)  # noqa: E731
        bias_map = lambda i, j, k: (0, j)  # noqa: E731
    else:
        grid = (gn, gm, gk)
        a_map = lambda j, i, k: (i, k)  # noqa: E731
        b_map = (lambda j, i, k: (j, k)) if rhs_nk else \
            (lambda j, i, k: (k, j))  # noqa: E731
        o_map = lambda j, i, k: (i, j)  # noqa: E731
        bias_map = lambda j, i, k: (0, j)  # noqa: E731

    cost = pl.CostEstimate(
        flops=2 * mp * np_ * kp,
        bytes_accessed=(mp * kp + kp * np_) * jnp.dtype(in_dtype).itemsize
        + mp * np_ * jnp.dtype(out_dtype).itemsize,
        transcendentals=0,
    )
    params = {}
    if cfg.vmem_limit_bytes is not None:
        params["vmem_limit_bytes"] = int(cfg.vmem_limit_bytes)
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=dim_sem, **params)

    in_specs = [
        pl.BlockSpec((bm, bk), a_map),
        pl.BlockSpec((bn, bk) if rhs_nk else (bk, bn), b_map),
    ]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, bn), bias_map))

    if gk == 1:
        kernel = functools.partial(
            _kernel_single_k, out_dtype=out_dtype, has_bias=has_bias,
            activation=activation, rhs_nk=rhs_nk, k_rem=k_rem)
        scratch = []
    else:
        kernel = functools.partial(
            _kernel_multi_k, acc_dtype=acc_dtype, out_dtype=out_dtype,
            has_bias=has_bias, activation=activation, rhs_nk=rhs_nk,
            k_rem=k_rem)
        scratch = [pltpu.VMEM((bm, bn), acc_dtype)]

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), o_map),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=scratch,
        compiler_params=compiler_params,
        cost_estimate=cost,
        interpret=interpret,
    )


def _forward_padded(a, b, cfg: KernelConfig, out_dtype, interpret: bool,
                    bias=None, activation=None, b_t=None):
    """b is (K, N) row-major; for rhs_layout='nk' the kernel consumes the
    transposed (N, K) operand — taken from ``b_t`` when the caller already
    has it materialized (the harness ABI always does, mirroring the
    reference's b_col_major argument) or derived here otherwise."""
    from tpul2.utils.padding import pad_to, round_up
    if cfg.edge == "mask":
        # In-kernel predicated edges: no padding copies, no output slice —
        # the kernel runs over the raw dims (see _build_call).
        m, k = a.shape
        if cfg.rhs_layout == "nk":
            rhs = b_t if b_t is not None else jnp.swapaxes(b, 0, 1)
            n = rhs.shape[0]
        else:
            rhs = b
            n = b.shape[1]
        call = _build_call(m, n, k, cfg, a.dtype, jnp.dtype(out_dtype),
                           interpret, has_bias=bias is not None,
                           activation=activation)
        if bias is not None:
            return call(a, rhs, bias.reshape(1, -1)), (m, n)
        return call(a, rhs), (m, n)
    if cfg.rhs_layout == "nk":
        bt = b_t if b_t is not None else jnp.swapaxes(b, 0, 1)
        m, k = a.shape
        n = bt.shape[0]
        mp, np_, kp = (round_up(m, cfg.bm), round_up(n, cfg.bn),
                       round_up(k, cfg.bk))
        a_p = pad_to(a, mp, kp)
        rhs_p = pad_to(bt, np_, kp)
    else:
        a_p, rhs_p, (m, n) = pad_operands(a, b, cfg.bm, cfg.bn, cfg.bk)
        mp, kp = a_p.shape
        _, np_ = rhs_p.shape
    call = _build_call(mp, np_, kp, cfg, a.dtype, jnp.dtype(out_dtype),
                       interpret, has_bias=bias is not None,
                       activation=activation)
    if bias is not None:
        bias_p = jnp.pad(bias.reshape(1, -1), ((0, 0), (0, np_ - n)))
        return call(a_p, rhs_p, bias_p), (m, n)
    return call(a_p, rhs_p), (m, n)


def _forward(a, b, cfg: KernelConfig, out_dtype, interpret: bool,
             bias=None, activation=None):
    out, (m, n) = _forward_padded(a, b, cfg, out_dtype, interpret,
                                  bias=bias, activation=activation)
    if out.shape != (m, n):
        out = out[:m, :n]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused_vjp(a, b, bias, cfg, out_dtype_name, activation, interpret):
    return _forward(a, b, cfg, jnp.dtype(out_dtype_name), interpret,
                    bias=bias, activation=activation)


def _fused_ref_f32(a, b, bias, activation):
    """Differentiable XLA reference of the fused epilogue (used for bwd)."""
    h = jnp.matmul(a.astype(jnp.float32), b.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    if bias is not None:
        h = h + bias.astype(jnp.float32)
    return ACTIVATIONS[activation](h)


def _fused_fwd(a, b, bias, cfg, out_dtype_name, activation, interpret):
    out = _fused_vjp(a, b, bias, cfg, out_dtype_name, activation, interpret)
    return out, (a, b, bias)


def _fused_bwd(cfg, out_dtype_name, activation, interpret, res, g):
    a, b, bias = res
    _, vjp = jax.vjp(lambda a_, b_, bias_:
                     _fused_ref_f32(a_, b_, bias_, activation), a, b, bias)
    da, db, dbias = vjp(g.astype(jnp.float32))
    return (da.astype(a.dtype), db.astype(b.dtype),
            None if bias is None else dbias.astype(bias.dtype))


_fused_vjp.defvjp(_fused_fwd, _fused_bwd)


def pallas_matmul_fused(a: jax.Array, b: jax.Array,
                        bias: Optional[jax.Array] = None,
                        activation: Optional[str] = None,
                        config: Optional[KernelConfig] = None,
                        out_dtype=None,
                        interpret: Optional[bool] = None) -> jax.Array:
    """act(A @ B + bias) with the epilogue fused into the kernel.

    bias: optional (N,) vector added per output column; activation: one of
    ACTIVATIONS.  Keeps the elementwise tail inside the tuned kernel's
    epilogue instead of a second HBM pass.  Differentiable."""
    if activation is not None and activation not in ACTIVATIONS:
        raise ValueError(f"unknown activation {activation}; "
                         f"choose from {sorted(k for k in ACTIVATIONS if k)}")
    cfg = config or KernelConfig()
    if out_dtype is None:
        out_dtype = a.dtype
    if interpret is None:
        interpret = default_interpret()
    err = cfg.validate(a.dtype, shape=(a.shape[0], b.shape[1], a.shape[1]))
    if err:
        raise ValueError(f"invalid kernel config for dtype {a.dtype}: {err}")
    return _fused_vjp(a, b, bias, cfg, jnp.dtype(out_dtype).name,
                      activation, bool(interpret))


def pallas_matmul_padded(a, b, config: KernelConfig, out_dtype=None,
                         interpret: Optional[bool] = None):
    """Debug/validation entry: return the UNSLICED (padded) output.

    Used by the correctness gate's memory-safety canary (the TPU analogue of
    the reference's 16384-element guard bands around every buffer,
    zero_one_correctness_check.py:98-149): with zero-padded operands the pad
    rows/cols of the output are exactly 0, so any nonzero there — or any
    corruption of the valid region — exposes a mis-tiled index map writing
    where it must not.
    """
    if out_dtype is None:
        out_dtype = a.dtype
    if interpret is None:
        interpret = default_interpret()
    err = config.validate(a.dtype, shape=(a.shape[0], b.shape[1], a.shape[1]))
    if err:
        raise ValueError(f"invalid kernel config for dtype {a.dtype}: {err}")
    out, _ = _forward_padded(a, b, config, jnp.dtype(out_dtype), interpret)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _matmul_vjp(a, b, cfg, out_dtype_name, interpret):
    return _forward(a, b, cfg, jnp.dtype(out_dtype_name), interpret)


def _matmul_fwd(a, b, cfg, out_dtype_name, interpret):
    return _matmul_vjp(a, b, cfg, out_dtype_name, interpret), (a, b)


def _matmul_bwd(cfg, out_dtype_name, interpret, res, g):
    # Backward uses XLA dots (always correct, already MXU-optimal for the
    # transposed layouts); the tuned kernel covers the forward hot path.
    a, b = res
    gf = g.astype(jnp.float32)
    da = jnp.matmul(gf, b.astype(jnp.float32).T).astype(a.dtype)
    db = jnp.matmul(a.astype(jnp.float32).T, gf).astype(b.dtype)
    return da, db


_matmul_vjp.defvjp(_matmul_fwd, _matmul_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _matmul_tn_vjp(a, bt, cfg, out_dtype_name, interpret):
    return _forward_tn(a, bt, cfg, jnp.dtype(out_dtype_name), interpret)


def _forward_tn(a, bt, cfg, out_dtype, interpret):
    """C = A @ BTᵀ with the kernel consuming bt (N, K) directly."""
    out, (m, n) = _forward_padded(a, None, cfg, out_dtype, interpret,
                                  b_t=bt)
    if out.shape != (m, n):
        out = out[:m, :n]
    return out


def _matmul_tn_fwd(a, bt, cfg, out_dtype_name, interpret):
    return _matmul_tn_vjp(a, bt, cfg, out_dtype_name, interpret), (a, bt)


def _matmul_tn_bwd(cfg, out_dtype_name, interpret, res, g):
    a, bt = res
    gf = g.astype(jnp.float32)
    da = jnp.matmul(gf, bt.astype(jnp.float32)).astype(a.dtype)
    dbt = jnp.matmul(gf.T, a.astype(jnp.float32)).astype(bt.dtype)
    return da, dbt


_matmul_tn_vjp.defvjp(_matmul_tn_fwd, _matmul_tn_bwd)


def pallas_matmul_tn(a: jax.Array, b_t: jax.Array,
                     config: Optional[KernelConfig] = None,
                     out_dtype=None,
                     interpret: Optional[bool] = None) -> jax.Array:
    """C = A @ B where the RHS is supplied pre-transposed as b_t (N, K).

    The TN entry of the reference ABI: every harness call materializes both
    B layouts; a tuned config with rhs_layout='nk' consumes this one with
    zero transpose cost.  Differentiable (cotangent returned for b_t)."""
    cfg = config or KernelConfig(rhs_layout="nk")
    if cfg.rhs_layout != "nk":
        import dataclasses as _dc
        cfg = _dc.replace(cfg, rhs_layout="nk")
    if out_dtype is None:
        out_dtype = a.dtype
    if interpret is None:
        interpret = default_interpret()
    err = cfg.validate(a.dtype,
                       shape=(a.shape[0], b_t.shape[0], a.shape[1]))
    if err:
        raise ValueError(f"invalid kernel config for dtype {a.dtype}: {err}")
    return _matmul_tn_vjp(a, b_t, cfg, jnp.dtype(out_dtype).name,
                          bool(interpret))


def pallas_matmul(a: jax.Array, b: jax.Array,
                  config: Optional[KernelConfig] = None,
                  out_dtype=None,
                  interpret: Optional[bool] = None) -> jax.Array:
    """C = A @ B with a tuned Pallas MXU kernel.

    a: (M, K), b: (K, N), any shapes/dtypes XLA can cast to bf16/f32.
    ``config`` selects the tile/grid point (see tpul2.config); callers
    normally go through tpul2.dispatch.matmul which resolves the config
    from the tuning DB.  Differentiable (backward via XLA dots).
    """
    cfg = config or KernelConfig()
    if out_dtype is None:
        out_dtype = a.dtype
    if interpret is None:
        interpret = default_interpret()

    err = cfg.validate(a.dtype, shape=(a.shape[0], b.shape[1], a.shape[1]))
    if err:
        raise ValueError(f"invalid kernel config for dtype {a.dtype}: {err}")

    return _matmul_vjp(a, b, cfg, jnp.dtype(out_dtype).name, bool(interpret))
