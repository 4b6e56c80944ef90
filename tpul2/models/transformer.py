"""Transformer block on tpul2 ops — the GEMM-heavy flagship consumer.

The reference ships no model code (SURVEY.md §0); its kernel zoo exists to
serve exactly these GEMMs (LLM projection/FFN shapes dominate its evaluation
grid).  This module closes the loop: a pre-norm multi-head-attention +
FFN block whose every matmul dispatches through the tuned tpul2 kernels —
QKV/out projections and the FFN through ``tpul2.matmul`` (bias+activation
fused in the kernel epilogue), attention scores and mixing through
``tpul2.batched_matmul``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpul2.config import KernelConfig
from tpul2.dispatch import batched_matmul, matmul


class BlockParams(NamedTuple):
    wqkv: jax.Array    # (d_model, 3*d_model)
    bqkv: jax.Array    # (3*d_model,)
    wo: jax.Array      # (d_model, d_model)
    bo: jax.Array      # (d_model,)
    w1: jax.Array      # (d_model, d_ff)
    b1: jax.Array      # (d_ff,)
    w2: jax.Array      # (d_ff, d_model)
    b2: jax.Array      # (d_model,)
    ln1_scale: jax.Array  # (d_model,)
    ln2_scale: jax.Array  # (d_model,)


def init_block(key, d_model: int, d_ff: int,
               dtype=jnp.bfloat16) -> BlockParams:
    ks = jax.random.split(key, 4)

    def w(key, fan_in, shape):
        return (jax.random.normal(key, shape, jnp.float32)
                * (2.0 / fan_in) ** 0.5).astype(dtype)

    return BlockParams(
        wqkv=w(ks[0], d_model, (d_model, 3 * d_model)),
        bqkv=jnp.zeros((3 * d_model,), jnp.float32),
        wo=w(ks[1], d_model, (d_model, d_model)),
        bo=jnp.zeros((d_model,), jnp.float32),
        w1=w(ks[2], d_model, (d_model, d_ff)),
        b1=jnp.zeros((d_ff,), jnp.float32),
        w2=w(ks[3], d_ff, (d_ff, d_model)),
        b2=jnp.zeros((d_model,), jnp.float32),
        ln1_scale=jnp.ones((d_model,), jnp.float32),
        ln2_scale=jnp.ones((d_model,), jnp.float32),
    )


def _rmsnorm(x, scale):
    xf = x.astype(jnp.float32)
    rms = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + 1e-6)
    return (xf * rms * scale).astype(x.dtype)


def block_forward(params: BlockParams, x: jax.Array,
                  n_heads: int,
                  config: Optional[KernelConfig] = None,
                  causal: bool = True) -> jax.Array:
    """x: (seq, d_model) -> (seq, d_model).  Pre-norm MHA + FFN block."""
    s, d = x.shape
    hd = d // n_heads
    assert hd * n_heads == d, "d_model must divide n_heads"

    # --- attention ---
    h = _rmsnorm(x, params.ln1_scale)
    qkv = matmul(h, params.wqkv, bias=params.bqkv, config=config)  # (s, 3d)
    q, k_, v = jnp.split(qkv, 3, axis=1)

    def heads(t):  # (s, d) -> (n_heads, s, hd)
        return jnp.transpose(t.reshape(s, n_heads, hd), (1, 0, 2))

    q, k_, v = heads(q), heads(k_), heads(v)
    scores = batched_matmul(q, jnp.swapaxes(k_, 1, 2), config=config,
                            out_dtype=jnp.float32)  # (h, s, s)
    scores = scores / (hd ** 0.5)
    if causal:
        mask = jnp.tril(jnp.ones((s, s), bool))
        scores = jnp.where(mask[None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = batched_matmul(probs, v, config=config)  # (h, s, hd)
    ctx = jnp.transpose(ctx, (1, 0, 2)).reshape(s, d)
    attn_out = matmul(ctx, params.wo, bias=params.bo, config=config)
    x = x + attn_out

    # --- FFN (bias + gelu fused into the first GEMM's epilogue) ---
    h = _rmsnorm(x, params.ln2_scale)
    h = matmul(h, params.w1, bias=params.b1, activation="gelu",
               config=config)
    h = matmul(h, params.w2, bias=params.b2, config=config)
    return x + h


def block_loss(params: BlockParams, x, y, n_heads: int,
               config: Optional[KernelConfig] = None):
    pred = block_forward(params, x, n_heads, config=config)
    return jnp.mean((pred.astype(jnp.float32) - y.astype(jnp.float32)) ** 2)


def block_train_step(params: BlockParams, x, y, n_heads: int,
                     lr: float = 1e-3,
                     config: Optional[KernelConfig] = None):
    loss, grads = jax.value_and_grad(block_loss)(params, x, y, n_heads,
                                                 config=config)
    new = jax.tree.map(
        lambda p, g: (p.astype(jnp.float32)
                      - lr * g.astype(jnp.float32)).astype(p.dtype),
        params, grads)
    return new, loss
