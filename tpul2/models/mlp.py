"""Flagship GEMM consumer: a transformer FFN block on tpul2 matmuls.

The reference ships no model code (SURVEY.md §0: 'no model code') — its
kernels exist to serve LLM GEMM shapes.  This module is the demonstration
consumer: a Megatron-style FFN (x @ W1 -> gelu -> @ W2) whose two matmuls go
through the tuned tpul2 dispatch, with a training step that shards over a
(dp, tp) mesh — W1 column-sharded and W2 row-sharded on 'tp' (one psum per
block), batch sharded on 'dp' (gradient psum) — the standard tensor-parallel
recipe, expressed with shard_map + XLA collectives over ICI.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpul2.config import KernelConfig
from tpul2.dispatch import matmul


class FFNParams(NamedTuple):
    w1: jax.Array  # (d_model, d_ff)
    w2: jax.Array  # (d_ff, d_model)


def init_ffn(key, d_model: int, d_ff: int, dtype=jnp.bfloat16) -> FFNParams:
    k1, k2 = jax.random.split(key)
    scale1 = (2.0 / d_model) ** 0.5
    scale2 = (2.0 / d_ff) ** 0.5
    return FFNParams(
        w1=(jax.random.normal(k1, (d_model, d_ff), jnp.float32)
            * scale1).astype(dtype),
        w2=(jax.random.normal(k2, (d_ff, d_model), jnp.float32)
            * scale2).astype(dtype),
    )


def ffn_forward(params: FFNParams, x: jax.Array,
                config: Optional[KernelConfig] = None,
                acc: str = "float32") -> jax.Array:
    """y = gelu(x @ W1) @ W2, both matmuls through tpul2 dispatch."""
    h = matmul(x, params.w1, acc=acc, config=config, out_dtype=jnp.float32)
    h = jax.nn.gelu(h).astype(x.dtype)
    return matmul(h, params.w2, acc=acc, config=config)


def loss_fn(params: FFNParams, x, y, **kw):
    pred = ffn_forward(params, x, **kw).astype(jnp.float32)
    return jnp.mean((pred - y.astype(jnp.float32)) ** 2)


def train_step(params: FFNParams, x, y, lr: float = 1e-3, **kw):
    """One SGD step. Single-device (or per-shard under shard_map)."""
    loss, grads = jax.value_and_grad(loss_fn)(params, x, y, **kw)
    new = jax.tree.map(
        lambda p, g: (p.astype(jnp.float32)
                      - lr * g.astype(jnp.float32)).astype(p.dtype),
        params, grads)
    return new, loss


def make_sharded_train_step(mesh: Mesh, lr: float = 1e-3,
                            config: Optional[KernelConfig] = None,
                            acc: str = "float32"):
    """Tensor+data-parallel train step over a ('dp','tp') mesh.

    Sharding layout (Megatron FFN):
      x  : (B, d_model)   -> P('dp', None)     batch over dp
      W1 : (d_model, d_ff)-> P(None, 'tp')     column-parallel
      W2 : (d_ff, d_model)-> P('tp', None)     row-parallel
      y  : (B, d_model)   -> P('dp', None)

    Inside each shard: local tpul2 GEMMs; one psum('tp') to reduce the
    row-parallel output, one psum('dp') to average gradients.  Returns
    (step_fn, shard_fn) where shard_fn places a (params, x, y) pytree.
    """

    def local_forward(w1, w2, x):
        h = matmul(x, w1, acc=acc, config=config, out_dtype=jnp.float32)
        h = jax.nn.gelu(h).astype(x.dtype)
        out = matmul(h, w2, acc=acc, config=config, out_dtype=jnp.float32)
        return jax.lax.psum(out, "tp")

    def local_loss(w1, w2, x, y):
        pred = local_forward(w1, w2, x)
        return jnp.mean((pred - y.astype(jnp.float32)) ** 2)

    def local_step(w1, w2, x, y):
        loss, grads = jax.value_and_grad(local_loss, argnums=(0, 1))(
            w1, w2, x, y)
        # dp-average: batch is sharded over 'dp', grads must be reduced.
        g1, g2 = (jax.lax.pmean(g, "dp") for g in grads)
        loss = jax.lax.pmean(loss, "dp")
        w1 = (w1.astype(jnp.float32) - lr * g1).astype(w1.dtype)
        w2 = (w2.astype(jnp.float32) - lr * g2).astype(w2.dtype)
        return w1, w2, loss

    step = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(None, "tp"), P("tp", None), P("dp", None), P("dp", None)),
        out_specs=(P(None, "tp"), P("tp", None), P()),
        check_vma=False,
    )
    jit_step = jax.jit(step)

    def shard_fn(params: FFNParams, x, y):
        w1 = jax.device_put(params.w1, NamedSharding(mesh, P(None, "tp")))
        w2 = jax.device_put(params.w2, NamedSharding(mesh, P("tp", None)))
        xs = jax.device_put(x, NamedSharding(mesh, P("dp", None)))
        ys = jax.device_put(y, NamedSharding(mesh, P("dp", None)))
        return w1, w2, xs, ys

    return jit_step, shard_fn
