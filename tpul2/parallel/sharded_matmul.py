"""Sharded matmul over a device mesh — tpul2 kernels under shard_map.

TPU-idiomatic scale-out for the GEMM library: partition the (M, N, K)
problem over mesh axes, run the tuned single-core Pallas kernel on each
local shard, and let XLA collectives (psum over ICI) stitch contractions.
This subsystem has NO reference counterpart (SURVEY.md §2: 'Parallelism
strategies: NONE in the reference') — it is the TPU-native extension that
makes the library usable from sharded training/serving code.

Strategies (names follow the standard taxonomy):
  dp_matmul          M (rows of A) sharded — pure data parallel, no comms.
  tp_matmul          N (cols of B) sharded — tensor parallel, no comms;
                     output column-sharded.
  kshard_matmul      K sharded — each device holds A[:, k_shard] and
                     B[k_shard, :], computes a partial product, psum over
                     the axis (the allreduce pattern of Megatron row-
                     parallel layers).
  sharded_matmul_2d  M over 'dp' and K over 'tp' simultaneously.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tpul2.config import KernelConfig
from tpul2.dispatch import matmul


def _local_mm(a, b, acc, config):
    return matmul(a, b, acc=acc, config=config)


def dp_matmul(a, b, mesh: Mesh, axis: str = "dp",
              acc: str = "float32",
              config: Optional[KernelConfig] = None):
    """A row-sharded over ``axis``; B replicated. Out row-sharded. No comms."""
    fn = shard_map(
        functools.partial(_local_mm, acc=acc, config=config),
        mesh=mesh,
        in_specs=(P(axis, None), P(None, None)),
        out_specs=P(axis, None),
        check_vma=False,
    )
    return fn(a, b)


def tp_matmul(a, b, mesh: Mesh, axis: str = "tp",
              acc: str = "float32",
              config: Optional[KernelConfig] = None):
    """B column-sharded over ``axis``; A replicated. Out col-sharded."""
    fn = shard_map(
        functools.partial(_local_mm, acc=acc, config=config),
        mesh=mesh,
        in_specs=(P(None, None), P(None, axis)),
        out_specs=P(None, axis),
        check_vma=False,
    )
    return fn(a, b)


def kshard_matmul(a, b, mesh: Mesh, axis: str = "tp",
                  acc: str = "float32",
                  config: Optional[KernelConfig] = None):
    """K (contraction) sharded: local partial GEMM + psum over ICI.

    a: (M, K) sharded on dim 1; b: (K, N) sharded on dim 0; out replicated
    over ``axis``.  The collective is XLA's allreduce — never a hand-rolled
    NCCL analogue (scaling-book idiom)."""
    def local(a_blk, b_blk):
        part = matmul(a_blk, b_blk, acc=acc, config=config,
                      out_dtype=jnp.float32)
        return jax.lax.psum(part, axis).astype(a_blk.dtype)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis), P(axis, None)),
        out_specs=P(None, None),
        check_vma=False,
    )
    return fn(a, b)


def kshard_scatter_matmul(a, b, mesh: Mesh, axis: str = "tp",
                          acc: str = "float32",
                          config: Optional[KernelConfig] = None):
    """K sharded with a reduce_scatter epilogue: local partial GEMM, then
    ``psum_scatter`` over ``axis`` so the output lands N-sharded.

    The Megatron row-parallel output pattern: when the next layer consumes
    a column-sharded activation anyway, reduce_scatter moves 1/axis_size
    the bytes of kshard_matmul's allreduce over ICI (allreduce =
    reduce_scatter + all_gather; this keeps only the half the consumer
    needs).  a: (M, K) sharded on dim 1; b: (K, N) sharded on dim 0;
    out: (M, N) sharded on dim 1."""
    def local(a_blk, b_blk):
        part = matmul(a_blk, b_blk, acc=acc, config=config,
                      out_dtype=jnp.float32)
        out = jax.lax.psum_scatter(part, axis, scatter_dimension=1,
                                   tiled=True)
        return out.astype(a_blk.dtype)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis), P(axis, None)),
        out_specs=P(None, axis),
        check_vma=False,
    )
    return fn(a, b)


def sharded_matmul_2d(a, b, mesh: Mesh,
                      m_axis: str = "dp", k_axis: str = "tp",
                      acc: str = "float32",
                      config: Optional[KernelConfig] = None):
    """M over ``m_axis`` AND K over ``k_axis``: local GEMM on an
    (M/dp, K/tp) × (K/tp, N) shard pair, psum over ``k_axis``."""
    def local(a_blk, b_blk):
        part = matmul(a_blk, b_blk, acc=acc, config=config,
                      out_dtype=jnp.float32)
        return jax.lax.psum(part, k_axis).astype(a_blk.dtype)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(m_axis, k_axis), P(k_axis, None)),
        out_specs=P(m_axis, None),
        check_vma=False,
    )
    return fn(a, b)


def shard_array(x, mesh: Mesh, spec: P):
    """Place ``x`` on the mesh with the given PartitionSpec."""
    return jax.device_put(x, NamedSharding(mesh, spec))
