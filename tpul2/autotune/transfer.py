"""Neighbor-transfer seeding: reuse tuned configs across similar shapes.

The reference's RL search paid its cost once offline per shape; tpul2's
online campaign cannot afford full candidate enumeration at every
(M, N, K) — a single large-tile Mosaic compile costs 20–60 s.  But tuned
winners are highly regular across a band (e.g. every thin-K streaming shape
wants full-dim K blocks and a wide N tile), so the campaign seeds each new
shape with the winning Pallas configs of its nearest already-tuned
neighbors, adapted to the new problem, and lets them compete against the
XLA-variant sentinels.  Full enumeration remains the fallback when no
neighbor exists (the cost-ascending campaign order tunes the small, cheap
band members first, so seeds flow from cheap shapes to expensive ones).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax.numpy as jnp

from tpul2.config import KernelConfig, assign_vmem_limit


def _adapt(cfg: KernelConfig, src: tuple, dst: tuple,
           in_dtype) -> Optional[KernelConfig]:
    """Re-fit a neighbor's config to the destination shape.

    Full-dim blocks stay full-dim (the property, not the number, is what
    won); oversized blocks clamp to the destination dim; everything else
    carries over.  Returns None if the adapted config is invalid."""
    sm, sn, sk = src
    m, n, k = dst

    def fit(block, src_dim, dst_dim):
        # Full-dim returns (all three branches below) satisfy validate()'s
        # full-dim alignment exception (block == problem dim ⇒ Mosaic lays
        # the dim out in one internally-padded tile); carried blocks keep
        # the source config's alignment, so no explicit rounding is needed
        # here (ADVICE r2 low #3: the former align/sublane parameters were
        # dead weight).
        if block == src_dim or block > dst_dim:
            return dst_dim  # full-dim semantics transfer
        if dst_dim % block:
            # avoid gratuitous padding: snap to full-dim when the carried
            # block doesn't divide the new dim and the dim is small
            if dst_dim <= 2 * block:
                return dst_dim
        return block

    adapted = dataclasses.replace(
        cfg,
        bm=fit(cfg.bm, sm, m),
        bn=fit(cfg.bn, sn, n),
        bk=fit(cfg.bk, sk, k),
        vmem_limit_bytes=None,
    )
    adapted = assign_vmem_limit(adapted, m, n, k, in_dtype)
    if adapted is None:
        return None
    if adapted.validate(in_dtype, shape=(m, n, k)) is not None:
        return None
    return adapted


def neighbor_seed_configs(db, m: int, n: int, k: int,
                          acc: str = "float32",
                          in_dtype=jnp.bfloat16,
                          limit: int = 3,
                          max_ratio: float = 4.0,
                          with_scores: bool = False) -> list:
    """Top adapted Pallas configs from the nearest tuned neighbors.

    Neighbors are DB entries (same acc family) within ``max_ratio`` on
    every dimension, ranked by log-space L1 distance; their non-sentinel
    configs are adapted to (m, n, k), deduplicated, and returned
    best-stored-speedup-first (at most ``limit``).  With ``with_scores``
    each item is (config, src_speedup) — the neighbor's stored
    speedup_vs_xla, the campaign's prior for whether the adapted config is
    worth a compile (run_suite --tune_mode transfer's margin gate)."""
    entries = db.entries_near(m, n, k, acc, in_dtype, max_ratio=max_ratio)
    scored = []
    for (em, en, ek), entry in entries:
        cfg = entry.get("config") or {}
        if cfg.get("use_xla"):
            continue
        ratios = (max(em, m) / min(em, m), max(en, n) / min(en, n),
                  max(ek, k) / min(ek, k))
        if (em, en, ek) == (m, n, k):
            continue
        dist = sum(abs(math.log(r)) for r in ratios)
        scored.append((dist, -entry.get("speedup_vs_xla", 1.0),
                       (em, en, ek), KernelConfig(**cfg)))
    scored.sort(key=lambda t: (t[0], t[1]))

    out, seen = [], set()
    for _, neg_sp, src, cfg in scored:
        adapted = _adapt(cfg, src, (m, n, k), in_dtype)
        if adapted is None or adapted in seen:
            continue
        seen.add(adapted)
        out.append((adapted, -neg_sp) if with_scores else adapted)
        if len(out) >= limit:
            break
    return out
