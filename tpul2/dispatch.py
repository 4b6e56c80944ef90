"""Shape-dispatched matmul entry point.

Replaces the reference's static build-time dispatch (SURVEY.md L2/L3: the
shape is baked in by choosing which .cu file to compile, tools/utils.py:50,
and pybind/*.cc exposes one ``cuda_l2_<dev>_<acc>`` symbol per build).  On
TPU the equivalent decision — which kernel configuration serves this
(M, N, K, acc) — happens at trace time: tuned config from the tuning DB,
else heuristic, else XLA's stock dot_general.

``matmul`` is the drop-in public API; ``cuda_l2_tpu_f32`` / ``cuda_l2_tpu_bf16``
mirror the reference's exported symbol names and ABI
(pybind/hgemm_a100_fp32.cc:27 exports cuda_l2_a100_fp32(a, b, b_col_major, c))
so the benchmark/correctness harnesses can treat candidate and baselines
uniformly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tpul2.config import KernelConfig, heuristic_config
from tpul2.ops.matmul import pallas_matmul


def resolve_config(m: int, n: int, k: int, acc: str = "float32",
                   in_dtype=jnp.bfloat16,
                   mode: str = "offline") -> KernelConfig:
    """Tuning-DB lookup → neighbor transfer → heuristic (never fails).

    Exact-key hits are served by the native C++ cache first
    (TuneDB.native_get — the reference's compiled dispatch layer role,
    pybind/hgemm_a100_fp32.cc:29-52), falling back to the JSON entries.

    ``mode='server'`` prefers a shape's server-regime winner (the
    ``server`` sub-entry written by the server campaign's heal loop) —
    offline winners demonstrably do not always transfer to the
    Poisson-arrival regime (VERDICT r3 weak #3).

    The neighbor-transfer middle step has no reference counterpart (a
    missing .cu file there means no kernel at all): an untuned shape
    inherits the adapted config of its nearest tuned neighbor — a Pallas
    winner only when it won by a real margin (>=5%), the neighbor's
    sentinel variant otherwise — so tuned performance generalizes
    off-grid.  Distant shapes (beyond 2x on any dim) use the static
    heuristic as before."""
    from tpul2.autotune.db import default_db
    db = default_db()
    if mode == "server":
        sub = db.get_server_entry(m, n, k, acc, in_dtype)
        if sub is not None:
            return KernelConfig(**sub["config"])
    cfg = db.get(m, n, k, acc, in_dtype)
    if cfg is not None:
        return cfg
    cfg = _neighbor_config(db, m, n, k, acc, in_dtype)
    if cfg is not None:
        return cfg
    return heuristic_config(m, n, k, acc, in_dtype)


def _neighbor_config(db, m, n, k, acc, in_dtype,
                     max_ratio: float = 2.0,
                     min_speedup: float = 1.05) -> Optional[KernelConfig]:
    """Nearest tuned neighbor's config, adapted to (m, n, k), or None.

    Neighbor candidates come from the DB's octave-bucket index
    (TuneDB.entries_near — O(bucket occupancy) per trace, flat as the DB
    grows to full-grid size; VERDICT r2 weak #6 replaced the per-trace
    linear scan of the whole family)."""
    import math

    best = None
    for (em, en, ek), entry in db.entries_near(m, n, k, acc, in_dtype,
                                               max_ratio=max_ratio):
        ratios = (max(em, m) / min(em, m), max(en, n) / min(en, n),
                  max(ek, k) / min(ek, k))
        dist = sum(abs(math.log(r)) for r in ratios)
        # statically seeded entries (measured=False) carry no measurement;
        # rank every measured neighbor ahead of them so a static sentinel
        # on the grid can't shadow a nearby measured winner
        rank = (not entry.get("measured", True), dist)
        if best is None or rank < best[0]:
            best = (rank, (em, en, ek), entry)
    if best is None:
        return None
    _, src, entry = best
    cfg = KernelConfig(**entry["config"])
    if cfg.use_xla:
        return cfg
    if entry.get("speedup_vs_xla", 1.0) < min_speedup:
        # the neighbor's Pallas win was within noise — parity is better
        # served by the sentinel than by an unproven adapted tiling
        return KernelConfig.xla(entry.get("config", {}).get(
            "xla_variant") or "matmul")
    from tpul2.autotune.transfer import _adapt
    adapted = _adapt(cfg, src, (m, n, k), in_dtype)
    if adapted is not None and adapted.vmem_limit_bytes is None:
        return adapted
    # An UNMEASURED dispatch-time transfer must stay inside the default
    # Mosaic regime: a raised-VMEM adapted tiling (e.g. a small neighbor's
    # full-dim block scaled onto a giant dim -> one enormous unpipelined
    # tile) is exactly the extrapolation the heal loop never validated —
    # the server-mode catastrophes (0.37x at 4096x8192x64/bf16) came from
    # this path.  Campaign-time seeding (neighbor_seed_configs) keeps the
    # full range because every adopted config is measured and healed.
    return KernelConfig.xla(entry.get("config", {}).get("xla_variant")
                            or "matmul")


def matmul(a: jax.Array, b: jax.Array, *,
           acc: str = "float32",
           out_dtype=None,
           config: Optional[KernelConfig] = None,
           interpret: Optional[bool] = None,
           bias: Optional[jax.Array] = None,
           activation: Optional[str] = None,
           b_t: Optional[jax.Array] = None,
           mode: str = "offline") -> jax.Array:
    """Tuned C = act(A @ B + bias).  a: (M, K), b: (K, N), bias: (N,)|None.

    acc: 'float32' (reference F32F16F16F32 family) or 'bfloat16'
    (F16F16F16F16 family).  config overrides the DB/heuristic choice;
    bias/activation fuse into the kernel epilogue.  b_t: optional
    pre-transposed (N, K) RHS — consumed for free when the tuned config's
    rhs_layout is 'nk' (the reference's b_col_major argument).
    mode: 'offline' | 'server' — which measurement regime's tuned winner
    to dispatch (server winners live in per-shape ``server`` sub-entries).
    """
    if a.ndim != 2 or b.ndim != 2 or a.shape[1] != b.shape[0]:
        raise ValueError(
            f"matmul shape mismatch: {a.shape} @ {b.shape} (expected "
            f"(M, K) @ (K, N))")
    m, k = a.shape
    n = b.shape[1]
    if config is None:
        config = resolve_config(m, n, k, acc, a.dtype, mode=mode)
        # out_dtype feasibility guard (never-fail): the DB winner was
        # tuned at out_dtype=in_dtype; a wider requested output can push
        # its output block past physical VMEM (config.serves_out_dtype).
        # Serve such requests through the sentinel instead of surfacing a
        # Mosaic compile error.  Only resolution-provided configs are
        # guarded — an explicit ``config=`` is the caller's choice.
        if not config.serves_out_dtype(m, n, k, a.dtype,
                                       out_dtype or a.dtype):
            config = KernelConfig.xla(config.xla_variant or "matmul")
    if config.use_xla:
        # Sentinel: the tuned XLA formulation (config.XLA_VARIANTS).  TN
        # variants consume b_t for free when the caller supplies it (the
        # reference's b_col_major contract); otherwise the swapaxes below
        # is canonicalized by XLA into the dot's dimension numbers.
        from tpul2.ops.baselines import XLA_VARIANT_FNS
        variant = XLA_VARIANT_FNS[config.xla_variant]
        bt = (b_t if b_t is not None else jnp.swapaxes(b, 0, 1)) \
            if config.xla_variant.endswith("_tn") else None
        out = variant(a, b, bt)
        if bias is not None or activation is not None:
            # epilogue in f32 (mirrors the Pallas kernels' f32 epilogue);
            # the bare product keeps the variant's own dtype so a sameacc
            # sentinel stays a single fused dot
            out = out.astype(jnp.float32)
            if bias is not None:
                out = out + bias.astype(jnp.float32)
            from tpul2.ops.matmul import ACTIVATIONS
            out = ACTIVATIONS[activation](out)
        return out.astype(out_dtype or a.dtype)
    if bias is None and activation is None:
        if (config.pipeline_depth >= 2
                and m % config.bm == 0 and n % config.bn == 0
                and k % config.bk == 0):
            # manually staged K pipeline (the kStage axis, ops/pipelined.py)
            from tpul2.ops.pipelined import pallas_matmul_pipelined
            rhs = ((b_t if b_t is not None else jnp.swapaxes(b, 0, 1))
                   if config.rhs_layout == "nk" else b)
            return pallas_matmul_pipelined(a, rhs, config=config,
                                           out_dtype=out_dtype,
                                           interpret=interpret)
        if config.pipeline_depth >= 2:
            import dataclasses as _dc
            config = _dc.replace(config, pipeline_depth=0)
        if config.rhs_layout == "nk":
            from tpul2.ops.matmul import pallas_matmul_tn
            bt = b_t if b_t is not None else jnp.swapaxes(b, 0, 1)
            return pallas_matmul_tn(a, bt, config=config,
                                    out_dtype=out_dtype,
                                    interpret=interpret)
        return pallas_matmul(a, b, config=config, out_dtype=out_dtype,
                             interpret=interpret)
    from tpul2.ops.matmul import pallas_matmul_fused
    return pallas_matmul_fused(a, b, bias=bias, activation=activation,
                               config=config, out_dtype=out_dtype,
                               interpret=interpret)


def batched_matmul(a: jax.Array, b: jax.Array, *,
                   acc: str = "float32",
                   out_dtype=None,
                   config: Optional[KernelConfig] = None,
                   interpret: Optional[bool] = None) -> jax.Array:
    """Tuned C[t] = A[t] @ B[t].  a: (B, M, K), b: (B, K, N).

    Per-shape config resolution keys on (M, N, K) — the batch axis reuses
    the 2D tiling."""
    from tpul2.ops.batched import pallas_batched_matmul
    if (a.ndim != 3 or b.ndim != 3 or a.shape[0] != b.shape[0]
            or a.shape[2] != b.shape[1]):
        raise ValueError(
            f"batched_matmul shape mismatch: {a.shape} @ {b.shape} "
            f"(expected (B, M, K) @ (B, K, N))")
    _, m, k = a.shape
    n = b.shape[2]
    if config is None:
        config = resolve_config(m, n, k, acc, a.dtype)
    if config.use_xla:
        out = jnp.matmul(a, b, preferred_element_type=jnp.float32)
        return out.astype(out_dtype or a.dtype)
    return pallas_batched_matmul(a, b, config=config, out_dtype=out_dtype,
                                 interpret=interpret)


class _Candidate:
    """Jitted candidate entry with a TuneDB epoch guard.

    Jitted end-to-end: config resolution happens once per shape at trace
    time (the analogue of the reference's build-time source selection), so
    the steady-state call is a single compiled dispatch like the baselines.
    Both RHS layouts arrive (the reference passes b AND b_col_major); the
    tuned config decides which one the kernel consumes.

    The epoch guard (VERDICT r3 next-round #9): trace-time resolution
    means a jit cache built before a tuning run would dispatch stale
    configs forever.  Each call compares the default TuneDB's mutation
    epoch against the one this wrapper last traced under and drops the
    jit cache on mismatch — so ``tune_shape(...); cuda_l2_tpu_f32(...)``
    sees the new winner without a manual ``refresh_candidates()``.  The
    check is one attribute read per *Python-level* call (traced calls
    inline the already-resolved kernel and skip it, like any closed-over
    constant)."""

    def __init__(self, acc: str, mode: str = "offline"):
        self.acc, self.mode = acc, mode
        self._epoch = None

        def _impl(a, b, b_t):
            return matmul(a, b, acc=acc, b_t=b_t, mode=mode)
        _impl.__name__ = f"cuda_l2_tpu_{acc}_{mode}"
        self._jit = jax.jit(_impl)
        self.__name__ = _impl.__name__

    def __call__(self, a, b, b_t):
        from tpul2.autotune.db import default_db
        epoch = default_db().epoch
        if self._epoch != epoch:
            self._jit.clear_cache()
            self._epoch = epoch
        return self._jit(a, b, b_t)

    def clear_cache(self) -> None:
        self._jit.clear_cache()
        self._epoch = None


#: Candidate entries, f32/bf16-accumulator families (harness ABI:
#: (a, b, b_t) — SURVEY.md C13's cuda_l2_<dev>_<acc> symbols).
cuda_l2_tpu_f32 = _Candidate("float32")
cuda_l2_tpu_bf16 = _Candidate("bfloat16")
#: Server-regime twins: dispatch prefers each shape's server sub-entry
#: (resolve_config(mode='server')); the server harness measures THESE.
cuda_l2_tpu_f32_server = _Candidate("float32", "server")
cuda_l2_tpu_bf16_server = _Candidate("bfloat16", "server")

_CANDIDATES = {
    ("float32", "offline"): cuda_l2_tpu_f32,
    ("bfloat16", "offline"): cuda_l2_tpu_bf16,
    ("float32", "server"): cuda_l2_tpu_f32_server,
    ("bfloat16", "server"): cuda_l2_tpu_bf16_server,
}


def candidate_fn(acc: str = "float32", mode: str = "offline"):
    return _CANDIDATES[(acc, mode)]


def refresh_candidates() -> None:
    """Drop the candidates' jit caches so updated TuneDB entries take effect
    immediately (the epoch guard also does this lazily on the next call)."""
    for c in _CANDIDATES.values():
        c.clear_cache()
