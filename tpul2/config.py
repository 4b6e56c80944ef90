"""Kernel configuration space for the Pallas MXU matmul generator.

This is the TPU-native replacement for the reference's *searched parameter
space* (SURVEY.md §2/C9): where each CUDA kernel file froze one RL-discovered
choice of block tile BM×BN×BK, pipeline stage count, warp-MMA repeats, launch
bounds, and block-swizzle stride, tpul2 expresses the whole space as ONE
dataclass and lets the autotuner pick a point per (M, N, K, acc) shape.

Mapping of searched dimensions (reference → TPU):
  BM/BN/BK block tile            → bm/bn/bk VMEM block tile
  kStage cp.async pipeline depth → Pallas auto double-buffering over the grid
                                   (+ grid order, which controls operand reuse)
  block swizzle / swizzle_stride → grid_order ('mn' vs 'nm') — which output
                                   dimension iterates outermost on the
                                   (sequential) TPU core
  accumulator precision atom     → acc_dtype (float32 | bfloat16 scratch)
  __launch_bounds__ / smem size  → vmem_limit_bytes compiler param
  caller-side zero padding (C3)  → identical: pad to bm/bn/bk multiples

A config can also be the sentinel ``use_xla=True``: dispatch to XLA's stock
``dot_general``.  That mirrors the reference autotuner's freedom to select
among many algos (cuBLASLt auto-tuning, SURVEY.md C12) — the library never
does worse than the vendor path.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional

import jax.numpy as jnp

from tpul2.utils.padding import LANE, cdiv, min_sublane, round_up

#: Default VMEM budget per kernel (bytes).  TPU cores have ~16 MiB of VMEM;
#: 14 MiB is the empirically calibrated limit on v5e — every probed config
#: whose (conditional) footprint model exceeded it was rejected by the
#: Mosaic compiler, everything at or below compiled (see probe matrix in
#: the round-1 tuning campaign).
DEFAULT_VMEM_BUDGET = 14 * 1024 * 1024

#: Per-copy cap on the A (LHS) block, empirically required by Mosaic on
#: v5e: (bm=512, bk=4096) bf16 = 4 MiB fails even with total footprint in
#: budget; every a-block ≤ 2 MiB compiles.
A_BLOCK_CAP = 2 * 1024 * 1024


@dataclasses.dataclass(frozen=True)
class KernelConfig:
    """One point in the matmul kernel search space."""

    bm: int = 256
    bn: int = 256
    bk: int = 256
    #: Accumulator dtype carried across K grid steps. 'float32' mirrors the
    #: reference F32F16F16F32 family; 'bfloat16' mirrors F16F16F16F16 (and
    #: halves accumulator VMEM, enabling larger tiles).
    acc_dtype: str = "float32"
    #: 'mn': M iterates outermost; 'nm': N outermost.
    grid_order: str = "mn"
    #: Mark the two output grid dims "parallel" (Mosaic may reorder/pipeline
    #: more aggressively) vs "arbitrary".
    parallel_mn: bool = True
    #: RHS layout consumed by the kernel: 'kn' = row-major B (K, N);
    #: 'nk' = transposed B (N, K) — the reference's TN data contract
    #: (every CUDA-L2 kernel receives b_col_major and most consume it,
    #: kernels/a100_F32F16F16F32/4096_4096_4096.cu:292-309).  The harness
    #: provides both layouts; dispatch picks per tuned config.
    rhs_layout: str = "kn"
    #: Optional VMEM cap handed to the Mosaic compiler; None = compiler default.
    vmem_limit_bytes: Optional[int] = None
    #: Sentinel: skip the Pallas kernel, call XLA dot_general.
    use_xla: bool = False

    # ---- serialization (the tuning DB stores these) ----
    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "KernelConfig":
        return KernelConfig(**json.loads(s))

    @staticmethod
    def xla() -> "KernelConfig":
        return KernelConfig(use_xla=True)

    # ---- static validity model ----
    def vmem_bytes(self, in_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16,
                   shape: Optional[tuple] = None) -> int:
        """Static VMEM footprint model, empirically calibrated on v5e.

        The analogue of the reference's ``kShmSize`` shared-memory accounting
        (kernels/*:263-273 set dynamic smem size and fail if over budget) —
        configs whose working set exceeds VMEM must be rejected *before*
        compile, because interpret-mode (CPU) testing won't catch them
        (SURVEY.md §7 hard part (e)).

        Mosaic double-buffers a blocked operand only when its block index
        actually moves across the grid; the K-accumulator scratch exists
        only when the K grid has more than one step.  With ``shape``
        (m, n, k) the model is exact for that problem; without it, the
        worst case (everything double-buffered + accumulator) is assumed.
        """
        in_item = jnp.dtype(in_dtype).itemsize
        out_item = jnp.dtype(out_dtype).itemsize
        acc_item = jnp.dtype(self.acc_dtype).itemsize
        a_blk = self.bm * self.bk * in_item
        b_blk = self.bk * self.bn * in_item
        o_blk = self.bm * self.bn * out_item
        acc = self.bm * self.bn * acc_item
        if shape is None:
            return 2 * (a_blk + b_blk) + 2 * o_blk + acc
        m, n, k = shape
        gm, gn, gk = cdiv(m, self.bm), cdiv(n, self.bn), cdiv(k, self.bk)
        a_mult = 2 if (gm > 1 or gk > 1) else 1   # a index = (i, k)
        b_mult = 2 if (gn > 1 or gk > 1) else 1   # b index = (k, j)
        o_mult = 2 if (gm > 1 or gn > 1) else 1   # o index = (i, j)
        if gk == 1:
            acc = 0
        return a_mult * a_blk + b_mult * b_blk + o_mult * o_blk + acc

    def validate(self, in_dtype=jnp.bfloat16,
                 budget: int = DEFAULT_VMEM_BUDGET,
                 shape: Optional[tuple] = None) -> Optional[str]:
        """Return an error string if the config is invalid, else None."""
        if self.use_xla:
            return None
        sub = min_sublane(in_dtype)
        if self.bm % sub:
            return f"bm={self.bm} not a multiple of sublane {sub}"
        if self.bk % LANE or self.bn % LANE:
            return f"bk/bn ({self.bk},{self.bn}) must be multiples of {LANE}"
        if self.bk % sub:
            return f"bk={self.bk} not a multiple of sublane {sub}"
        if self.acc_dtype not in ("float32", "bfloat16"):
            return f"unsupported acc_dtype {self.acc_dtype}"
        if self.grid_order not in ("mn", "nm"):
            return f"bad grid_order {self.grid_order}"
        if self.rhs_layout not in ("kn", "nk"):
            return f"bad rhs_layout {self.rhs_layout}"
        in_item = jnp.dtype(in_dtype).itemsize
        if self.bm * self.bk * in_item > A_BLOCK_CAP:
            return (f"a-block {self.bm}x{self.bk} exceeds the "
                    f"{A_BLOCK_CAP >> 20} MiB Mosaic block cap")
        if self.vmem_bytes(in_dtype, shape=shape) > budget:
            return (f"vmem footprint {self.vmem_bytes(in_dtype, shape=shape)}"
                    f" exceeds budget {budget}")
        return None

    # ---- derived quantities ----
    def grid_for(self, m: int, n: int, k: int) -> tuple:
        gm, gn, gk = cdiv(m, self.bm), cdiv(n, self.bn), cdiv(k, self.bk)
        return (gm, gn, gk) if self.grid_order == "mn" else (gn, gm, gk)

    def padded_shape(self, m: int, n: int, k: int) -> tuple:
        return (round_up(m, self.bm), round_up(n, self.bn),
                round_up(k, self.bk))

    def padding_waste(self, m: int, n: int, k: int) -> float:
        """Fraction of MXU work wasted on zero padding (autotuner cost prior)."""
        mp, np_, kp = self.padded_shape(m, n, k)
        return 1.0 - (m * n * k) / (mp * np_ * kp)


def heuristic_config(m: int, n: int, k: int,
                     acc_dtype: str = "float32",
                     in_dtype=jnp.bfloat16) -> KernelConfig:
    """Fallback config when a shape has no tuned entry.

    Plays the role of the reference's 'a kernel file must exist for the shape'
    rule (tools/utils.py:50 picks kernels/<dev>_<acc>/<M_N_K>.cu; missing file
    = unsupported).  We instead synthesize a sane tiling for ANY shape:
    keep the MXU fed (blocks ≥128 where the problem allows), bound VMEM,
    and avoid padding waste on skinny dims.
    """
    sub = min_sublane(in_dtype)

    def pick(dim: int, lo: int, choices: tuple) -> int:
        best = lo
        for c in choices:
            if c <= max(round_up(dim, lo), lo):
                best = c
        return best

    # M: pad-to-sublane for skinny-M (LLM serving shapes), cap at 512.
    bm = pick(m, sub, (sub, 32, 64, 128, 256, 512)) if sub == 16 else \
        pick(m, sub, (sub, 16, 32, 64, 128, 256, 512))
    bn = pick(n, LANE, (128, 256, 512))
    bk = pick(k, LANE, (128, 256, 512, 1024))
    cfg = KernelConfig(bm=bm, bn=bn, bk=bk, acc_dtype=acc_dtype)
    # Shrink until within budget (large bm×bn accumulators).
    shape = (m, n, k)
    while cfg.validate(in_dtype, shape=shape) is not None and cfg.bk > LANE:
        cfg = dataclasses.replace(cfg, bk=cfg.bk // 2)
    while cfg.validate(in_dtype, shape=shape) is not None and cfg.bn > LANE:
        cfg = dataclasses.replace(cfg, bn=cfg.bn // 2)
    while cfg.validate(in_dtype, shape=shape) is not None and cfg.bm > sub:
        cfg = dataclasses.replace(cfg, bm=cfg.bm // 2)
    return cfg


def candidate_configs(m: int, n: int, k: int,
                      acc_dtype: str = "float32",
                      in_dtype=jnp.bfloat16,
                      budget: int = DEFAULT_VMEM_BUDGET,
                      max_candidates: int = 64) -> list:
    """Enumerate the autotuner's candidate set for one shape.

    The analogue of cuBLASLt auto-tuning's ``AlgoGetHeuristic`` returning up
    to 100 candidate algos (SURVEY.md §3.5) — except our candidates are
    points in the tile space, pruned by the static VMEM model and a padding-
    waste cap, ordered by a cheap cost prior.
    """
    sub = min_sublane(in_dtype)
    bms = [b for b in (sub, 32, 64, 128, 256, 512, 1024) if b % sub == 0]
    bns = [128, 256, 512, 1024, 2048]
    bks = [128, 256, 512, 1024, 2048, 4096]

    out = []
    for bm in bms:
        if bm > round_up(m, sub) * 2 and bm > sub:
            continue
        for bn in bns:
            if bn > round_up(n, LANE) * 2 and bn > LANE:
                continue
            for bk in bks:
                if bk > round_up(k, LANE) * 2 and bk > LANE:
                    continue
                for order in ("mn", "nm"):
                    for rhs in ("kn", "nk"):
                        cfg = KernelConfig(bm=bm, bn=bn, bk=bk,
                                           acc_dtype=acc_dtype,
                                           grid_order=order,
                                           rhs_layout=rhs)
                        if cfg.validate(in_dtype, budget,
                                        shape=(m, n, k)) is not None:
                            continue
                        if cfg.padding_waste(m, n, k) > 0.6:
                            continue
                        out.append(cfg)

    def prior(c: KernelConfig) -> float:
        # Prefer low padding waste, then larger blocks (fewer grid steps,
        # better MXU occupancy), then 'mn' order.
        steps = (cdiv(m, c.bm) * cdiv(n, c.bn) * cdiv(k, c.bk))
        return (c.padding_waste(m, n, k), steps, 0 if c.grid_order == "mn" else 1)

    out.sort(key=prior)
    out = out[:max_candidates]
    out.append(KernelConfig.xla())  # vendor path is always a candidate
    return out
