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

#: VMEM budget per kernel (bytes) in the DEFAULT compiler regime
#: (``vmem_limit_bytes=None``).  Round-1 calibration on v5e: every config
#: whose (conditional) footprint model exceeded 14 MiB was rejected by the
#: Mosaic compiler at its default limit, everything at or below compiled.
DEFAULT_VMEM_BUDGET = 14 * 1024 * 1024

#: Round-2 discovery: the 14 MiB ceiling is Mosaic's DEFAULT limit, not the
#: hardware (v5e has 128 MiB VMEM per core).  Passing a raised
#: ``vmem_limit_bytes`` unlocks it — probed on the real chip: model
#: footprints of 16/24/32 MiB (and 8 MiB single A-blocks) all compile AND
#: produce bit-exact results with limits of 32–110 MiB.  This is the cap we
#: will request (leaves headroom below physical VMEM for Mosaic's own use).
VMEM_LIMIT_CAP = 112 * 1024 * 1024

#: Model-footprint fraction of a requested vmem_limit we allow — covers the
#: gap between our accounting and Mosaic's real allocation (alignment,
#: semaphores, epilogue staging).  Configs beyond it are screened out at
#: compile time anyway; this just avoids wasted compile attempts.
VMEM_MODEL_HEADROOM = 0.75

#: Per-copy cap on the A (LHS) block in the DEFAULT regime, empirically
#: required by Mosaic on v5e at its default vmem limit: (bm=512, bk=4096)
#: bf16 = 4 MiB fails even with total footprint in budget.  With a raised
#: ``vmem_limit_bytes`` the cap vanishes (probed: an 8 MiB A-block runs
#: bit-exact at limit=100 MiB).
A_BLOCK_CAP = 2 * 1024 * 1024

#: Minimum vmem_limit_bytes we request whenever a config needs one (the
#: probed-safe floor; also applied when only the A-block cap is exceeded).
VMEM_LIMIT_FLOOR = 32 * 1024 * 1024

#: XLA sentinel formulations, ordered by native flag id (tpul2/native
#: encodes the variant in TL2Config.flags bits 3-5 + bit 10; id 0 =
#: 'matmul' keeps round-1 sidecars decoding unchanged).  Implementations
#: live in tpul2.ops.baselines.XLA_VARIANT_FNS.  The 'nolhs_*' pair
#: (round 4, VERDICT r3 next-round #7) are compiler-flag variants: the
#: plain f32-acc dot compiled with the latency-hiding scheduler disabled —
#: measured the one consistently winning flag set on v5e
#: (eval_results/probe_xla_flags_r4.jsonl).
#: The round-5 'scavenge_*' pair enables XLA's VMEM scavenging for fusions
#: — measured +6.0% on 8192^3 and >= 0.992 everywhere probed
#: (eval_results/probe_xla_flags_r5.jsonl).  New names append (the native
#: cache encodes the variant as its index here; ids must never reorder).
XLA_VARIANTS = ("matmul", "dot_nn", "dot_tn", "highest_nn", "highest_tn",
                "sameacc_nn", "sameacc_tn", "nolhs_nn", "nolhs_tn",
                "scavenge_nn", "scavenge_tn")

#: Sentinel variants competing in each accumulator family.  The float32
#: family (reference F32F16F16F32: C accumulated AND delivered in f32) may
#: only dispatch formulations that produce the f32-accumulated product —
#: a sameacc dot emits a bf16 result, so a public
#: ``matmul(acc="float32", out_dtype=jnp.float32)`` through it would return
#: values rounded through bf16, violating the family contract (ADVICE r2
#: medium #1).  The 0/1 exactness screen cannot carry this restriction by
#: itself: with sums kept ≤256 every bf16 partial is an exact integer, so
#: the screen is vacuous there; the variant set is the enforcement, the
#: screen (now acc-based, sums up to 2^24 for f32) is defense in depth.
#: The bfloat16 family (F16F16F16F16 analogue) admits every formulation.
XLA_VARIANTS_FOR_ACC = {
    "float32": ("matmul", "dot_nn", "dot_tn", "highest_nn", "highest_tn",
                "nolhs_nn", "nolhs_tn", "scavenge_nn", "scavenge_tn"),
    "bfloat16": XLA_VARIANTS,
}

#: Candidate-space revision, stamped into TuneDB entries (with the timing
#: revision) so campaigns can re-tune entries produced by an older, narrower
#: space.  1 = round-1 tile space; 2 = VMEM-lift + full-dim blocks;
#: 3 = XLA-variant sentinels.  The round-3 masked-edge axis does NOT bump
#: the revision: on block-dividing (grid) shapes mask ≡ pad, so existing
#: entries are not stale — the axis only widens the space for unaligned
#: off-grid shapes.  The round-4 'nolhs_*' flag variants do not bump it
#: either: they compete in every eval through the widened AutoTuned
#: variant set, and the never-lose heal loop adopts them wherever a stored
#: winner measurably loses to them — a mass re-tune would redo that work
#: at ~100x the compile cost.
SPACE_REV = 3


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
    #: Edge handling for problem dims the blocks don't divide:
    #: 'pad'  — caller-side zero-pad copy + output slice (the reference's
    #:          design choice, SURVEY.md C3: tools/utils.py pads to tile
    #:          multiples before launch);
    #: 'mask' — in-kernel predication (round 3): the grid is cdiv-sized,
    #:          out-of-bounds output stores are dropped by Pallas block
    #:          masking, and the K-tail of the last k step is zeroed
    #:          in-kernel — no HBM padding round trip on A/B and no output
    #:          slice copy, without forcing full-dim blocks on unaligned
    #:          dims (VERDICT r2 next-round #3a).
    edge: str = "pad"
    #: Manual HBM→VMEM pipeline stage count (the reference's kStage axis,
    #: kernels/*:88-141).  0 = Mosaic's automatic grid pipelining (fixed
    #: lookahead 2, the default); >= 2 = the manually staged in-kernel K
    #: loop (ops/pipelined.py) with this circular-buffer depth.
    pipeline_depth: int = 0
    #: Optional VMEM cap handed to the Mosaic compiler; None = compiler default.
    vmem_limit_bytes: Optional[int] = None
    #: Sentinel: skip the Pallas kernel, call XLA dot_general.
    use_xla: bool = False
    #: Which XLA formulation the sentinel dispatches to.  The reference's
    #: cuBLASLt auto-tuning baseline picks among ≤100 vendor algos
    #: (SURVEY.md §3.5); the tuner must compete on the same footing, so the
    #: sentinel is not just jnp.matmul — any formulation in
    #: tpul2.ops.baselines.XLA_VARIANT_FNS can be the stored winner
    #: (dot layout, precision flag, accumulator handling).  Only meaningful
    #: with use_xla=True; 'matmul' preserves round-1 DB semantics.
    xla_variant: str = "matmul"

    # ---- serialization (the tuning DB stores these) ----
    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "KernelConfig":
        return KernelConfig(**json.loads(s))

    @staticmethod
    def xla(variant: str = "matmul") -> "KernelConfig":
        return KernelConfig(use_xla=True, xla_variant=variant)

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

        def phys(rows, cols, dtype, item):
            # A VMEM tile is physically (sublane x LANE)-aligned: a block
            # narrower than one lane group (e.g. bk = k = 64) still
            # occupies full 128-lane rows on chip.
            return (round_up(rows, min_sublane(dtype))
                    * round_up(cols, LANE) * item)

        a_blk = phys(self.bm, self.bk, in_dtype, in_item)
        if self.rhs_layout == "nk":
            b_blk = phys(self.bn, self.bk, in_dtype, in_item)
        else:
            b_blk = phys(self.bk, self.bn, in_dtype, in_item)
        o_blk = phys(self.bm, self.bn, out_dtype, out_item)
        acc = phys(self.bm, self.bn, self.acc_dtype, acc_item)
        if self.pipeline_depth >= 2:
            # Manual staging (ops/pipelined.py): ``depth`` resident copies
            # of each operand block, the f32 accumulator carried as a
            # value, double-buffered output blocks.
            acc_f32 = phys(self.bm, self.bn, jnp.float32, 4)
            return (self.pipeline_depth * (a_blk + b_blk) + 2 * o_blk
                    + acc_f32)
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
        """Return an error string if the config is invalid, else None.

        Alignment rule (round 2): a block dim may violate lane/sublane
        alignment ONLY by covering its problem dim exactly (bk == k < 128
        etc.) — Mosaic then lays the whole dim out in one internally-padded
        tile, and NO caller-side zero-pad copy (an extra HBM round trip of
        the whole operand) is needed.  Probed bit-exact on v5e for
        bk=k=64, bn=n=64, bm=m=8, and 64^3.

        VMEM rule (round 2): with ``vmem_limit_bytes`` unset the round-1
        calibrated 14 MiB default-regime budget (+2 MiB A-block cap)
        applies; with it set, the footprint may grow to
        VMEM_MODEL_HEADROOM x limit, up to VMEM_LIMIT_CAP (v5e physically
        has 128 MiB VMEM — the round-1 ceiling was the compiler default,
        not hardware).
        """
        if self.use_xla:
            if self.xla_variant not in XLA_VARIANTS:
                return f"unknown xla_variant {self.xla_variant}"
            return None
        if self.edge not in ("pad", "mask"):
            return f"bad edge {self.edge}"
        if self.pipeline_depth not in (0, 2, 3, 4, 6, 8):
            return f"bad pipeline_depth {self.pipeline_depth}"
        if self.pipeline_depth >= 2 and self.edge == "mask":
            return "pipeline_depth requires edge='pad' (the staged kernel " \
                   "needs block-divisible dims)"
        m, n, k = shape if shape is not None else (None, None, None)
        sub = min_sublane(in_dtype)
        # Blocks must be physically aligned VMEM tiles in BOTH edge modes
        # (a full-dim block is always allowed — one internally-padded
        # tile); what 'mask' changes is that blocks need not DIVIDE the
        # problem dims, since the forward path skips the caller-side
        # zero-pad copy and predicates the edges in-kernel instead.
        if self.bm % sub and self.bm != m:
            return f"bm={self.bm} not a multiple of sublane {sub}"
        if self.bn % LANE and self.bn != n:
            return f"bn={self.bn} not a multiple of lane {LANE}"
        if self.bk % LANE and self.bk != k:
            return f"bk={self.bk} not a multiple of lane {LANE}"
        if self.acc_dtype not in ("float32", "bfloat16"):
            return f"unsupported acc_dtype {self.acc_dtype}"
        if self.grid_order not in ("mn", "nm"):
            return f"bad grid_order {self.grid_order}"
        if self.rhs_layout not in ("kn", "nk"):
            return f"bad rhs_layout {self.rhs_layout}"
        in_item = jnp.dtype(in_dtype).itemsize
        footprint = self.vmem_bytes(in_dtype, shape=shape)
        if self.vmem_limit_bytes is None:
            if self.bm * self.bk * in_item > A_BLOCK_CAP:
                return (f"a-block {self.bm}x{self.bk} exceeds the "
                        f"{A_BLOCK_CAP >> 20} MiB default-regime block cap "
                        f"(set vmem_limit_bytes to lift it)")
            if footprint > budget:
                return (f"vmem footprint {footprint} exceeds default-regime "
                        f"budget {budget}")
        else:
            if self.vmem_limit_bytes > VMEM_LIMIT_CAP:
                return (f"vmem_limit_bytes {self.vmem_limit_bytes} exceeds "
                        f"cap {VMEM_LIMIT_CAP}")
            if footprint > VMEM_MODEL_HEADROOM * self.vmem_limit_bytes:
                return (f"vmem footprint {footprint} exceeds "
                        f"{VMEM_MODEL_HEADROOM:.0%} of requested limit "
                        f"{self.vmem_limit_bytes}")
        return None

    def serves_out_dtype(self, m: int, n: int, k: int,
                         in_dtype=jnp.bfloat16,
                         out_dtype=jnp.bfloat16) -> bool:
        """Can this config deliver ``out_dtype`` for (m, n, k) at all?

        Tuning measures (and validates) configs at ``out_dtype=in_dtype``;
        the public API additionally admits wider outputs (the reference's
        F32F16F16F32 family DELIVERS f32, hgemm_cublas.cu:50-67).  A config
        whose output block only fits VMEM at 2 bytes/element cannot compile
        when asked for a 4-byte store (observed on-chip: the
        2048x12288x64/float32 winner's 2048x12288 f32 output block is 96
        MiB — Mosaic remote-compile fails even at the lifted limit).

        The criterion is deliberately the LOOSEST the model admits —
        footprint at the requested out dtype within the headroomed
        physical-VMEM cap, i.e. "could any liftable limit fit it" — because
        the static model overestimates Mosaic's real accounting: 43/44
        stored winners that nominally exceed their own entry limit at f32
        out passed the on-chip gate at f32 out unchanged
        (eval_results/correctness_campaign_tpu.json).  Dispatch falls back
        to the entry's sentinel only beyond this bound (never-fail)."""
        if self.use_xla:
            return True
        fp = self.vmem_bytes(in_dtype, out_dtype=out_dtype, shape=(m, n, k))
        return fp <= VMEM_MODEL_HEADROOM * VMEM_LIMIT_CAP

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

    # Sub-lane problem dims take a full-dim block (no HBM padding copy);
    # the C++ twin (tpul2/native/tunecache.cc tl2_heuristic) implements the
    # identical rule — keep them in lockstep (tests/test_native.py).
    # M: pad-to-sublane for skinny-M (LLM serving shapes), cap at 512.
    bm = m if m < sub else (
        pick(m, sub, (sub, 32, 64, 128, 256, 512)) if sub == 16 else
        pick(m, sub, (sub, 16, 32, 64, 128, 256, 512)))
    bn = n if n < LANE else pick(n, LANE, (128, 256, 512))
    bk = k if k < LANE else pick(k, LANE, (128, 256, 512, 1024))
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


def assign_vmem_limit(cfg: KernelConfig, m: int, n: int, k: int,
                      in_dtype=jnp.bfloat16) -> Optional[KernelConfig]:
    """Attach the vmem_limit_bytes a config needs, or None if infeasible.

    Configs within the default-regime budget (and A-block cap) keep
    vmem_limit_bytes=None; larger ones get a raised limit sized from the
    footprint model (probed safe up to VMEM_LIMIT_CAP on v5e)."""
    fp = cfg.vmem_bytes(in_dtype, shape=(m, n, k))
    in_item = jnp.dtype(in_dtype).itemsize
    a_ok = cfg.bm * cfg.bk * in_item <= A_BLOCK_CAP
    if fp <= DEFAULT_VMEM_BUDGET and a_ok:
        return dataclasses.replace(cfg, vmem_limit_bytes=None)
    limit = max(VMEM_LIMIT_FLOOR,
                round_up(int(fp / VMEM_MODEL_HEADROOM), 1 << 20))
    if limit > VMEM_LIMIT_CAP:
        return None
    return dataclasses.replace(cfg, vmem_limit_bytes=limit)


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

    Round-2 widening (VERDICT r1 next-round #1): block dims now reach the
    whole problem dim (sub-lane full-dim blocks avoid every HBM padding
    copy; whole-K-resident blocks kill the accumulator carry), tiles can
    exceed the 14 MiB default regime by carrying a raised
    ``vmem_limit_bytes`` (v5e has 128 MiB physical VMEM), and the top prior
    picks are duplicated with ``parallel_mn=False`` so the dimension-
    semantics axis is searched too.
    """
    sub = min_sublane(in_dtype)

    def dim_choices(dim: int, base: tuple, align: int) -> list:
        cs = {c for c in base if c <= round_up(dim, align)}
        if dim <= 2 * max(base):
            # exact full-dim cover: one block, no grid steps on this axis;
            # for unaligned dims also the only padding-free choice
            cs.add(dim)
        if not cs:
            cs.add(min(base))
        return sorted(cs)

    # bm reaches 2048 (round 5): on giant squares the HBM traffic is
    # (n/bn) passes over A + (m/bm) passes over B, minimized by SYMMETRIC
    # large output tiles — bm=bn=2048 at 8192^3 is 8 operand passes vs 10
    # for the round-4 1024x4096 best (the 8192^3 MFU-gap attack, VERDICT
    # r4 next-round #5).  The footprint model prunes it wherever the f32
    # accumulator (16 MiB) + double-buffered operands exceed VMEM.
    bms = dim_choices(m, tuple(b for b in (sub, 32, 64, 128, 256, 512, 1024,
                                           2048)
                               if b % sub == 0), sub)
    # bn reaches 16384 (round 3): thin-K giants are output-write bound and
    # want the longest contiguous row-major C stripes VMEM allows — the
    # footprint model prunes what doesn't fit.
    bns = dim_choices(n, (128, 256, 512, 1024, 2048, 4096, 8192, 16384),
                      LANE)
    bks = dim_choices(k, (128, 256, 512, 1024, 2048, 4096, 8192, 16384),
                      LANE)

    out = []
    seen = set()
    for bm in bms:
        for bn in bns:
            for bk in bks:
                for order in ("mn", "nm"):
                    for rhs in ("kn", "nk"):
                        # Round-3 edge axis (VERDICT r2 #3a): when a block
                        # does not divide its problem dim, the in-kernel
                        # masked variant competes alongside caller-side
                        # padding — it skips the HBM pad round trip and
                        # the output slice at the cost of predicating the
                        # K-tail.  On dividing tilings the two modes are
                        # the same program; only 'pad' is emitted.
                        edges = ("pad", "mask") if (
                            m % bm or n % bn or k % bk) else ("pad",)
                        for edge in edges:
                            cfg = assign_vmem_limit(
                                KernelConfig(bm=bm, bn=bn, bk=bk,
                                             acc_dtype=acc_dtype,
                                             grid_order=order,
                                             rhs_layout=rhs, edge=edge),
                                m, n, k, in_dtype)
                            if cfg is None or cfg in seen:
                                continue
                            if cfg.validate(in_dtype, budget,
                                            shape=(m, n, k)) is not None:
                                continue
                            if cfg.padding_waste(m, n, k) > 0.6:
                                continue
                            seen.add(cfg)
                            out.append(cfg)

    def prior(c: KernelConfig) -> tuple:
        # Prefer low padding waste, then larger blocks (fewer grid steps,
        # better MXU occupancy), then the default compiler regime, then
        # 'mn' order.
        steps = (cdiv(m, c.bm) * cdiv(n, c.bn) * cdiv(k, c.bk))
        return (c.padding_waste(m, n, k), steps,
                0 if c.vmem_limit_bytes is None else 1,
                0 if c.grid_order == "mn" else 1)

    out.sort(key=prior)
    out = out[:max_candidates]
    # dimension-semantics axis: 'arbitrary' variants of the best picks
    # (scaled with the candidate budget — a mini-tune's compile count is
    # the campaign's dominant cost)
    out.extend([dataclasses.replace(c, parallel_mn=False)
                for c in out[:min(6, max_candidates // 2)]])
    # kStage axis (VERDICT r2 next-round #3b): manually staged K pipelines
    # compete where the problem streams from HBM (an operand much larger
    # than the output, many K steps) — elsewhere Mosaic's automatic
    # lookahead-2 is structurally sufficient and the variants would only
    # burn compile budget.
    streaming = min(m, n) <= 256 and k >= 2048
    if streaming:
        deep = []
        for c in out[:min(4, max_candidates // 2)]:
            if (c.use_xla or c.edge == "mask" or m % c.bm or n % c.bn
                    or k % c.bk or k // c.bk < 3):
                continue
            for depth in (2, 4):
                d = dataclasses.replace(c, pipeline_depth=depth)
                d = assign_vmem_limit(d, m, n, k, in_dtype)
                if d is not None and d.validate(
                        in_dtype, budget, shape=(m, n, k)) is None:
                    deep.append(d)
        out.extend(deep)
    # The vendor path is always a candidate — and not just jnp.matmul:
    # every exact-for-this-family XLA formulation competes, so dispatch
    # can never lose to the XLA-AutoTuned baseline's variant set
    # (the footing the reference's candidate has vs cuBLASLt-AT).
    out.extend(KernelConfig.xla(v) for v in XLA_VARIANTS_FOR_ACC[acc_dtype])
    return out
