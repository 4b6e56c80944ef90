"""Bit-exact correctness gate — TPU port of the reference's 0/1 check.

Reference (SURVEY.md C4, zero_one_correctness_check.py): draw 0/1-valued
random inputs so fp16 GEMM is integer-exact, compare every kernel (candidate
AND all baselines) against a CPU fp32 ground truth, mask entries whose true
value exceeds the dtype's integer-exactness bound, demand the candidate's
average max-diff be EXACTLY 0.0, and surround every buffer with guard-band
canaries to catch out-of-bounds writes.

TPU re-derivation of the density rule (SURVEY.md §7 hard part (d)):
  - fp16 has a 10-bit mantissa → integers exact to 2048; the reference keeps
    dot products under that with {0,1} draws up to dim 8192, {0,0,1} beyond
    (zero_one_correctness_check.py:65-73).
  - bf16 has an 8-bit mantissa → integers exact only to 256.  A {0,1} draw
    with density p gives E[dot] = K·p², so we choose p = min(0.5,
    sqrt(TARGET/K)) with TARGET = 64 to keep almost every output below 256,
    and mask the stragglers (|truth| > 256) exactly as the reference masks
    |truth| > 2047.
  - The f32 accumulator path is integer-exact to 2²⁴, far beyond any
    K ≤ 16384 dot product of 0/1 values — so when the output dtype is f32
    no masking is needed at all.

Memory-safety canary (reference guard bands :98-149): JAX arrays are
immutable so a kernel cannot stomp *caller* memory, but a mis-tiled index
map can stomp the kernel's own padded output or read K-padding as data.  We
run the kernel through ``pallas_matmul_padded`` and require the pad rows and
cols of the output to be exactly 0 (zero-padded operands guarantee this for
a correct kernel) — any garbage there is the TPU-visible symptom class the
reference's canaries catch.
"""

from __future__ import annotations

import json
import math
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpul2.config import KernelConfig
from tpul2.dispatch import candidate_fn, resolve_config
from tpul2.ops.baselines import BASELINES
from tpul2.ops.matmul import pallas_matmul_padded

#: Largest integer exactly representable for each output dtype's mantissa.
EXACT_BOUND = {
    "bfloat16": 256,
    "float16": 2048,
    "float32": 1 << 24,
}

#: Target expected dot-product magnitude for the density rule.
_DENSITY_TARGET = 64.0


def zero_one_density(k: int, out_dtype="bfloat16") -> float:
    """Bernoulli density p for {0,1} draws keeping E[dot]=K·p² ≲ bound/4."""
    bound = EXACT_BOUND[jnp.dtype(out_dtype).name]
    if bound >= 1 << 24:
        return 0.5  # f32 out: everything is exact anyway
    return min(0.5, math.sqrt(_DENSITY_TARGET / max(k, 1)))


def _draw_01(rng, shape, p, dtype):
    return jnp.asarray(rng.random(shape) < p, dtype)


def compare_with_cpu_f32(m: int, n: int, k: int,
                         acc: str = "float32",
                         in_dtype=jnp.bfloat16,
                         out_dtype=None,
                         iterations: int = 100,
                         time_cap_s: float = 60.0,
                         seed: int = 0,
                         funcs: Optional[dict] = None) -> dict:
    """Run candidate + baselines against CPU f32 truth; return per-func stats.

    Mirrors compare_kernels_with_cpu_fp32 (reference :47-188): ≤`iterations`
    rounds under a `time_cap_s` wall-clock cap, fresh 0/1 inputs per round,
    per-entry masking above the exactness bound, max-|diff| per func per
    round.
    """
    if out_dtype is None:
        out_dtype = in_dtype
    out_name = jnp.dtype(out_dtype).name
    bound = EXACT_BOUND[out_name] if acc == "float32" else \
        min(EXACT_BOUND[out_name], EXACT_BOUND[jnp.dtype(acc).name])
    p = zero_one_density(k, out_dtype if acc == "float32" else acc)

    if funcs is None:
        funcs = dict(BASELINES)
        funcs["tpul2"] = candidate_fn(acc)

    # Per-iteration memory-safety canary (reference checks its guard bands
    # after EVERY one of the <=100 iterations, :133-149 — round 1 checked
    # once; VERDICT r1 Weak #6): when the candidate config is a real Pallas
    # kernel, every round also runs it unsliced and requires the padded
    # output region to be exactly 0.
    canary_cfg = resolve_config(m, n, k, acc, in_dtype)
    run_canary = not canary_cfg.use_xla
    canary_hits = 0

    rng = np.random.default_rng(seed)
    diffs = {name: [] for name in funcs}
    nan_inf = {name: False for name in funcs}
    t_end = time.time() + time_cap_s
    iters_done = 0

    for _ in range(iterations):
        if time.time() > t_end:
            break
        a = _draw_01(rng, (m, k), p, in_dtype)
        b = _draw_01(rng, (k, n), p, in_dtype)
        b_t = jnp.asarray(np.asarray(b).T, in_dtype)
        truth = np.asarray(a, np.float32) @ np.asarray(b, np.float32)
        mask = np.abs(truth) <= bound
        for name, fn in funcs.items():
            out = np.asarray(jax.block_until_ready(fn(a, b, b_t)), np.float32)
            if not np.all(np.isfinite(out)):
                nan_inf[name] = True
            d = np.abs(out - truth)
            d[~mask] = 0.0
            diffs[name].append(float(d.max()) if d.size else 0.0)
        if run_canary:
            padded = np.asarray(jax.block_until_ready(
                pallas_matmul_padded(a, b, canary_cfg,
                                     out_dtype=jnp.float32)), np.float32)
            if (not np.all(padded[m:, :] == 0.0)
                    or not np.all(padded[:, n:] == 0.0)):
                canary_hits += 1
        iters_done += 1

    return {
        "iterations": iters_done,
        "density": p,
        "exact_bound": bound,
        "masked_frac": float((~mask).mean()) if iters_done else None,
        "avg_max_diff": {n_: float(np.mean(d)) for n_, d in diffs.items()},
        "nan_or_inf": nan_inf,
        "canary_iterations": iters_done if run_canary else 0,
        "canary_hits": canary_hits,
    }


def canary_check(m: int, n: int, k: int,
                 config: Optional[KernelConfig] = None,
                 acc: str = "float32",
                 in_dtype=jnp.bfloat16,
                 seed: int = 0) -> dict:
    """Padded-region canary: pad rows/cols of the kernel output must be 0.

    The reference's analogous gate: any modified guard-band element fails the
    whole run with 'memory overflow detected.' (:238-239)."""
    cfg = config or resolve_config(m, n, k, acc, in_dtype)
    if cfg.use_xla:
        return {"pass": True, "skipped": "xla sentinel config"}
    rng = np.random.default_rng(seed)
    # Family-correct exactness: a bf16-accumulator config legitimately
    # rounds once sums exceed bf16's 256 integer bound, so the bf16 family
    # uses its own density and masks above-bound entries (same criterion
    # as compare_with_cpu_f32) — otherwise every large-K bf16-acc kernel
    # would be a false canary failure.
    fam = "bfloat16" if cfg.acc_dtype == "bfloat16" else "float32"
    p = zero_one_density(k, fam)
    a = _draw_01(rng, (m, k), p, in_dtype)
    b = _draw_01(rng, (k, n), p, in_dtype)
    out = np.asarray(jax.block_until_ready(
        pallas_matmul_padded(a, b, cfg, out_dtype=jnp.float32)), np.float32)
    mp, np_ = out.shape
    pad_rows_ok = bool(np.all(out[m:, :] == 0.0)) if mp > m else True
    pad_cols_ok = bool(np.all(out[:, n:] == 0.0)) if np_ > n else True
    truth = np.asarray(a, np.float32) @ np.asarray(b, np.float32)
    valid = out[:m, :n]
    if fam == "bfloat16":
        mask = np.abs(truth) <= EXACT_BOUND["bfloat16"]
        valid_ok = bool(np.array_equal(valid[mask], truth[mask]))
    else:
        valid_ok = bool(np.array_equal(valid, truth))
    return {
        "pass": pad_rows_ok and pad_cols_ok and valid_ok,
        "pad_rows_ok": pad_rows_ok,
        "pad_cols_ok": pad_cols_ok,
        "valid_region_ok": valid_ok,
        "padded_shape": [int(mp), int(np_)],
    }


def gate_kernel_variants(m: int, n: int, k: int,
                         config: Optional[KernelConfig] = None,
                         acc: str = "float32",
                         in_dtype=jnp.bfloat16,
                         seed: int = 0,
                         batch: int = 2) -> dict:
    """Exactness gate over ALL kernel entry points, not just the plain path.

    Round-1 gate only exercised the dispatch candidate; VERDICT r1 (Weak #6 /
    next-round #6) requires the gate to catch a mis-tiled kernel in every
    variant: plain NN, TN (rhs_layout='nk' consuming b_t), fused epilogue
    (bias + relu — integer-exact on 0/1 inputs), and batched.  Each variant
    is compared bit-exactly against CPU f32 truth on 0/1 inputs.
    """
    import dataclasses

    from tpul2.ops.matmul import (pallas_matmul, pallas_matmul_fused,
                                  pallas_matmul_tn)
    from tpul2.ops.batched import pallas_batched_matmul

    cfg = config or resolve_config(m, n, k, acc, in_dtype)
    if cfg.use_xla:
        return {"pass": True, "skipped": "xla sentinel config"}
    rng = np.random.default_rng(seed)
    p = zero_one_density(k, "float32" if acc == "float32" else acc)
    a = _draw_01(rng, (m, k), p, in_dtype)
    b = _draw_01(rng, (k, n), p, in_dtype)
    truth = np.asarray(a, np.float32) @ np.asarray(b, np.float32)
    bound = EXACT_BOUND["float32"] if acc == "float32" else EXACT_BOUND[acc]
    mask = np.abs(truth) <= bound

    def exact(out, ref):
        got = np.asarray(jax.block_until_ready(out), np.float32)
        return bool(np.array_equal(got[mask], ref[mask]))

    checks = {}
    cfg_nn = dataclasses.replace(cfg, rhs_layout="kn")
    cfg_tn = dataclasses.replace(cfg, rhs_layout="nk")
    checks["plain_nn"] = exact(
        pallas_matmul(a, b, cfg_nn, out_dtype=jnp.float32), truth)
    checks["tn"] = exact(
        pallas_matmul_tn(a, jnp.asarray(np.asarray(b).T, in_dtype), cfg_tn,
                         out_dtype=jnp.float32), truth)
    bias = _draw_01(rng, (n,), 0.5, in_dtype)
    fused_truth = np.maximum(truth + np.asarray(bias, np.float32), 0.0)
    checks["fused_bias_relu"] = exact(
        pallas_matmul_fused(a, b, bias=bias, activation="relu",
                            config=cfg_nn, out_dtype=jnp.float32),
        fused_truth)
    ab = _draw_01(rng, (batch, m, k), p, in_dtype)
    bb = _draw_01(rng, (batch, k, n), p, in_dtype)
    btruth = np.einsum("bmk,bkn->bmn", np.asarray(ab, np.float32),
                       np.asarray(bb, np.float32))
    bmask = np.abs(btruth) <= bound
    bout = np.asarray(jax.block_until_ready(
        pallas_batched_matmul(ab, bb, config=cfg_nn,
                              out_dtype=jnp.float32)), np.float32)
    checks["batched"] = bool(np.array_equal(bout[bmask], btruth[bmask]))

    return {"pass": all(checks.values()), **checks}


def run_correctness_check(m: int, n: int, k: int,
                          acc: str = "float32",
                          in_dtype=jnp.bfloat16,
                          iterations: int = 100,
                          time_cap_s: float = 60.0,
                          seed: int = 0,
                          result_path: Optional[str] = None,
                          check_variants: bool = True) -> dict:
    """Full gate: canary + exactness for candidate and all baselines.

    Pass criterion mirrors the reference (:242-268): the candidate's average
    max-diff must be EXACTLY 0.0 and free of NaN/Inf; the canary — checked
    after EVERY iteration, like the reference's guard bands (:133-149) —
    must never fire; and (round 2) every kernel entry-point variant (TN,
    fused, batched) must be bit-exact too.  Baselines are reported as
    cross-checks (the reference prints but does not gate on baselines —
    neither do we)."""
    stats = compare_with_cpu_f32(m, n, k, acc, in_dtype,
                                 iterations=iterations,
                                 time_cap_s=time_cap_s, seed=seed)
    canary = canary_check(m, n, k, acc=acc, in_dtype=in_dtype, seed=seed)
    canary_ok = canary["pass"] and stats["canary_hits"] == 0
    variants = (gate_kernel_variants(m, n, k, acc=acc, in_dtype=in_dtype,
                                     seed=seed)
                if check_variants else {"pass": True, "skipped": True})
    cand_diff = stats["avg_max_diff"]["tpul2"]
    cand_ok = (cand_diff == 0.0) and not stats["nan_or_inf"]["tpul2"]
    result = {
        "mnk": [m, n, k],
        "acc": acc,
        "in_dtype": jnp.dtype(in_dtype).name,
        "pass": bool(cand_ok and canary_ok and variants["pass"]),
        "candidate_avg_max_diff": cand_diff,
        "canary": canary,
        "variants": variants,
        "stats": stats,
    }
    if not canary_ok:
        result["failure"] = "memory overflow detected."
    elif not cand_ok:
        result["failure"] = (
            f"candidate avg max diff {cand_diff} != 0.0"
            if not stats["nan_or_inf"]["tpul2"] else "NaN/Inf in output")
    elif not variants["pass"]:
        bad = [kk for kk, v in variants.items()
               if kk != "pass" and v is False]
        result["failure"] = f"kernel variant(s) not exact: {bad}"
    if result_path:
        Path(result_path).parent.mkdir(parents=True, exist_ok=True)
        Path(result_path).write_text(json.dumps(result, indent=1))
    return result
