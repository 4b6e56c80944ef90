"""Unit tests for the kernel config space (tpul2.config)."""

import jax.numpy as jnp
import pytest

from tpul2.config import (
    DEFAULT_VMEM_BUDGET,
    KernelConfig,
    candidate_configs,
    heuristic_config,
)


def test_default_config_valid():
    assert KernelConfig().validate(jnp.bfloat16) is None


def test_sublane_alignment_rejected():
    # bf16 sublane is 16: bm=8 invalid for bf16, valid for f32.
    cfg = KernelConfig(bm=8, bn=128, bk=128)
    assert cfg.validate(jnp.bfloat16) is not None
    assert cfg.validate(jnp.float32) is None


def test_lane_alignment_rejected():
    assert KernelConfig(bm=16, bn=64, bk=128).validate(jnp.bfloat16)
    assert KernelConfig(bm=16, bn=128, bk=64).validate(jnp.bfloat16)


def test_vmem_budget_rejected():
    big = KernelConfig(bm=128, bn=2048, bk=2048)
    assert "vmem" in (big.validate(jnp.bfloat16) or "")
    # ...but the same config is fine for a problem where B doesn't move
    # (single K step, single N block -> single-buffered).
    assert big.validate(jnp.bfloat16, shape=(4096, 2048, 2048)) is None


def test_a_block_cap_rejected():
    cfg = KernelConfig(bm=512, bn=128, bk=4096)
    assert "a-block" in (cfg.validate(jnp.bfloat16) or "")
    assert KernelConfig(bm=256, bn=128, bk=4096).validate(
        jnp.bfloat16, shape=(256, 128, 4096)) is None


def test_vmem_model_counts_double_buffering():
    cfg = KernelConfig(bm=128, bn=128, bk=128)
    # 2*(a+b) + 2*out + acc, bf16 in/out, f32 acc
    expect = 2 * (128 * 128 * 2 + 128 * 128 * 2) + 2 * 128 * 128 * 2 \
        + 128 * 128 * 4
    assert cfg.vmem_bytes(jnp.bfloat16, jnp.bfloat16) == expect


def test_bf16_acc_halves_scratch():
    f32 = KernelConfig(acc_dtype="float32")
    bf16 = KernelConfig(acc_dtype="bfloat16")
    assert bf16.vmem_bytes() < f32.vmem_bytes()


def test_json_roundtrip():
    cfg = KernelConfig(bm=32, bn=256, bk=512, acc_dtype="bfloat16",
                       grid_order="nm")
    assert KernelConfig.from_json(cfg.to_json()) == cfg


def test_heuristic_always_valid():
    shapes = [(64, 64, 64), (1, 4096, 11008), (16384, 16384, 16384),
              (7, 13, 100003 % 9999), (512, 128, 2048)]
    for (m, n, k) in shapes:
        for acc in ("float32", "bfloat16"):
            cfg = heuristic_config(m, n, k, acc)
            assert cfg.validate(jnp.bfloat16,
                                shape=(m, n, k)) is None, (m, n, k, acc)


def test_full_dim_blocks_valid_only_with_shape():
    # Sub-lane full-dim blocks are valid exactly when they cover the dim.
    cfg = KernelConfig(bm=128, bn=64, bk=64)
    assert cfg.validate(jnp.bfloat16) is not None
    assert cfg.validate(jnp.bfloat16, shape=(128, 64, 64)) is None
    assert cfg.validate(jnp.bfloat16, shape=(128, 256, 64)) is not None


def test_raised_vmem_limit_unlocks_budget():
    # 16 MiB footprint: rejected in the default regime, valid with a limit
    # (probed bit-exact on v5e, round-2 session 1).
    big = KernelConfig(bm=1024, bn=1024, bk=1024)
    shape = (2048, 2048, 2048)
    assert "vmem" in (big.validate(jnp.bfloat16, shape=shape) or "")
    import dataclasses
    lifted = dataclasses.replace(big, vmem_limit_bytes=32 << 20)
    assert lifted.validate(jnp.bfloat16, shape=shape) is None
    # ...and the A-block cap lifts with it
    ablock = KernelConfig(bm=1024, bn=512, bk=4096,
                          vmem_limit_bytes=100 << 20)
    assert ablock.validate(jnp.bfloat16, shape=(1024, 512, 4096)) is None


def test_candidates_valid_and_include_xla():
    cands = candidate_configs(4096, 4096, 4096)
    assert len(cands) > 4
    assert cands[-1].use_xla
    for c in cands[:-1]:
        assert c.validate(jnp.bfloat16, DEFAULT_VMEM_BUDGET,
                          shape=(4096, 4096, 4096)) is None


def test_candidates_subLane_dims_padding_free():
    # 27% of the reference grid has a 64-dim; full-dim blocks avoid the
    # HBM padding copy entirely.
    cands = candidate_configs(512, 512, 64)
    real = [c for c in cands if not c.use_xla]
    assert any(c.bk == 64 for c in real)
    cands2 = candidate_configs(64, 64, 4096)
    real2 = [c for c in cands2 if not c.use_xla]
    assert any(c.bn == 64 for c in real2)
    # whole-K-resident candidates exist for the skinny band
    assert any(c.bk == 4096 for c in real2)


def test_candidates_skinny_shape_low_waste():
    # LLM-serving shape: M=8, big N/K — candidates must not pad M to 512.
    cands = candidate_configs(8, 4096, 4096)
    real = [c for c in cands if not c.use_xla]
    assert all(c.padding_waste(8, 4096, 4096) <= 0.6 for c in real)
    # round 2: the full-dim block bm=8 is padding-free (round 1's best was
    # the sublane-padded bm=16)
    assert any(c.bm <= 16 for c in real)


def test_grid_for_order():
    cfg = KernelConfig(bm=128, bn=256, bk=512, grid_order="nm")
    assert cfg.grid_for(256, 512, 1024) == (2, 2, 2)
    cfg2 = KernelConfig(bm=128, bn=256, bk=512, grid_order="mn")
    assert cfg2.grid_for(384, 256, 512) == (3, 1, 1)


def test_padding_waste():
    cfg = KernelConfig(bm=128, bn=128, bk=128)
    assert cfg.padding_waste(128, 128, 128) == 0.0
    assert cfg.padding_waste(64, 128, 128) == pytest.approx(0.5)


def test_xla_variant_sentinels_in_candidates():
    from tpul2.config import XLA_VARIANTS_FOR_ACC
    for acc in ("float32", "bfloat16"):
        cands = candidate_configs(512, 512, 512, acc_dtype=acc)
        sentinels = {c.xla_variant for c in cands if c.use_xla}
        assert sentinels == set(XLA_VARIANTS_FOR_ACC[acc])
    # ADVICE r2 medium #1: the float32 family admits only f32-accumulating
    # formulations (a sameacc dot emits a bf16 result, so it cannot honor
    # matmul(acc="float32", out_dtype=f32)); bf16 admits every variant.
    f32_sent = {c.xla_variant
                for c in candidate_configs(512, 512, 512) if c.use_xla}
    assert not any(v.startswith("sameacc") for v in f32_sent)
    bf16_sent = {c.xla_variant
                 for c in candidate_configs(512, 512, 512,
                                            acc_dtype="bfloat16")
                 if c.use_xla}
    assert any(v.startswith("sameacc") for v in bf16_sent)


def test_xla_variant_validation_and_roundtrip():
    cfg = KernelConfig.xla("dot_tn")
    assert cfg.validate(jnp.bfloat16) is None
    assert KernelConfig.from_json(cfg.to_json()) == cfg
    bad = KernelConfig(use_xla=True, xla_variant="nope")
    assert bad.validate(jnp.bfloat16) is not None
    # round-1 JSON (no xla_variant field) decodes to the plain sentinel
    import json as _json
    old = {k: v for k, v in _json.loads(KernelConfig.xla().to_json()).items()
           if k != "xla_variant"}
    assert KernelConfig(**old).xla_variant == "matmul"
