"""Correctness-gate tests (C4 parity: exactness by input design, masking,
canary)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpul2.config import KernelConfig
from tpul2.harness.correctness import (
    EXACT_BOUND,
    canary_check,
    compare_with_cpu_f32,
    gate_kernel_variants,
    run_correctness_check,
    zero_one_density,
)


def test_density_rule_bf16():
    # bf16 bound 256: density shrinks with K so E[dot]=K p^2 stays ~64.
    assert zero_one_density(64, "bfloat16") == 0.5
    p = zero_one_density(16384, "bfloat16")
    assert 16384 * p * p == pytest.approx(64.0)
    # f32 out: no density restriction.
    assert zero_one_density(16384, "float32") == 0.5


def test_gate_passes_small_shape(tmp_path, monkeypatch):
    monkeypatch.setenv("TPUL2_TUNEDB", str(tmp_path / "db.json"))
    from tpul2.autotune.db import reset_default_db
    reset_default_db()
    res = run_correctness_check(64, 128, 128, iterations=3, time_cap_s=30,
                                result_path=str(tmp_path / "r.json"))
    assert res["pass"], res
    assert res["candidate_avg_max_diff"] == 0.0
    assert (tmp_path / "r.json").exists()
    # all baselines cross-checked in the same harness (8 funcs total)
    assert len(res["stats"]["avg_max_diff"]) == 8


def test_gate_bf16_acc_family(tmp_path, monkeypatch):
    monkeypatch.setenv("TPUL2_TUNEDB", str(tmp_path / "db.json"))
    from tpul2.autotune.db import reset_default_db
    reset_default_db()
    res = run_correctness_check(32, 128, 512, acc="bfloat16", iterations=2,
                                time_cap_s=30)
    assert res["stats"]["exact_bound"] == EXACT_BOUND["bfloat16"]
    assert res["pass"], res


def test_gate_catches_wrong_kernel():
    # A deliberately wrong candidate must fail with nonzero diff.
    def bad(a, b, b_t):
        return jnp.matmul(a, b) + jnp.asarray(1.0, a.dtype)

    funcs = {"tpul2": bad}
    stats = compare_with_cpu_f32(32, 128, 128, iterations=2, time_cap_s=30,
                                 funcs=funcs)
    assert stats["avg_max_diff"]["tpul2"] > 0.0


def test_gate_catches_nan():
    def nan_fn(a, b, b_t):
        return jnp.matmul(a, b) * jnp.asarray(float("nan"), a.dtype)

    stats = compare_with_cpu_f32(32, 128, 128, iterations=1, time_cap_s=30,
                                 funcs={"tpul2": nan_fn})
    assert stats["nan_or_inf"]["tpul2"]


def test_canary_pass_on_padded_shape():
    cfg = KernelConfig(bm=64, bn=128, bk=128)
    res = canary_check(100, 200, 300, config=cfg)
    assert res["pass"], res
    assert res["padded_shape"] == [128, 256]


def test_gate_variants_pass():
    cfg = KernelConfig(bm=32, bn=128, bk=128)
    res = gate_kernel_variants(32, 128, 256, config=cfg)
    assert res["pass"], res
    assert res["plain_nn"] and res["tn"] and res["fused_bias_relu"] \
        and res["batched"]


def test_gate_variants_catch_mistiled_kernel(monkeypatch):
    """A deliberately mis-tiled output index map (writes every M-block to
    row-block 0) must be caught by the variant gate in all four kernel
    entry points (VERDICT r1 next-round #6 'done when')."""
    import tpul2.ops.matmul as mm

    real_build = mm._build_call

    def evil_build(mp, np_, kp, cfg, in_dtype, out_dtype, interpret,
                   has_bias=False, activation=None):
        import dataclasses
        # Halve bm so the output has >1 row-block, then sabotage the o_map
        # by shrinking the problem's M the kernel sees: emulate mis-tiling
        # by running the real kernel on HALF the rows and leaving the rest
        # of the output unwritten (stale/garbage analogue = zeros here,
        # which differs from truth on valid rows).
        half_cfg = dataclasses.replace(cfg, bm=max(cfg.bm // 2, 8))
        call = real_build(mp, np_, kp, half_cfg, in_dtype, out_dtype,
                          interpret, has_bias=has_bias,
                          activation=activation)

        def wrong(*args):
            out = call(*args)
            # mis-tiled write: row-blocks land on block 0 (later blocks win)
            return out.at[:out.shape[0] // 2, :].set(
                out[out.shape[0] // 2:, :])

        return wrong

    monkeypatch.setattr(mm, "_build_call", evil_build)
    cfg = KernelConfig(bm=32, bn=128, bk=128)
    res = gate_kernel_variants(64, 128, 256, config=cfg)
    assert not res["pass"]
    # every variant that routes through _build_call must individually fail
    assert not res["plain_nn"]
    assert not res["tn"]
    assert not res["fused_bias_relu"]


def test_per_iteration_canary_counted(tmp_path, monkeypatch):
    monkeypatch.setenv("TPUL2_TUNEDB", str(tmp_path / "db.json"))
    from tpul2.autotune.db import reset_default_db
    reset_default_db()
    stats = compare_with_cpu_f32(100, 200, 300, iterations=2, time_cap_s=30)
    assert stats["canary_iterations"] == stats["iterations"] > 0
    assert stats["canary_hits"] == 0
    reset_default_db()


def test_pad_regions_are_exact_zero():
    """Pad poisoning defense: the kernel consumes its pads arithmetically
    (0*0 contributions), so the safety invariant is that caller-side padding
    writes EXACT zeros — any nonzero there would corrupt valid output."""
    from tpul2.utils.padding import pad_to

    x = jnp.full((100, 300), 7.0, jnp.bfloat16)
    p = pad_to(x, 128, 384)
    arr = np.asarray(p, np.float32)
    assert np.all(arr[100:, :] == 0.0)
    assert np.all(arr[:, 300:] == 0.0)
    assert np.all(arr[:100, :300] == 7.0)


def test_canary_detects_oob_style_corruption(monkeypatch):
    # Simulate a mis-tiled kernel that writes garbage into the pad region.
    import tpul2.harness.correctness as mod

    real = mod.pallas_matmul_padded

    def corrupted(a, b, cfg, out_dtype=None, interpret=None):
        out = real(a, b, cfg, out_dtype=out_dtype, interpret=interpret)
        return out.at[-1, -1].set(777.0)  # stomp the guard region

    monkeypatch.setattr(mod, "pallas_matmul_padded", corrupted)
    res = mod.canary_check(100, 200, 300,
                           config=KernelConfig(bm=64, bn=128, bk=128))
    assert not res["pass"]
    assert not res["pad_rows_ok"] or not res["pad_cols_ok"]


def test_correctness_campaign_sweeps_db(tmp_path, capsys):
    """scripts/correctness_campaign: every non-sentinel DB entry runs the
    gate in interpret mode; sentinels and over-cap configs are skipped."""
    import json

    import scripts.correctness_campaign as cc
    from tpul2.autotune.db import TuneDB
    from tpul2.config import KernelConfig

    db = TuneDB(path=tmp_path / "db.json")
    db.put(64, 256, 64, KernelConfig(bm=64, bn=256, bk=64), tflops=1.0)
    db.put(64, 128, 64, KernelConfig.xla(), tflops=1.0)       # sentinel
    db.put(4096, 4096, 4096, KernelConfig(bm=128, bn=128, bk=128),
           tflops=1.0, acc="bfloat16")                        # over cap
    db.save()
    out = tmp_path / "cc.json"
    rc = cc.main(["--db", str(db.path), "--out", str(out),
                  "--iterations", "1", "--max_steps", "64"])
    assert rc == 0
    rep = json.loads(out.read_text())
    assert rep["summary"]["checked"] == 1
    assert rep["summary"]["passed"] == 1
    assert rep["summary"]["skipped"][0]["mnk"] == "4096x4096x4096"
