"""Kernel correctness tests (CPU interpret mode).

Covers the kernel-template variants the reference zoo froze per shape
(SURVEY.md C9): multi-K accumulation, single-K fast path, both grid orders,
both accumulator dtypes, and non-divisible shapes via caller-side padding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpul2.config import KernelConfig
from tpul2.ops.matmul import pallas_matmul


def _ref(a, b):
    return np.asarray(a, np.float32) @ np.asarray(b, np.float32)


def _mk(m, n, k, dtype=jnp.bfloat16, seed=0):
    rng = np.random.default_rng(seed)
    # 0/1 inputs -> exact f32 accumulation (same trick as the reference
    # correctness gate, zero_one_correctness_check.py:65-73).
    a = jnp.asarray(rng.integers(0, 2, (m, k)), dtype)
    b = jnp.asarray(rng.integers(0, 2, (k, n)), dtype)
    return a, b


@pytest.mark.parametrize("order", ["mn", "nm"])
def test_multi_k_accumulation(order):
    m, n, k = 256, 384, 512
    cfg = KernelConfig(bm=128, bn=128, bk=128, grid_order=order)
    a, b = _mk(m, n, k)
    out = pallas_matmul(a, b, cfg, out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), _ref(a, b))


def test_single_k_fast_path():
    m, n, k = 128, 128, 128
    cfg = KernelConfig(bm=128, bn=128, bk=128)
    a, b = _mk(m, n, k)
    out = pallas_matmul(a, b, cfg, out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), _ref(a, b))


def test_nondivisible_shape_padded():
    m, n, k = 100, 200, 300
    cfg = KernelConfig(bm=64, bn=128, bk=128, acc_dtype="float32")
    a, b = _mk(m, n, k, jnp.float32)
    out = pallas_matmul(a, b, cfg, out_dtype=jnp.float32)
    assert out.shape == (m, n)
    np.testing.assert_array_equal(np.asarray(out), _ref(a, b))


def test_bf16_accumulator_family():
    # bf16 acc: integers exact to 256 — keep dot products small.
    m, n, k = 64, 128, 128
    cfg = KernelConfig(bm=32, bn=128, bk=128, acc_dtype="bfloat16")
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.integers(0, 2, (m, k)) * rng.integers(0, 2, (m, k)),
                    jnp.bfloat16)
    b = jnp.asarray(rng.integers(0, 2, (k, n)), jnp.bfloat16)
    out = pallas_matmul(a, b, cfg, out_dtype=jnp.float32)
    truth = _ref(a, b)
    assert np.all(np.abs(truth) <= 256)
    np.testing.assert_array_equal(np.asarray(out), truth)


def test_bf16_output_cast():
    m, n, k = 64, 128, 256
    cfg = KernelConfig(bm=64, bn=128, bk=128)
    a, b = _mk(m, n, k)
    out = pallas_matmul(a, b, cfg)  # default out dtype = input dtype
    assert out.dtype == jnp.bfloat16


def test_jittable():
    cfg = KernelConfig(bm=64, bn=128, bk=128)
    a, b = _mk(64, 128, 256)

    @jax.jit
    def f(a, b):
        return pallas_matmul(a, b, cfg, out_dtype=jnp.float32)

    np.testing.assert_array_equal(np.asarray(f(a, b)), _ref(a, b))


def test_grad_flows_through():
    # The library is a building block for training code: jax.grad must work
    # through pallas_matmul (XLA differentiates the pad/slice; the kernel
    # itself appears in fwd only — grads use XLA dot, which is fine for v0).
    cfg = KernelConfig(bm=16, bn=128, bk=128)
    a = jnp.ones((16, 128), jnp.float32)
    b = jnp.ones((128, 128), jnp.float32)

    def loss(a):
        return jnp.sum(pallas_matmul(a, b, cfg, out_dtype=jnp.float32))

    g = jax.grad(loss)(a)
    np.testing.assert_allclose(np.asarray(g), 128.0)


def test_invalid_config_raises():
    a, b = _mk(64, 128, 128)
    with pytest.raises(ValueError):
        pallas_matmul(a, b, KernelConfig(bm=8, bn=128, bk=128))  # bf16 sublane


def test_tn_layout_kernel():
    """rhs_layout='nk': kernel consumes the pre-transposed (N, K) operand
    (the reference's b_col_major TN contract)."""
    from tpul2.ops.matmul import pallas_matmul_tn

    m, n, k = 64, 256, 384
    cfg = KernelConfig(bm=32, bn=128, bk=128, rhs_layout="nk")
    a, b = _mk(m, n, k)
    bt = jnp.asarray(np.asarray(b).T)
    out = pallas_matmul_tn(a, bt, cfg, out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), _ref(a, b))


def test_tn_layout_via_public_matmul():
    import tpul2

    m, n, k = 48, 128, 256
    cfg = KernelConfig(bm=16, bn=128, bk=128, rhs_layout="nk")
    a, b = _mk(m, n, k, seed=5)
    # without b_t: dispatch transposes internally
    out = tpul2.matmul(a, b, config=cfg, out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), _ref(a, b))
    # with b_t provided (harness ABI): zero-transpose path
    bt = jnp.asarray(np.asarray(b).T)
    out2 = tpul2.matmul(a, b, config=cfg, b_t=bt, out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out2), _ref(a, b))


def test_tn_grad():
    from tpul2.ops.matmul import pallas_matmul_tn

    cfg = KernelConfig(bm=16, bn=128, bk=128, rhs_layout="nk")
    a = jnp.ones((16, 128), jnp.float32)
    bt = jnp.ones((128, 128), jnp.float32)

    def loss(a, bt):
        return jnp.sum(pallas_matmul_tn(a, bt, cfg, out_dtype=jnp.float32))

    da, dbt = jax.grad(loss, argnums=(0, 1))(a, bt)
    np.testing.assert_allclose(np.asarray(da), 128.0)
    np.testing.assert_allclose(np.asarray(dbt), 16.0)


# ---- round-3 masked-edge mode (edge='mask': in-kernel predication) ----

@pytest.mark.parametrize("shape,cfg_kw", [
    # K-tail masking, multi-k path (k=300 -> blocks 128/128/44-valid)
    ((100, 200, 300), dict(bm=64, bn=128, bk=128)),
    # single-k masked path (bk=128 > k=100)
    ((64, 128, 100), dict(bm=64, bn=128, bk=128)),
    # all three dims unaligned + both grid orders via param below
    ((130, 260, 515), dict(bm=64, bn=128, bk=256)),
])
@pytest.mark.parametrize("order", ["mn", "nm"])
def test_masked_edge_exact(shape, cfg_kw, order):
    m, n, k = shape
    cfg = KernelConfig(edge="mask", grid_order=order, **cfg_kw)
    a, b = _mk(m, n, k)
    out = pallas_matmul(a, b, cfg, out_dtype=jnp.float32)
    assert out.shape == (m, n)
    np.testing.assert_array_equal(np.asarray(out), _ref(a, b))


def test_masked_edge_tn_layout():
    m, n, k = 100, 200, 300
    cfg = KernelConfig(bm=64, bn=128, bk=128, edge="mask",
                       rhs_layout="nk")
    a, b = _mk(m, n, k)
    from tpul2.ops.matmul import pallas_matmul_tn
    bt = jnp.asarray(np.asarray(b).T)
    out = pallas_matmul_tn(a, bt, config=cfg, out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), _ref(a, b))


def test_masked_edge_matches_padded_mode():
    # mask and pad are the same math: bit-identical outputs
    import dataclasses
    m, n, k = 72, 190, 333
    cfg = KernelConfig(bm=32, bn=128, bk=128)
    a, b = _mk(m, n, k)
    out_pad = pallas_matmul(a, b, cfg, out_dtype=jnp.float32)
    out_mask = pallas_matmul(a, b, dataclasses.replace(cfg, edge="mask"),
                             out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out_pad), np.asarray(out_mask))


def test_masked_edge_fused_epilogue_and_grad():
    m, n, k = 96, 200, 260
    cfg = KernelConfig(bm=32, bn=128, bk=128, edge="mask")
    a, b = _mk(m, n, k)
    bias = jnp.asarray(np.linspace(-1, 1, n), jnp.float32)
    from tpul2.ops.matmul import pallas_matmul_fused
    out = pallas_matmul_fused(a, b, bias=bias, activation="relu",
                              config=cfg, out_dtype=jnp.float32)
    ref = np.maximum(_ref(a, b) + np.asarray(bias, np.float32), 0.0)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0, atol=0)
    # custom-vjp backward works for the masked forward too
    g = jax.grad(lambda x: pallas_matmul_fused(
        x, b, bias=bias, activation="relu", config=cfg,
        out_dtype=jnp.float32).sum())(a)
    assert g.shape == a.shape and bool(jnp.all(jnp.isfinite(g)))


def test_masked_edge_in_candidate_space():
    from tpul2.config import candidate_configs
    # unaligned shape: masked variants must compete; aligned: must not
    cands = candidate_configs(100, 200, 300)
    assert any(c.edge == "mask" for c in cands if not c.use_xla)
    aligned = candidate_configs(256, 256, 256)
    assert all(c.edge == "pad" for c in aligned if not c.use_xla)
