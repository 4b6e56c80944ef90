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
