"""Fused-epilogue and batched matmul ops (CPU interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpul2
from tpul2.config import KernelConfig
from tpul2.ops.matmul import ACTIVATIONS, pallas_matmul_fused
from tpul2.ops.batched import pallas_batched_matmul

CFG = KernelConfig(bm=32, bn=128, bk=128)


def _data(m, n, k, seed=0):
    rng = np.random.default_rng(seed)
    a = jnp.asarray(rng.integers(0, 2, (m, k)), jnp.bfloat16)
    b = jnp.asarray(rng.integers(0, 2, (k, n)), jnp.bfloat16)
    return a, b


def _ref(a, b):
    return np.asarray(a, np.float32) @ np.asarray(b, np.float32)


def test_fused_bias():
    a, b = _data(32, 128, 256)
    bias = jnp.asarray(np.arange(128) % 5, jnp.float32)
    out = pallas_matmul_fused(a, b, bias=bias, config=CFG,
                              out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out),
                                  _ref(a, b) + np.asarray(bias))


@pytest.mark.parametrize("act", ["relu", "gelu", "silu", "tanh"])
def test_fused_activation(act):
    a, b = _data(32, 128, 128, seed=1)
    out = pallas_matmul_fused(a, b, activation=act, config=CFG,
                              out_dtype=jnp.float32)
    expect = np.asarray(ACTIVATIONS[act](jnp.asarray(_ref(a, b))))
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-6, atol=1e-6)


def test_fused_bias_act_nondivisible():
    a, b = _data(50, 200, 300, seed=2)
    bias = jnp.asarray(np.linspace(-1, 1, 200), jnp.float32)
    out = pallas_matmul_fused(a, b, bias=bias, activation="relu",
                              config=CFG, out_dtype=jnp.float32)
    expect = np.maximum(_ref(a, b) + np.asarray(bias), 0.0)
    np.testing.assert_array_equal(np.asarray(out), expect)
    assert out.shape == (50, 200)


def test_fused_grad():
    a, b = _data(16, 128, 128, seed=3)
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    bias = jnp.zeros((128,), jnp.float32)

    def loss(a, b, bias):
        return jnp.sum(pallas_matmul_fused(
            a, b, bias=bias, activation="relu", config=CFG,
            out_dtype=jnp.float32))

    da, db, dbias = jax.grad(loss, argnums=(0, 1, 2))(a, b, bias)
    # reference grads via plain XLA composition
    def ref_loss(a, b, bias):
        return jnp.sum(jax.nn.relu(a @ b + bias))
    ra, rb, rbias = jax.grad(ref_loss, argnums=(0, 1, 2))(a, b, bias)
    np.testing.assert_allclose(np.asarray(da), np.asarray(ra), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dbias), np.asarray(rbias),
                               rtol=1e-5)


def test_fused_unknown_activation():
    a, b = _data(16, 128, 128)
    with pytest.raises(ValueError):
        pallas_matmul_fused(a, b, activation="sigmoidal-frobnicator",
                            config=CFG)


def test_fused_via_dispatch():
    a, b = _data(32, 128, 128, seed=4)
    bias = jnp.ones((128,), jnp.float32)
    out = tpul2.matmul(a, b, config=CFG, bias=bias, activation="relu",
                       out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.maximum(_ref(a, b) + 1.0, 0.0))
    # xla sentinel path with epilogue
    out2 = tpul2.matmul(a, b, config=KernelConfig.xla(), bias=bias,
                        activation="relu", out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(out))


def test_batched_matmul():
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.integers(0, 2, (3, 64, 256)), jnp.bfloat16)
    b = jnp.asarray(rng.integers(0, 2, (3, 256, 128)), jnp.bfloat16)
    out = pallas_batched_matmul(a, b, config=CFG, out_dtype=jnp.float32)
    assert out.shape == (3, 64, 128)
    for t in range(3):
        np.testing.assert_array_equal(np.asarray(out[t]), _ref(a[t], b[t]))


def test_batched_nondivisible():
    rng = np.random.default_rng(6)
    a = jnp.asarray(rng.integers(0, 2, (2, 50, 300)), jnp.bfloat16)
    b = jnp.asarray(rng.integers(0, 2, (2, 300, 200)), jnp.bfloat16)
    out = tpul2.batched_matmul(a, b, config=CFG, out_dtype=jnp.float32)
    assert out.shape == (2, 50, 200)
    for t in range(2):
        np.testing.assert_array_equal(np.asarray(out[t]), _ref(a[t], b[t]))


def test_batched_via_dispatch_xla_sentinel():
    a = jnp.ones((2, 16, 128), jnp.bfloat16)
    b = jnp.ones((2, 128, 128), jnp.bfloat16)
    out = tpul2.batched_matmul(a, b, config=KernelConfig.xla(),
                               out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), 128.0)
