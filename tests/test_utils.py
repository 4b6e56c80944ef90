"""Utility-layer unit tests (padding, platform)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpul2.utils.padding import cdiv, min_sublane, pad_operands, pad_to, round_up
from tpul2.utils import platform


def test_cdiv_round_up():
    assert cdiv(1, 128) == 1
    assert cdiv(128, 128) == 1
    assert cdiv(129, 128) == 2
    assert round_up(1, 128) == 128
    assert round_up(256, 128) == 256


def test_min_sublane():
    assert min_sublane(jnp.float32) == 8
    assert min_sublane(jnp.bfloat16) == 16
    assert min_sublane(jnp.int8) == 32


def test_pad_to_noop_and_pad():
    x = jnp.ones((4, 4))
    assert pad_to(x, 4, 4) is x
    y = pad_to(x, 8, 6)
    assert y.shape == (8, 6)
    assert float(y[7, 5]) == 0.0
    assert float(y[3, 3]) == 1.0


def test_pad_operands_mismatch():
    a = jnp.ones((4, 8))
    b = jnp.ones((9, 4))
    with pytest.raises(AssertionError):
        pad_operands(a, b, 8, 8, 8)


def test_pad_operands_shapes():
    a = jnp.ones((100, 300), jnp.bfloat16)
    b = jnp.ones((300, 200), jnp.bfloat16)
    a_p, b_p, (m, n) = pad_operands(a, b, 64, 128, 128)
    assert a_p.shape == (128, 384)
    assert b_p.shape == (384, 256)
    assert (m, n) == (100, 200)
    # zero padding exactness: padded K contributes nothing
    out = jnp.matmul(a_p, b_p)[:m, :n]
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(jnp.matmul(a, b), np.float32))


def test_platform_on_cpu():
    assert platform.backend() == "cpu"  # conftest forces cpu
    assert not platform.on_tpu()
    assert platform.default_interpret()
    assert platform.tpu_generation() == "cpu"
    assert np.isnan(platform.tpu_peak_flops())


def test_physical_min_noop_on_cpu():
    from tpul2.harness.bench_utils import physical_min_ms
    assert physical_min_ms(4096, 4096, 4096) == 1e-5


def test_tpu_generation_env_override(monkeypatch):
    from tpul2.utils import platform as pl
    pl.tpu_generation.cache_clear()
    monkeypatch.setenv("TPUL2_GEN", "v5e")
    assert pl.tpu_generation() == "v5e"
    monkeypatch.delenv("TPUL2_GEN")
    pl.tpu_generation.cache_clear()
    assert pl.tpu_generation() == "cpu"  # tests force the CPU backend
