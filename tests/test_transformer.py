"""Transformer-block flagship tests (CPU interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpul2.config import KernelConfig
from tpul2.models.transformer import (
    block_forward,
    block_train_step,
    init_block,
)

CFG = KernelConfig(bm=16, bn=128, bk=128)


def test_forward_shape_and_finite():
    params = init_block(jax.random.key(0), d_model=128, d_ff=256)
    x = jax.random.normal(jax.random.key(1), (32, 128),
                          jnp.float32).astype(jnp.bfloat16)
    out = block_forward(params, x, n_heads=4, config=CFG)
    assert out.shape == (32, 128)
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))


def test_causal_masking():
    """Causal attention: the output at position 0 must not depend on later
    positions."""
    params = init_block(jax.random.key(0), d_model=128, d_ff=256)
    x = jax.random.normal(jax.random.key(2), (16, 128),
                          jnp.float32).astype(jnp.bfloat16)
    out1 = block_forward(params, x, n_heads=4, config=CFG)
    x2 = x.at[8:].set(jax.random.normal(jax.random.key(3), (8, 128),
                                        jnp.float32).astype(jnp.bfloat16))
    out2 = block_forward(params, x2, n_heads=4, config=CFG)
    np.testing.assert_array_equal(np.asarray(out1[:8], np.float32),
                                  np.asarray(out2[:8], np.float32))


def test_matches_xla_reference():
    """The tpul2-kernel block must agree with the same block on the XLA
    sentinel config (independent compute path)."""
    params = init_block(jax.random.key(0), d_model=128, d_ff=256)
    x = jax.random.normal(jax.random.key(4), (16, 128),
                          jnp.float32).astype(jnp.bfloat16)
    out_pallas = block_forward(params, x, n_heads=4, config=CFG)
    out_xla = block_forward(params, x, n_heads=4,
                            config=KernelConfig.xla())
    np.testing.assert_allclose(np.asarray(out_pallas, np.float32),
                               np.asarray(out_xla, np.float32),
                               rtol=0.05, atol=0.05)


def test_train_step_learns():
    params = init_block(jax.random.key(0), d_model=128, d_ff=256)
    x = jax.random.normal(jax.random.key(5), (16, 128),
                          jnp.float32).astype(jnp.bfloat16)
    y = jnp.zeros((16, 128), jnp.bfloat16)
    losses = []
    step = jax.jit(lambda p, x, y: block_train_step(p, x, y, n_heads=4,
                                                    lr=5e-2, config=CFG))
    for _ in range(5):
        params, loss = step(params, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
