"""Manually staged pipeline kernel tests (CPU interpret mode).

The kStage search axis (reference kernels/*:88-141) realized as an
in-kernel K loop over a depth-stage circular VMEM buffer fed by explicit
DMAs — see tpul2/ops/pipelined.py.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tpul2.config import KernelConfig
from tpul2.ops.pipelined import pallas_matmul_pipelined


def _mk(m, n, k, seed=0):
    rng = np.random.default_rng(seed)
    a = jnp.asarray(rng.integers(0, 2, (m, k)), jnp.bfloat16)
    b = jnp.asarray(rng.integers(0, 2, (k, n)), jnp.bfloat16)
    return a, b, np.asarray(a, np.float32) @ np.asarray(b, np.float32)


@pytest.mark.parametrize("depth", [2, 3, 4])
@pytest.mark.parametrize("rhs", ["kn", "nk"])
def test_pipelined_exact(depth, rhs):
    m, n, k = 256, 256, 1024
    a, b, ref = _mk(m, n, k)
    cfg = KernelConfig(bm=128, bn=128, bk=128, pipeline_depth=depth,
                       rhs_layout=rhs)
    arg = b if rhs == "kn" else jnp.asarray(np.asarray(b).T)
    out = pallas_matmul_pipelined(a, arg, config=cfg, out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_pipelined_depth_exceeds_gk_clamps():
    m, n, k = 128, 128, 384  # gk = 3 < depth 8
    a, b, ref = _mk(m, n, k)
    cfg = KernelConfig(bm=128, bn=128, bk=128, pipeline_depth=8)
    out = pallas_matmul_pipelined(a, b, config=cfg, out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_pipelined_single_k_falls_back():
    m, n, k = 128, 128, 512
    a, b, ref = _mk(m, n, k)
    cfg = KernelConfig(bm=128, bn=128, bk=512, pipeline_depth=4)
    out = pallas_matmul_pipelined(a, b, config=cfg, out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_pipelined_rejects_nondivisible():
    a, b, _ = _mk(100, 128, 512)
    cfg = KernelConfig(bm=64, bn=128, bk=128, pipeline_depth=2)
    with pytest.raises(ValueError, match="divisible"):
        pallas_matmul_pipelined(a, b, config=cfg)


def test_dispatch_routes_pipeline_depth():
    from tpul2.dispatch import matmul
    m, n, k = 256, 256, 512
    a, b, ref = _mk(m, n, k)
    cfg = KernelConfig(bm=128, bn=128, bk=128, pipeline_depth=2)
    out = matmul(a, b, config=cfg, out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), ref)
    # non-divisible dims: dispatch silently falls back to the standard
    # (Mosaic-pipelined) kernel rather than raising
    a2, b2, ref2 = _mk(100, 256, 512, seed=1)
    out2 = matmul(a2, b2, config=cfg, out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out2), ref2)


def test_vmem_model_scales_with_depth():
    base = KernelConfig(bm=128, bn=128, bk=128)
    deep = dataclasses.replace(base, pipeline_depth=4)
    assert deep.vmem_bytes() > base.vmem_bytes()
    assert deep.validate(jnp.bfloat16, shape=(512, 512, 1024)) is None
    # mask + pipeline is rejected
    bad = dataclasses.replace(deep, edge="mask")
    assert bad.validate(jnp.bfloat16) is not None
