#!/usr/bin/env python
"""On-chip exactness validation of the round-3 kernel structures.

Interpret-mode (CPU) tests cannot prove what REAL Mosaic does with
out-of-bounds block loads/stores (edge='mask') or manual DMA semaphores
(pipeline_depth) — this script runs the same exact-equality checks on the
actual TPU.  Run in a TPU window with no other TPU process.

Exit code 0 = every check bit-exact.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpul2.config import KernelConfig
    from tpul2.ops.matmul import (pallas_matmul, pallas_matmul_fused,
                                  pallas_matmul_tn)
    from tpul2.ops.pipelined import pallas_matmul_pipelined

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)

    def mk(m, n, k):
        a = jnp.asarray(rng.integers(0, 2, (m, k)), jnp.bfloat16)
        b = jnp.asarray(rng.integers(0, 2, (k, n)), jnp.bfloat16)
        return a, b, np.asarray(a, np.float32) @ np.asarray(b, np.float32)

    checks = []

    def check(name, out, ref):
        ok = np.array_equal(np.asarray(out, np.float32), ref)
        checks.append((name, ok))
        print(("OK  " if ok else "FAIL") + f" {name}", flush=True)

    # ---- edge='mask': every edge class, both layouts, multi+single K ----
    m, n, k = 100, 200, 300
    a, b, ref = mk(m, n, k)
    for order in ("mn", "nm"):
        cfg = KernelConfig(bm=64, bn=128, bk=128, edge="mask",
                           grid_order=order)
        check(f"mask multi-k {order}",
              pallas_matmul(a, b, cfg, out_dtype=jnp.float32), ref)
    cfg = KernelConfig(bm=64, bn=128, bk=512, edge="mask")
    check("mask single-k bk>k",
          pallas_matmul(a, b, cfg, out_dtype=jnp.float32), ref)
    cfg = KernelConfig(bm=64, bn=128, bk=128, edge="mask", rhs_layout="nk")
    bt = jnp.asarray(np.asarray(b).T)
    check("mask tn layout",
          pallas_matmul_tn(a, bt, config=cfg, out_dtype=jnp.float32), ref)
    bias = jnp.asarray(np.linspace(-2, 2, n), jnp.float32)
    cfg = KernelConfig(bm=64, bn=128, bk=128, edge="mask")
    fused_ref = np.maximum(ref + np.asarray(bias, np.float32), 0.0)
    check("mask fused bias+relu",
          pallas_matmul_fused(a, b, bias=bias, activation="relu",
                              config=cfg, out_dtype=jnp.float32),
          fused_ref)
    # larger unaligned shape exercising many edge blocks
    m, n, k = 1000, 1500, 700
    a, b, ref = mk(m, n, k)
    cfg = KernelConfig(bm=128, bn=256, bk=256, edge="mask")
    check("mask 1000x1500x700",
          pallas_matmul(a, b, cfg, out_dtype=jnp.float32), ref)

    # ---- pipeline_depth: depths x layouts, incl. a raised-VMEM config ----
    m, n, k = 512, 512, 2048
    a, b, ref = mk(m, n, k)
    bt = jnp.asarray(np.asarray(b).T)
    for depth in (2, 3, 4, 8):
        cfg = KernelConfig(bm=256, bn=256, bk=256, pipeline_depth=depth)
        check(f"pipelined d{depth} kn",
              pallas_matmul_pipelined(a, b, cfg, out_dtype=jnp.float32),
              ref)
    cfg = KernelConfig(bm=256, bn=256, bk=256, pipeline_depth=4,
                       rhs_layout="nk")
    check("pipelined d4 nk",
          pallas_matmul_pipelined(a, bt, cfg, out_dtype=jnp.float32), ref)
    from tpul2.config import assign_vmem_limit
    cfg = assign_vmem_limit(
        KernelConfig(bm=256, bn=512, bk=1024, pipeline_depth=4),
        m, n, k, jnp.bfloat16)
    if cfg is not None:
        check(f"pipelined d4 raised-vmem (limit={cfg.vmem_limit_bytes})",
              pallas_matmul_pipelined(a, b, cfg, out_dtype=jnp.float32),
              ref)

    bad = [name for name, ok in checks if not ok]
    print(f"\n{len(checks) - len(bad)}/{len(checks)} on-chip structure "
          f"checks exact" + (f"; FAILED: {bad}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
