"""Dispatch-time neighbor transfer for untuned shapes."""
import jax.numpy as jnp
import numpy as np
import pytest

from tpul2.autotune.db import TuneDB
from tpul2.config import KernelConfig
from tpul2.dispatch import _neighbor_config, matmul


def test_neighbor_win_adapts(tmp_path):
    db = TuneDB(path=tmp_path / "db.json")
    db.put(64, 2048, 64, KernelConfig(bm=64, bn=2048, bk=64), tflops=5.0,
           extra={"speedup_vs_xla": 1.4})
    cfg = _neighbor_config(db, 64, 4096, 64, "float32", jnp.bfloat16)
    assert cfg is not None and not cfg.use_xla
    assert cfg.bk == 64  # full-dim K semantics carried over


def test_neighbor_noise_win_degrades_to_sentinel(tmp_path):
    db = TuneDB(path=tmp_path / "db.json")
    db.put(64, 2048, 64, KernelConfig(bm=64, bn=2048, bk=64), tflops=5.0,
           extra={"speedup_vs_xla": 1.01})  # within noise
    cfg = _neighbor_config(db, 64, 4096, 64, "float32", jnp.bfloat16)
    assert cfg is not None and cfg.use_xla


def test_sentinel_neighbor_transfers_variant(tmp_path):
    db = TuneDB(path=tmp_path / "db.json")
    db.put(512, 512, 256, KernelConfig.xla("highest_tn"), tflops=1.0,
           extra={"speedup_vs_xla": 1.1})
    cfg = _neighbor_config(db, 512, 512, 128, "float32", jnp.bfloat16)
    assert cfg is not None and cfg.use_xla
    assert cfg.xla_variant == "highest_tn"


def test_distant_shapes_get_no_neighbor(tmp_path):
    db = TuneDB(path=tmp_path / "db.json")
    db.put(64, 64, 64, KernelConfig(bm=64, bn=64, bk=64), tflops=1.0,
           extra={"speedup_vs_xla": 1.2})
    assert _neighbor_config(db, 64, 8192, 64, "float32",
                            jnp.bfloat16) is None


def test_matmul_numerics_through_neighbor_path(tmp_path, monkeypatch):
    """End-to-end: an untuned shape dispatching an adapted neighbor config
    stays bit-exact on 0/1 inputs."""
    import tpul2.autotune.db as dbm

    db = TuneDB(path=tmp_path / "db.json")
    db.put(64, 256, 128, KernelConfig(bm=64, bn=256, bk=128), tflops=5.0,
           extra={"speedup_vs_xla": 1.3})
    monkeypatch.setattr(dbm, "_default_db", db)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 2, (64, 128)), jnp.bfloat16)
    b = jnp.asarray(rng.integers(0, 2, (128, 512)), jnp.bfloat16)  # untuned n
    out = matmul(a, b, out_dtype=jnp.float32)
    truth = np.asarray(a, np.float32) @ np.asarray(b, np.float32)
    assert np.array_equal(np.asarray(out), truth)


def test_entries_near_matches_linear_scan(tmp_path):
    """Octave-bucket index returns exactly the linear scan's ratio-filtered
    set (VERDICT r2 weak #6), and invalidates on put."""
    import jax.numpy as jnp
    from tpul2.autotune.db import TuneDB
    from tpul2.config import KernelConfig

    db = TuneDB(path=tmp_path / "db.json")
    import itertools
    dims = [64, 96, 128, 200, 256, 700, 1024, 4096]
    for i, (m, n, k) in enumerate(itertools.product(dims, dims[:4], dims[:3])):
        db.put(m, n, k, KernelConfig.xla(), tflops=float(i))
    for q in [(64, 64, 64), (128, 200, 96), (1000, 100, 100),
              (4096, 256, 128), (5000, 5000, 5000)]:
        for ratio in (2.0, 4.0):
            got = {s for s, _ in db.entries_near(*q, max_ratio=ratio)}
            want = set()
            for (em, en, ek), entry in db.entries_for():
                if all(max(a, b) / min(a, b) <= ratio
                       for a, b in zip((em, en, ek), q)):
                    want.add((em, en, ek))
            assert got == want, (q, ratio, got ^ want)
    # index invalidation: a put becomes visible immediately
    db.put(65, 65, 65, KernelConfig.xla(), tflops=1.0)
    assert (65, 65, 65) in {s for s, _ in db.entries_near(64, 64, 64)}


def test_raised_vmem_adaptation_degrades_to_sentinel(tmp_path):
    """An unmeasured dispatch-time transfer must stay inside the default
    Mosaic regime: scaling a neighbor's full-dim blocks onto giant dims
    yields one enormous unpipelined tile (the measured 0.37x server
    catastrophe at 4096x8192x64/bf16) — fall back to the sentinel."""
    db = TuneDB(path=tmp_path / "db.json")
    # a thin-K neighbor that legitimately won with full-dim M/N blocks
    db.put(4096, 2048, 64, KernelConfig(bm=4096, bn=2048, bk=64,
                                        vmem_limit_bytes=48 << 20),
           tflops=5.0, acc="bfloat16",
           extra={"speedup_vs_xla": 1.3})
    cfg = _neighbor_config(db, 8192, 4096, 64, "bfloat16", jnp.bfloat16)
    assert cfg is not None and cfg.use_xla
    # ...but an in-regime adaptation still transfers as Pallas
    cfg2 = _neighbor_config(db, 4096, 2048, 128, "bfloat16", jnp.bfloat16)
    if cfg2 is not None and not cfg2.use_xla:
        assert cfg2.vmem_limit_bytes is None or \
            cfg2.vmem_limit_bytes <= 48 << 20


def test_measured_neighbor_outranks_static_seed(tmp_path):
    """A statically seeded sentinel (measured=False) must not shadow a
    measured Pallas winner that sits slightly farther away."""
    db = TuneDB(path=tmp_path / "db.json")
    db.put(64, 2048, 64, KernelConfig.xla("matmul"), tflops=0.0,
           extra={"speedup_vs_xla": 1.0, "measured": False,
                  "scope": "transfer_static"})
    db.put(64, 1024, 64, KernelConfig(bm=64, bn=1024, bk=64), tflops=5.0,
           extra={"speedup_vs_xla": 1.4})
    cfg = _neighbor_config(db, 64, 2048, 128, "float32", jnp.bfloat16)
    assert cfg is not None and not cfg.use_xla
