"""Neighbor-transfer seeding tests."""
import jax.numpy as jnp

from tpul2.autotune.db import TuneDB
from tpul2.autotune.transfer import neighbor_seed_configs, _adapt
from tpul2.config import KernelConfig


def test_adapt_preserves_full_dim_semantics():
    cfg = KernelConfig(bm=128, bn=2048, bk=64)  # bk full-dim at src k=64
    out = _adapt(cfg, (128, 2048, 64), (128, 8192, 64), jnp.bfloat16)
    assert out is not None
    assert out.bk == 64 and out.bm == 128
    assert out.validate(jnp.bfloat16, shape=(128, 8192, 64)) is None


def test_adapt_clamps_oversized_blocks():
    cfg = KernelConfig(bm=512, bn=512, bk=512)
    out = _adapt(cfg, (512, 512, 512), (128, 256, 256), jnp.bfloat16)
    assert out is not None and out.bm == 128 and out.bn <= 256


def test_neighbor_seeds_ranked_and_deduped(tmp_path):
    db = TuneDB(path=tmp_path / "db.json")
    win = KernelConfig(bm=64, bn=2048, bk=64)
    db.put(64, 2048, 64, win, tflops=5.0, extra={"speedup_vs_xla": 1.4})
    db.put(64, 4096, 64, win, tflops=5.0, extra={"speedup_vs_xla": 1.3})
    # adapts identically to the (64, 4096, 64) neighbor -> must dedupe
    db.put(128, 4096, 64, win, tflops=5.0, extra={"speedup_vs_xla": 1.2})
    db.put(64, 2048, 64, KernelConfig.xla(), tflops=1.0, acc="bfloat16")
    db.put(4096, 4096, 4096, KernelConfig(bm=512, bn=512, bk=512),
           tflops=100.0, extra={"speedup_vs_xla": 1.01})  # too far
    seeds = neighbor_seed_configs(db, 64, 8192, 64)
    assert seeds  # neighbors found
    # three non-sentinel neighbors, but the (128,4096,64) adaptation is
    # identical to the nearer (64,4096,64) one -> at most 2 distinct seeds
    assert len(seeds) == 2
    # nearest neighbor first: (64,4096,64) carries bn=2048 as a block;
    # (64,2048,64) had bn full-dim, which transfers as full-dim bn=8192
    assert seeds[0].bn == 2048 and seeds[1].bn == 8192
    assert all(s.bk == 64 and not s.use_xla for s in seeds)


def test_no_neighbors_returns_empty(tmp_path):
    db = TuneDB(path=tmp_path / "db.json")
    assert neighbor_seed_configs(db, 64, 8192, 64) == []
