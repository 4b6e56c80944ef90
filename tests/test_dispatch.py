"""Dispatch layer tests: DB lookup → heuristic → XLA sentinel."""

import pytest
import jax.numpy as jnp
import numpy as np

import tpul2
from tpul2.autotune import db as db_mod
from tpul2.autotune.db import TuneDB
from tpul2.config import KernelConfig
from tpul2.dispatch import candidate_fn, resolve_config


def _ref(a, b):
    return np.asarray(a, np.float32) @ np.asarray(b, np.float32)


def test_matmul_default_path(tmp_path, monkeypatch):
    monkeypatch.setenv("TPUL2_TUNEDB", str(tmp_path / "db.json"))
    db_mod.reset_default_db()
    a = jnp.asarray(np.random.default_rng(0).integers(0, 2, (96, 160)),
                    jnp.bfloat16)
    b = jnp.asarray(np.random.default_rng(1).integers(0, 2, (160, 224)),
                    jnp.bfloat16)
    out = tpul2.matmul(a, b, out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), _ref(a, b))


def test_db_lookup_wins_over_heuristic(tmp_path, monkeypatch):
    monkeypatch.setenv("TPUL2_TUNEDB", str(tmp_path / "db.json"))
    db_mod.reset_default_db()
    db = db_mod.default_db()
    tuned = KernelConfig(bm=32, bn=128, bk=256, grid_order="nm")
    db.put(64, 128, 256, tuned, tflops=1.0)
    assert resolve_config(64, 128, 256) == tuned
    # Unknown shape falls back to the heuristic.
    cfg = resolve_config(63, 129, 255)
    assert cfg.validate(jnp.bfloat16) is None


def test_xla_sentinel_config(tmp_path, monkeypatch):
    monkeypatch.setenv("TPUL2_TUNEDB", str(tmp_path / "db.json"))
    db_mod.reset_default_db()
    db = db_mod.default_db()
    db.put(32, 128, 128, KernelConfig.xla(), tflops=1.0)
    a = jnp.ones((32, 128), jnp.bfloat16)
    b = jnp.ones((128, 128), jnp.bfloat16)
    out = tpul2.matmul(a, b, out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), 128.0)


def test_db_persistence_roundtrip(tmp_path):
    path = tmp_path / "roundtrip.json"
    db = TuneDB(path=path)
    cfg = KernelConfig(bm=16, bn=512, bk=1024, acc_dtype="bfloat16")
    db.put(8, 4096, 4096, cfg, tflops=123.4, acc="bfloat16",
           extra={"speedup": 1.17})
    db.save()
    db2 = TuneDB(path=path).load()
    assert db2.get(8, 4096, 4096, acc="bfloat16") == cfg
    assert db2.get_entry(8, 4096, 4096, acc="bfloat16")["speedup"] == 1.17
    assert db2.get(8, 4096, 4096, acc="float32") is None


def test_candidate_abi_matches_reference():
    # Reference ABI passes (a, b, b_col_major); candidate must accept it
    # (pybind/hgemm_a100_fp32.cc:11-27).
    a = jnp.ones((16, 128), jnp.bfloat16)
    b = jnp.ones((128, 128), jnp.bfloat16)
    for acc in ("float32", "bfloat16"):
        fn = candidate_fn(acc)
        out = fn(a, b, b.T)
        assert out.shape == (16, 128)


def test_xla_variant_dispatch_exact(tmp_path, monkeypatch):
    """A stored sentinel with any xla_variant formulation dispatches to an
    exact XLA path (with and without the caller-materialized b_t)."""
    from tpul2.config import XLA_VARIANTS
    monkeypatch.setenv("TPUL2_TUNEDB", str(tmp_path / "db.json"))
    db_mod.reset_default_db()
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.integers(0, 2, (64, 96)), jnp.bfloat16)
    b = jnp.asarray(rng.integers(0, 2, (96, 128)), jnp.bfloat16)
    bt = jnp.swapaxes(b, 0, 1)
    for v in XLA_VARIANTS:
        cfg = KernelConfig.xla(v)
        out = tpul2.matmul(a, b, config=cfg, out_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(out), _ref(a, b), err_msg=v)
        out2 = tpul2.matmul(a, b, config=cfg, b_t=bt, out_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(out2), _ref(a, b),
                                      err_msg=v)


def test_tune_persists_to_passed_empty_db(tmp_path, monkeypatch):
    """Regression: an EMPTY TuneDB is falsy (__len__), and `db or
    default_db()` silently redirected the winner to the default DB."""
    from tpul2.autotune.db import TuneDB
    from tpul2.autotune.search import tune_shape
    monkeypatch.setenv("TPUL2_TUNEDB", str(tmp_path / "default.json"))
    db_mod.reset_default_db()
    mine = TuneDB(path=tmp_path / "mine.json")
    assert len(mine) == 0
    tune_shape(16, 128, 128, db=mine, max_candidates=2, stage1_rounds=1,
               stage2_rounds=1, finalists=1, save=True)
    assert len(mine) == 1
    assert len(db_mod.default_db()) == 0


def test_shape_mismatch_raises_value_error():
    """API-boundary errors (verify recipe: 'should raise cleanly') — a
    mismatched contraction dim must be a ValueError at tpul2.matmul /
    batched_matmul, not an AssertionError from the padding internals."""
    a = jnp.ones((8, 16), jnp.bfloat16)
    with pytest.raises(ValueError, match="shape mismatch"):
        tpul2.matmul(a, jnp.ones((3, 5), jnp.bfloat16))
    with pytest.raises(ValueError, match="shape mismatch"):
        tpul2.matmul(a[0], jnp.ones((16, 4), jnp.bfloat16))
    with pytest.raises(ValueError, match="shape mismatch"):
        tpul2.batched_matmul(jnp.ones((2, 8, 16), jnp.bfloat16),
                             jnp.ones((2, 9, 4), jnp.bfloat16))
    with pytest.raises(ValueError, match="shape mismatch"):
        tpul2.batched_matmul(jnp.ones((2, 8, 16), jnp.bfloat16),
                             jnp.ones((3, 16, 4), jnp.bfloat16))


def test_invalid_config_raises_value_error():
    a = jnp.ones((64, 64), jnp.bfloat16)
    with pytest.raises(ValueError, match="invalid kernel config"):
        tpul2.matmul(a, a, config=KernelConfig(bm=13, bn=128, bk=128))
