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


# ---------------------------------------------------------------------------
# per-mode dispatch (VERDICT r3 weak #3): server sub-entries win under
# mode='server' and are invisible to offline dispatch.
# ---------------------------------------------------------------------------

def test_resolve_config_server_mode(tmp_path, monkeypatch):
    monkeypatch.setenv("TPUL2_TUNEDB", str(tmp_path / "db.json"))
    db_mod.reset_default_db()
    db = db_mod.default_db()
    offline = KernelConfig(bm=64, bn=128, bk=128)
    db.put(64, 128, 128, offline, tflops=1.0)
    db.put_server(64, 128, 128, KernelConfig.xla("dot_tn"))
    assert resolve_config(64, 128, 128) == offline
    srv = resolve_config(64, 128, 128, mode="server")
    assert srv.use_xla and srv.xla_variant == "dot_tn"
    # no server sub-entry -> server mode falls back to the offline chain
    db.put(64, 256, 128, offline, tflops=1.0)
    assert resolve_config(64, 256, 128, mode="server") == offline


def test_server_candidate_dispatches_server_winner(tmp_path, monkeypatch):
    monkeypatch.setenv("TPUL2_TUNEDB", str(tmp_path / "db.json"))
    db_mod.reset_default_db()
    db = db_mod.default_db()
    db.put(32, 128, 64, KernelConfig(bm=32, bn=128, bk=64), tflops=1.0)
    db.put_server(32, 128, 64, KernelConfig.xla("sameacc_nn"),
                  acc="bfloat16")
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 2, (32, 64)), jnp.bfloat16)
    b = jnp.asarray(rng.integers(0, 2, (64, 128)), jnp.bfloat16)
    b_t = jnp.swapaxes(b, 0, 1)
    out = candidate_fn("bfloat16", mode="server")(a, b, b_t)
    np.testing.assert_array_equal(np.asarray(out, np.float32), _ref(a, b))
    out2 = candidate_fn("bfloat16")(a, b, b_t)
    np.testing.assert_array_equal(np.asarray(out2, np.float32), _ref(a, b))


# ---------------------------------------------------------------------------
# epoch guard (VERDICT r3 next-round #9): a DB mutation invalidates the
# jitted candidates' trace caches without a manual refresh_candidates().
# ---------------------------------------------------------------------------

def test_candidate_sees_new_config_without_manual_refresh(tmp_path,
                                                          monkeypatch):
    monkeypatch.setenv("TPUL2_TUNEDB", str(tmp_path / "db.json"))
    db_mod.reset_default_db()
    db = db_mod.default_db()
    calls = []
    import tpul2.dispatch as dispatch_mod
    real_resolve = dispatch_mod.resolve_config

    def spy(m, n, k, acc="float32", in_dtype=jnp.bfloat16, mode="offline"):
        cfg = real_resolve(m, n, k, acc, in_dtype, mode=mode)
        calls.append(cfg)
        return cfg

    monkeypatch.setattr(dispatch_mod, "resolve_config", spy)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 2, (16, 64)), jnp.bfloat16)
    b = jnp.asarray(rng.integers(0, 2, (64, 128)), jnp.bfloat16)
    b_t = jnp.swapaxes(b, 0, 1)
    fn = candidate_fn("float32")
    fn(a, b, b_t)
    n_first = len(calls)
    assert n_first >= 1
    fn(a, b, b_t)  # no DB change -> served from the jit cache, no re-trace
    assert len(calls) == n_first
    # tune the shape (db.put bumps the epoch) -> next call re-resolves
    db.put(16, 128, 64, KernelConfig.xla("dot_tn"), tflops=1.0)
    fn(a, b, b_t)
    assert len(calls) > n_first
    assert calls[-1].use_xla and calls[-1].xla_variant == "dot_tn"


# ---------------------------------------------------------------------------
# native dispatch path (VERDICT r3 next-round #6): exact-key resolution is
# served by the C++ cache when the binary sidecar mirrors the JSON.
# ---------------------------------------------------------------------------

def test_dispatch_hits_native_cache(tmp_path, monkeypatch):
    pytest.importorskip("tpul2.native")
    from tpul2.native import native_available
    if not native_available():
        pytest.skip("native toolchain unavailable")
    monkeypatch.setenv("TPUL2_TUNEDB", str(tmp_path / "db.json"))
    db_mod.reset_default_db()
    db = db_mod.default_db()
    cfg = KernelConfig(bm=64, bn=256, bk=128, rhs_layout="nk",
                       grid_order="nm")
    db.put(64, 256, 128, cfg, tflops=3.0)
    db.save()  # writes the .bin sidecar and re-arms the native fast path
    db_mod.reset_default_db()
    db2 = db_mod.default_db()
    assert db2.native_hits == 0
    got = resolve_config(64, 256, 128)
    assert got == cfg
    assert db2.native_hits == 1  # exact-key hit came from the C++ cache
    # a mutation un-arms the native path until the next save
    db2.put(64, 256, 128, KernelConfig.xla("dot_nn"), tflops=1.0)
    got2 = resolve_config(64, 256, 128)
    assert got2.use_xla and db2.native_hits == 1


def test_native_cache_roundtrips_entire_shipped_db():
    """Every shipped v5e TuneDB config must survive the native codec
    bit-for-bit — the dispatch hot path now serves exact-key hits from it."""
    pytest.importorskip("tpul2.native")
    from tpul2.native import NativeTuneCache, native_available
    if not native_available():
        pytest.skip("native toolchain unavailable")
    import json
    from pathlib import Path
    path = (Path(__file__).resolve().parent.parent / "tpul2" / "data"
            / "tunedb_v5e.json")
    if not path.exists():
        pytest.skip("no shipped DB")
    entries = json.loads(path.read_text())["entries"]
    nc = NativeTuneCache()
    for key, e in entries.items():
        mnk, acc, dt = key.split("/")
        m, n, k = map(int, mnk.split("_"))
        cfg = KernelConfig(**e["config"])
        nc.put(m, n, k, cfg, acc=acc, in_dtype=dt)
        assert nc.get(m, n, k, acc=acc, in_dtype=dt) == cfg, key


def test_nolhs_sentinel_dispatch_and_options(tmp_path, monkeypatch):
    """Round-4 flag variants: a 'nolhs_*' sentinel dispatches the plain
    f32-acc dot (numerics identical); the harness wrapper carries the
    program-scope compiler options for the timing chain (TPU-only)."""
    monkeypatch.setenv("TPUL2_TUNEDB", str(tmp_path / "db.json"))
    db_mod.reset_default_db()
    db = db_mod.default_db()
    db.put(32, 128, 64, KernelConfig.xla("nolhs_tn"), tflops=1.0)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 2, (32, 64)), jnp.bfloat16)
    b = jnp.asarray(rng.integers(0, 2, (64, 128)), jnp.bfloat16)
    b_t = jnp.swapaxes(b, 0, 1)
    out = candidate_fn("float32")(a, b, b_t)
    np.testing.assert_array_equal(np.asarray(out, np.float32), _ref(a, b))

    from tpul2.harness.bench_suite import _candidate_with_options
    from tpul2.ops.baselines import NOLHS_OPTIONS
    fn = _candidate_with_options("float32", 32, 128, 64, jnp.bfloat16)
    assert fn._compiler_options == NOLHS_OPTIONS
    # off-TPU the chain must drop the TPU-only options and still run
    from tpul2.harness import bench_utils as bu
    run = bu.make_chained_runner(fn, 32, 128, 64, jnp.bfloat16, reps=3)
    assert run(a, b, b_t).shape == (32, 64)
    # a plain sentinel gets the bare candidate (no wrapper)
    db.put(32, 128, 64, KernelConfig.xla("dot_nn"), tflops=1.0)
    fn2 = _candidate_with_options("float32", 32, 128, 64, jnp.bfloat16)
    assert getattr(fn2, "_compiler_options", None) is None


def test_out_dtype_feasibility_guard(tmp_path, monkeypatch):
    """A DB winner whose output block only fits VMEM at 2 bytes must serve
    out_dtype=float32 through the sentinel, not a Mosaic compile error
    (observed on-chip: the 2048x12288x64/float32 winner's 2048x12288 f32
    output block is 96 MiB > physical VMEM)."""
    monkeypatch.setenv("TPUL2_TUNEDB", str(tmp_path / "db.json"))
    db_mod.reset_default_db()
    db = db_mod.default_db()
    giant = KernelConfig(bm=2048, bn=12288, bk=64, rhs_layout="nk",
                         vmem_limit_bytes=72351744)
    m, n, k = 2048, 12288, 64
    assert giant.serves_out_dtype(m, n, k, jnp.bfloat16, jnp.bfloat16)
    assert not giant.serves_out_dtype(m, n, k, jnp.bfloat16, jnp.float32)
    db.put(m, n, k, giant, tflops=50.0)
    # bf16 out resolves to the tuned Pallas config unchanged...
    assert resolve_config(m, n, k) == giant
    # ...and an f32-out request computes through the guard's sentinel:
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.integers(0, 2, (m, k)), jnp.bfloat16)
    b = jnp.asarray(rng.integers(0, 2, (k, n)), jnp.bfloat16)
    out = tpul2.matmul(a, b, out_dtype=jnp.float32)
    assert out.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out), _ref(a, b))


def test_scavenge_sentinel_and_tuner_options(tmp_path, monkeypatch):
    """Round-5 flag variant: 'scavenge_*' dispatches the plain f32-acc dot
    (numerics identical); the TUNER's candidate builder must carry the
    program-scope options so the timing chain measures the variant with
    its flag (without it, flag sentinels time identically to the plain
    dot and can only win by noise)."""
    monkeypatch.setenv("TPUL2_TUNEDB", str(tmp_path / "db.json"))
    db_mod.reset_default_db()
    db = db_mod.default_db()
    db.put(32, 128, 64, KernelConfig.xla("scavenge_nn"), tflops=1.0)
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.integers(0, 2, (32, 64)), jnp.bfloat16)
    b = jnp.asarray(rng.integers(0, 2, (64, 128)), jnp.bfloat16)
    b_t = jnp.swapaxes(b, 0, 1)
    out = candidate_fn("float32")(a, b, b_t)
    np.testing.assert_array_equal(np.asarray(out, np.float32), _ref(a, b))

    from tpul2.autotune.search import _make_fn
    from tpul2.ops.baselines import SCAVENGE_OPTIONS
    fn = _make_fn(KernelConfig.xla("scavenge_tn"), jnp.float32,
                  interpret=True)
    assert fn._compiler_options == SCAVENGE_OPTIONS
    np.testing.assert_array_equal(np.asarray(fn(a, b, b_t)), _ref(a, b))
    # the family variant sets admit the pair (f32-acc dot in both)
    from tpul2.config import XLA_VARIANTS_FOR_ACC
    for acc in ("float32", "bfloat16"):
        assert "scavenge_nn" in XLA_VARIANTS_FOR_ACC[acc]
        assert "scavenge_tn" in XLA_VARIANTS_FOR_ACC[acc]
    # native cache codec round-trips the new ids
    from tpul2.native.build import _from_kernel_config, _to_kernel_config
    for v in ("scavenge_nn", "scavenge_tn"):
        cfg = KernelConfig.xla(v)
        assert _to_kernel_config(
            _from_kernel_config(cfg, "float32")).xla_variant == v
