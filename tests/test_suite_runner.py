"""run_suite CSV generation (C14 parity) with stubbed benchmarks."""

import csv

import pytest

import scripts.run_suite as rs


def test_grid_caps():
    shapes = rs.grid([64, 128], max_shapes=5)
    assert len(shapes) == 5
    shapes = rs.grid([64, 16384], max_elems=16384 * 128)
    assert (16384, 16384, 16384) not in shapes
    assert (64, 64, 64) in shapes


def _fake_lean(m, n, k, accs=("float32",), **kw):
    sp = {
        "xla_matmul": 1.2,
        "xla_dot_nn": 1.3, "xla_dot_tn": 1.1,
        "xla_highest_nn": 1.4, "xla_highest_tn": 1.5,
        "xla_autotuned_nn": 1.05, "xla_autotuned_tn": 1.15,
        "xla_sameacc_nn": 1.06, "xla_sameacc_tn": 1.16,
    }
    return {
        "mnk": [m, n, k],
        "speedups": {acc: dict(sp) for acc in accs},
        "per_func": {},
        "reps": 8,
        "trials": 1,
        "elapsed_s": 0.0,
    }


def test_eval_csv_written(tmp_path, monkeypatch):
    calls = []

    def fake_lean(m, n, k, **kw):
        calls.append((m, n, k))
        return _fake_lean(m, n, k, **kw)

    import tpul2.harness.bench_suite as bs
    monkeypatch.setattr(bs, "eval_shape_lean", fake_lean)

    out = tmp_path / "suite_{acc}.csv"
    rc = rs.main(["eval", "--dims", "64", "128", "--max_shapes", "4",
                  "--accs", "float32", "bfloat16", "--no_mini_tune",
                  "--out", str(out)])
    assert rc == 0
    for acc in ("float32", "bfloat16"):
        with (tmp_path / f"suite_{acc}.csv").open() as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 4
        r = rows[0]
        assert r["jnp.matmul"] == "1.2"
        # -max rows take the candidate-worst layout (C7 parity)
        assert r["XLA-dot-max"] == "1.1"
        assert r["XLA-highest-max"] == "1.4"
        assert r["XLA-AutoTuned-max"] == "1.05"
    # variance sidecar written
    assert (tmp_path / "suite_all_detail.jsonl").exists()

    # resume: second run skips all existing rows
    calls.clear()
    rc = rs.main(["eval", "--dims", "64", "128", "--max_shapes", "4",
                  "--accs", "float32", "bfloat16", "--no_mini_tune",
                  "--out", str(out)])
    assert rc == 0
    assert calls == []


def test_eval_failure_fails_fast(tmp_path, monkeypatch):
    import tpul2.harness.bench_suite as bs

    def boom(*a, **kw):
        raise RuntimeError("kaput")

    monkeypatch.setattr(bs, "eval_shape_lean", boom)
    rc = rs.main(["eval", "--dims", "64", "--max_shapes", "1", "--fail_fast",
                  "--no_mini_tune", "--out", str(tmp_path / "x.csv")])
    assert rc == 1


def test_eval_failure_skips_and_continues_by_default(tmp_path, monkeypatch):
    """Campaign mode: a failing shape is recorded in the .failures sidecar
    and the run completes the remaining shapes (rc 0)."""
    import tpul2.harness.bench_suite as bs

    calls = []

    def flaky(m, n, k, **kw):
        if (m, n, k) == (64, 64, 64):
            raise RuntimeError("kaput")
        calls.append((m, n, k))
        return _fake_lean(m, n, k, **kw)

    monkeypatch.setattr(bs, "eval_shape_lean", flaky)
    out = tmp_path / "suite_{acc}.csv"
    rc = rs.main(["eval", "--dims", "64", "128", "--max_shapes", "3",
                  "--no_mini_tune", "--out", str(out)])
    assert rc == 0
    assert len(calls) == 2
    fail_file = tmp_path / "suite_all_detail.failures"
    assert fail_file.exists() and "64x64x64" in fail_file.read_text()


def test_reverify_db_records_and_demotes(tmp_path, monkeypatch, capsys):
    """reverify_db re-times stored wins and demotes non-reproducing ones
    (VERDICT r1 next-round #7)."""
    monkeypatch.setenv("TPUL2_TUNEDB", str(tmp_path / "db.json"))
    from tpul2.autotune.db import reset_default_db, default_db
    from tpul2.config import KernelConfig
    import scripts.reverify_db as rv

    reset_default_db()
    db = default_db()
    db.put(64, 128, 128, KernelConfig(bm=64, bn=128, bk=128), tflops=1.0,
           extra={"speedup_vs_xla": 99.0})  # absurd stored claim
    db.save()
    rc = rv.main(["--trials", "1", "--target_ms", "2",
                  "--demote_below", "98.0"])  # force demotion
    assert rc == 0
    reset_default_db()
    entry = default_db().get_entry(64, 128, 128)
    assert "reverified_speedup" in entry
    assert entry["config"]["use_xla"]  # demoted to sentinel
    assert entry["demoted_from"]["bm"] == 64
    reset_default_db()


def test_aggregate_results(tmp_path, capsys):
    import scripts.aggregate_results as agg

    p = tmp_path / "s.csv"
    p.write_text("mnk,jnp.matmul,XLA-dot-max\n"
                 "64x64x64,1.2,1.0\n"
                 "128x128x128,0.9,1.1\n")
    rc = agg.main([str(p)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "jnp.matmul" in out and "1.0392x" in out  # geomean of 1.2, 0.9


def test_eval_server_csv_with_quality_columns(tmp_path, monkeypatch):
    """Server campaign rows carry the honesty columns (VERDICT r1 #3)."""
    import tpul2.harness.bench_suite as bs

    def fake_server(m, n, k, accs=("float32",), **kw):
        res = _fake_lean(m, n, k, accs=accs)
        res["mode"] = "server"
        res["per_func"] = {"xla_matmul": {"ms": 1.0, "iqr_ms": 0.05,
                                          "tflops": 1.0, "p99_ms": 1.2}}
        res["quality"] = "ok"
        return res

    monkeypatch.setattr(bs, "eval_shape_server_lean", fake_server)
    out = tmp_path / "server_{acc}.csv"
    rc = rs.main(["eval_server", "--dims", "64", "128", "--max_shapes", "2",
                  "--accs", "float32", "--out", str(out)])
    assert rc == 0
    with (tmp_path / "server_float32.csv").open() as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    assert rows[0]["quality"] == "ok"
    assert float(rows[0]["iqr_rel"]) == 0.05
    # resume skips done rows
    rc = rs.main(["eval_server", "--dims", "64", "128", "--max_shapes", "2",
                  "--accs", "float32", "--out", str(out)])
    assert rc == 0
    with (tmp_path / "server_float32.csv").open() as f:
        assert len(list(csv.DictReader(f))) == 2


def test_repair_drops_tainted_rows(tmp_path):
    p = tmp_path / "suite.csv"
    with p.open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=rs.CSV_COLUMNS)
        w.writeheader()
        base = {c: "1.05" for c in rs.CSV_COLUMNS[1:]}
        w.writerow(dict(base, mnk="64x64x64"))                   # healthy
        w.writerow(dict(base, mnk="128x512x1024",
                        **{"jnp.matmul": "0.0322"}))             # loss
        w.writerow(dict(base, mnk="256x64x64",
                        **{"jnp.matmul": "2.9"}))                # inconsistent
        w.writerow(dict(base, mnk="64x128x64",
                        **{"XLA-dot-tn": "0.95"}))               # mild loss
        w.writerow(dict(base, mnk="64x64x128",
                        **{"XLA-dot-tn": "0.85"}))               # hard loss
    dropped = rs._repair_csv(p, threshold=0.97)
    # mild (>=0.90) non-matmul losses are tolerated (honest noise on the
    # derived columns); matmul losses, hard losses, and inconsistent rows
    # are re-evaluated
    assert dropped == {"128x512x1024", "256x64x64", "64x64x128"}
    with p.open() as f:
        rows = list(csv.DictReader(f))
    assert [r["mnk"] for r in rows] == ["64x64x64", "64x128x64"]
    # idempotent on a clean file
    assert rs._repair_csv(p, threshold=0.97) == set()


def test_repair_implausible_rows_bypass_loss_cap(tmp_path):
    """A stall inside the candidate's trials sinks EVERY column together,
    which the ratio_cap test cannot see and the 1-shot loss budget cannot
    fix (observed round 5: a server row published at 0.0054x with iqr_rel
    3.9).  Such rows are measurement failures, not measurements — they get
    the inconsistency-class repair budget even when the loss budget is
    already exhausted."""
    import json

    p = tmp_path / "suite.csv"
    cols = rs.CSV_COLUMNS + ["iqr_rel", "quality"]

    def write(rows):
        with p.open("w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=cols)
            w.writeheader()
            w.writerows(rows)

    base = {c: "1.05" for c in cols[1:]}
    base["iqr_rel"] = "0.05"
    base["quality"] = "ok"
    stall = dict(base, mnk="64x128x64", iqr_rel="3.9",
                 **{c: "0.0054" for c in rs.CSV_COLUMNS[1:]})
    jitter = dict(base, mnk="64x256x64", iqr_rel="21.6")  # cols fine, IQR mad
    # loss budget already exhausted for both shapes
    (tmp_path / "suite.csv.repairs.json").write_text(json.dumps(
        {"64x128x64": {"loss": 1, "inconsistent": 0},
         "64x256x64": {"loss": 1, "inconsistent": 0}}))

    write([dict(base, mnk="64x64x64"), stall, jitter])
    assert rs._repair_csv(p) == {"64x128x64", "64x256x64"}

    # bounded: after max_inconsistent_repairs (3) drops, the row is kept
    for expect in ({"64x128x64"}, {"64x128x64"}, set()):
        write([dict(base, mnk="64x64x64"), stall])
        assert rs._repair_csv(p) == expect
    with p.open() as f:
        assert {r["mnk"] for r in csv.DictReader(f)} \
            == {"64x64x64", "64x128x64"}


def test_eval_explicit_shapes(tmp_path, monkeypatch):
    calls = []

    def fake_lean(m, n, k, **kw):
        calls.append((m, n, k))
        return _fake_lean(m, n, k, **kw)

    import tpul2.harness.bench_suite as bs
    monkeypatch.setattr(bs, "eval_shape_lean", fake_lean)
    out = tmp_path / "prio_{acc}.csv"
    rc = rs.main(["eval", "--shapes", "64,4096,512;16,8192,8192",
                  "--accs", "float32", "--no_mini_tune",
                  "--out", str(out)])
    assert rc == 0
    assert calls == [(64, 4096, 512), (16, 8192, 8192)]
    # resumable: second run skips both
    calls.clear()
    rc = rs.main(["eval", "--shapes", "64,4096,512;16,8192,8192",
                  "--accs", "float32", "--no_mini_tune",
                  "--out", str(out)])
    assert rc == 0 and calls == []


def test_parse_shapes_inline_and_file(tmp_path):
    assert rs._parse_shapes("64,4096,512;16,8192,8192") == \
        [(64, 4096, 512), (16, 8192, 8192)]
    f = tmp_path / "shapes.txt"
    f.write_text("# comment\n1,4096,4096\n\n64,4096,11008\n")
    assert rs._parse_shapes(f"@{f}") == [(1, 4096, 4096), (64, 4096, 11008)]
    # the checked-in serving suite parses
    shapes = rs._parse_shapes("@scripts/serving_shapes.txt")
    assert (64, 28672, 8192) in shapes and len(shapes) == 20


def test_eval_transfer_tune_mode(tmp_path, monkeypatch):
    """--tune_mode transfer: a win-band tail shape adopts the top adapted-
    neighbor Pallas config as its DB entry (zero-search), the eval's
    publication measurement refreshes its bookkeeping, and no mini-tune
    runs (VERDICT r2 — compile-budget mode for the expensive tail)."""
    import jax.numpy as jnp

    from tpul2.autotune import db as dbmod
    from tpul2.config import KernelConfig

    monkeypatch.setenv("TPUL2_TUNEDB", str(tmp_path / "db.json"))
    dbmod.reset_default_db()
    db = dbmod.default_db()
    # a nearby Pallas winner: 64x4096x64 (the tail shape is 64x8192x64)
    win = KernelConfig(bm=64, bn=4096, bk=64)
    db.put(64, 4096, 64, win, tflops=50.0,
           extra={"speedup_vs_xla": 1.5})
    db.save()

    tuned = []

    def fake_tune(*a, **kw):  # a mini-tune would be a bug in this mode
        tuned.append(a)

    def fake_lean(m, n, k, accs=("float32",), **kw):
        res = _fake_lean(m, n, k, accs=accs, **kw)
        res["per_func"] = {
            name: {"ms": 1.0 / v, "iqr_ms": 0.0, "tflops": v}
            for name, v in res["speedups"][accs[0]].items()}
        for acc in accs:
            res["per_func"][f"tpul2_{acc}"] = {"ms": 1.0, "iqr_ms": 0.0,
                                               "tflops": 77.0}
        return res

    import tpul2.autotune.search as search_mod
    import tpul2.harness.bench_suite as bs
    monkeypatch.setattr(search_mod, "tune_shape", fake_tune)
    monkeypatch.setattr(bs, "eval_shape_lean", fake_lean)

    out = tmp_path / "tail_{acc}.csv"
    rc = rs.main(["eval", "--shapes", "64,8192,64", "--accs", "float32",
                  "--tune_mode", "transfer", "--out", str(out)])
    assert rc == 0 and tuned == []
    entry = db.get_entry(64, 8192, 64, "float32")
    assert entry is not None
    assert entry["scope"] == "transfer"
    cfg = entry["config"]
    assert not cfg["use_xla"]
    # full-dim semantics transferred: bn follows the new n
    assert cfg["bn"] == 8192 and cfg["bm"] == 64 and cfg["bk"] == 64
    # bookkeeping refreshed from the (stubbed) publication measurement
    assert entry["tflops"] == 77.0
    dbmod.reset_default_db()


def test_seed_tail_entries_full_grid(tmp_path, monkeypatch):
    """scripts/seed_tail_entries.py materializes a DB entry for every
    grid shape x family (VERDICT r2 #4), honestly flagged as unmeasured,
    without disturbing existing measured entries."""
    from tpul2.autotune import db as db_mod
    monkeypatch.setenv("TPUL2_TUNEDB", str(tmp_path / "db.json"))
    db_mod.reset_default_db()
    from scripts.run_suite import REFERENCE_DIMS, grid
    from scripts.seed_tail_entries import main as seed_main
    from tpul2.config import KernelConfig
    db = db_mod.default_db()
    measured = KernelConfig(bm=64, bn=128, bk=128)
    db.put(64, 64, 64, measured, tflops=1.0, acc="float32",
           extra={"speedup_vs_xla": 1.2})
    db.save()
    assert seed_main([]) == 0
    db_mod.reset_default_db()
    db = db_mod.default_db()
    n_shapes = len(grid(REFERENCE_DIMS))
    assert len(db) == 2 * n_shapes
    # the pre-existing measured entry is untouched
    e = db.get_entry(64, 64, 64, "float32")
    assert e["speedup_vs_xla"] == 1.2 and "measured" not in e
    # a seeded entry is flagged unmeasured with neutral speedup
    e2 = db.get_entry(16384, 16384, 16384, "float32")
    assert e2["measured"] is False and e2["scope"] == "transfer_static"
    assert e2["speedup_vs_xla"] == 1.0


def test_cli_accepts_stratified_order(tmp_path, monkeypatch):
    """ADVICE r3 high #1: the driver scripts pass --order stratified; the
    argparse surface (not just grid()) must accept it for BOTH eval and
    eval_server, or every campaign chunk dies with rc=2."""
    import tpul2.harness.bench_suite as bs

    monkeypatch.setattr(bs, "eval_shape_lean",
                        lambda m, n, k, **kw: _fake_lean(m, n, k, **kw))

    def fake_server(m, n, k, accs=("float32",), **kw):
        res = _fake_lean(m, n, k, accs=accs)
        res["mode"] = "server"
        res["per_func"] = {"xla_matmul": {"ms": 1.0, "iqr_ms": 0.05,
                                          "tflops": 1.0, "p99_ms": 1.2}}
        res["quality"] = "ok"
        return res

    monkeypatch.setattr(bs, "eval_shape_server_lean", fake_server)

    out = tmp_path / "strat_{acc}.csv"
    rc = rs.main(["eval", "--dims", "64", "128", "--max_shapes", "3",
                  "--order", "stratified", "--accs", "float32",
                  "--no_mini_tune", "--out", str(out)])
    assert rc == 0
    with (tmp_path / "strat_float32.csv").open() as f:
        assert len(list(csv.DictReader(f))) == 3

    out2 = tmp_path / "strat_server_{acc}.csv"
    rc = rs.main(["eval_server", "--dims", "64", "128", "--max_shapes", "2",
                  "--order", "stratified", "--accs", "float32",
                  "--out", str(out2)])
    assert rc == 0
    with (tmp_path / "strat_server_float32.csv").open() as f:
        assert len(list(csv.DictReader(f))) == 2


def test_restore_exhausted_rows(tmp_path):
    """ADVICE r3 low #4: a repair-dropped row whose re-eval permanently
    fails must be restored from the journal backup, not silently vanish."""
    p = tmp_path / "suite.csv"
    with p.open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=rs.CSV_COLUMNS)
        w.writeheader()
        base = {c: "1.05" for c in rs.CSV_COLUMNS[1:]}
        w.writerow(dict(base, mnk="64x64x64"))
        w.writerow(dict(base, mnk="128x512x1024",
                        **{"jnp.matmul": "0.80"}))  # loss -> dropped
    dropped = rs._repair_csv(p, threshold=0.97)
    assert dropped == {"128x512x1024"}
    with p.open() as f:
        assert len(list(csv.DictReader(f))) == 1
    # re-eval failed twice -> the shape is in the exhausted-failures set
    restored = rs._restore_exhausted_rows(p, {"128x512x1024"})
    assert restored == 1
    with p.open() as f:
        rows = {r["mnk"]: r for r in csv.DictReader(f)}
    assert rows["128x512x1024"]["jnp.matmul"] == "0.80"
    # idempotent: already present -> nothing appended
    assert rs._restore_exhausted_rows(p, {"128x512x1024"}) == 0
