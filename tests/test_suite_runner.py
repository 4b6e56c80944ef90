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


def _fake_results(m, n, k, speedups):
    out = {}
    for fn, s in speedups.items():
        out[fn] = {"speedup": s, "mnk": [m, n, k]}
    return out


def test_eval_csv_written(tmp_path, monkeypatch):
    calls = []

    def fake_all(m, n, k, **kw):
        calls.append((m, n, k))
        return _fake_results(m, n, k, {
            "xla_matmul": 1.2,
            "xla_dot_nn": 1.3, "xla_dot_tn": 1.1,
            "xla_highest_nn": 1.4, "xla_highest_tn": 1.5,
            "xla_autotuned_nn": 1.05, "xla_autotuned_tn": 1.15,
        })

    import tpul2.harness.bench_offline as bo
    monkeypatch.setattr(bo, "benchmark_offline_all", fake_all)

    out = tmp_path / "suite.csv"
    rc = rs.main(["eval", "--dims", "64", "128", "--max_shapes", "4",
                  "--out", str(out)])
    assert rc == 0
    with out.open() as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 4
    r = rows[0]
    assert r["jnp.matmul"] == "1.2"
    # -max rows take the candidate-worst layout (C7 parity)
    assert r["XLA-dot-max"] == "1.1"
    assert r["XLA-highest-max"] == "1.4"
    assert r["XLA-AutoTuned-max"] == "1.05"

    # resume: second run skips all existing rows
    calls.clear()
    rc = rs.main(["eval", "--dims", "64", "128", "--max_shapes", "4",
                  "--out", str(out)])
    assert rc == 0
    assert calls == []


def test_eval_failure_fails_fast(tmp_path, monkeypatch):
    import tpul2.harness.bench_offline as bo

    def boom(*a, **kw):
        raise RuntimeError("kaput")

    monkeypatch.setattr(bo, "benchmark_offline_all", boom)
    rc = rs.main(["eval", "--dims", "64", "--max_shapes", "1",
                  "--out", str(tmp_path / "x.csv")])
    assert rc == 1


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
