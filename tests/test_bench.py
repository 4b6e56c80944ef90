"""Benchmark harness tests (C5/C6/C7 parity) — tiny time budgets on CPU."""

import json
import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from tpul2.harness import bench_utils as bu
from tpul2.harness.bench_offline import benchmark_offline
from tpul2.harness.bench_server import benchmark_server
from tpul2.harness.summarize import speedup_row, summarize_results


def test_chained_timer_and_tflops():
    rng = np.random.default_rng(0)
    data = bu.fresh_inputs(rng, 32, 128, 128)
    a, b, b_t = data
    assert a.shape == (32, 128) and b.shape == (128, 128)
    assert b_t.shape == (128, 128)

    def fn(a, b, b_t):
        return jnp.matmul(a, b)

    est = bu.estimate_per_call_ms(fn, data, 32, 128, 128, jnp.bfloat16,
                                  probe_reps=8)
    assert est > 0
    t = bu.ChainedTimer(fn, 32, 128, 128, jnp.bfloat16, reps=16)
    t.warmup(data)
    trials = [t.measure(data) for _ in range(3)]
    ms = bu.ChainedTimer.per_call_ms(trials, t.reps_lo, t.reps_hi)
    assert ms > 0
    assert bu.tflops(1024, 1024, 1024, 1.0) == pytest.approx(2.147, abs=0.01)


def test_chained_runner_adapts_all_shape_cases():
    # chaining must work when n >= k and when n < k (tile path)
    rng = np.random.default_rng(1)
    for (m, n, k) in [(16, 256, 128), (16, 128, 512)]:
        data = bu.fresh_inputs(rng, m, n, k)

        def fn(a, b, b_t):
            return jnp.matmul(a, b)

        run = bu.make_chained_runner(fn, m, n, k, jnp.bfloat16, reps=3)
        out = run(*data)
        assert out.shape == (m, k)
        assert out.dtype == jnp.bfloat16


def test_offline_writes_result(tmp_path):
    r = benchmark_offline(32, 128, 128, "xla_matmul",
                          warmup_seconds=0.2, benchmark_seconds=0.5,
                          base_dir=str(tmp_path))
    f = tmp_path / "benchmark_result_xla_matmul.json"
    assert f.exists()
    saved = json.loads(f.read_text())
    assert saved["speedup"] > 0
    assert saved["tpul2"]["iters"] >= 1
    assert saved["xla_matmul"]["tflops_mean"] > 0
    assert saved["version"] == bu.VERSION_STAMP


def test_server_mode_poisson(tmp_path):
    r = benchmark_server(32, 128, 128, "xla_dot_nn", target_qps=50.0,
                         warmup_seconds=0.2, benchmark_seconds=0.7,
                         base_dir=str(tmp_path))
    assert r["mode"] == "server"
    assert r["target_qps"] == 50.0
    assert "p99_ms" in r["tpul2"]


def test_server_requires_qps():
    with pytest.raises(ValueError):
        benchmark_server(32, 128, 128, "xla_matmul", target_qps=0)


def test_unknown_perf_func():
    with pytest.raises(ValueError):
        benchmark_offline(32, 128, 128, "cublas")


def test_summarize_and_max_rows(tmp_path):
    # Synthesize results for a tn/nn pair with different speedups; the -max
    # row must take the one LESS favorable to the candidate (C7 :43-53).
    def fake(func, speedup):
        return {
            "mode": "offline", "mnk": [64, 64, 64], "acc": "float32",
            "in_dtype": "bfloat16", "perf_func": func,
            "version": bu.VERSION_STAMP,
            "speedup": speedup,
            func: {"tflops_mean": 1.0, "mean_ms": 1.0, "iters": 5},
            "tpul2": {"tflops_mean": speedup, "mean_ms": 1.0 / speedup,
                      "iters": 5},
        }

    for func, s in [("xla_dot_nn", 1.30), ("xla_dot_tn", 1.10),
                    ("xla_matmul", 1.20)]:
        (tmp_path / f"benchmark_result_{func}.json").write_text(
            json.dumps(fake(func, s)))

    md = summarize_results(str(tmp_path), write_path=str(tmp_path / "s.md"))
    assert "XLA-dot-max" in md
    assert "1.1000x" in md  # worst case of (1.30, 1.10)
    assert (tmp_path / "s.md").exists()

    row = speedup_row(str(tmp_path), (64, 64, 64))
    assert row["mnk"] == "64x64x64"
    assert row["XLA-dot-max"] == pytest.approx(1.10)
    assert row["jnp.matmul"] == pytest.approx(1.20)


def test_eval_one_shape_cli(tmp_path):
    # End-to-end driver: gate -> 2 baselines -> summary (fail-fast pipeline).
    import scripts.eval_one_shape as drv

    rc = drv.main(["--mnk", "32", "128", "128", "--base_dir", str(tmp_path),
                   "--warmup_seconds", "0.1", "--benchmark_seconds", "0.3",
                   "--correctness_iters", "2",
                   "--perf_funcs", "xla_matmul", "xla_dot_nn"])
    assert rc == 0
    assert (tmp_path / "summary.md").exists()
    assert (tmp_path / "zero_one_correctness_check_result.json").exists()
    row = json.loads((tmp_path / "speedup_row.json").read_text())
    assert row["mnk"] == "32x128x128"


def test_chained_adapter_value_correct_all_branches():
    """The anti-dedup/anti-narrowing adapters must not change VALUES:
    guard terms are exactly 0 for finite data, and the dus window writes c
    where expected."""
    rng = np.random.default_rng(7)
    for (m, n, k) in [(16, 256, 128), (16, 128, 128), (16, 128, 512)]:
        data = bu.fresh_inputs(rng, m, n, k)

        def fn(a, b, b_t):
            return jnp.matmul(a, b)

        run = bu.make_chained_runner(fn, m, n, k, jnp.bfloat16, reps=1)
        out = np.asarray(run(*data), np.float32)
        a, b, _ = data
        c = np.asarray(jnp.matmul(a, b), np.float32)
        if n > k:
            np.testing.assert_array_equal(out, c[:, :k])
        elif n == k:
            np.testing.assert_array_equal(out, c)
        else:  # dus window at offset 0 on the first iteration
            expect = np.asarray(a, np.float32).copy()
            expect[:, :n] = c
            np.testing.assert_array_equal(out, expect)


def test_eval_shape_lean_derives_sentinel_entries(tmp_path, monkeypatch):
    """The campaign evaluator fills missing DB entries from its own
    baseline measurements (exactness-screened best variant) and publishes
    phase-2 columns for every baseline."""
    import tpul2.autotune.db as db_mod
    from tpul2.harness.bench_suite import eval_shape_lean

    monkeypatch.setenv("TPUL2_TUNEDB", str(tmp_path / "db.json"))
    db_mod.reset_default_db()
    db = db_mod.default_db()
    res = eval_shape_lean(16, 128, 128, accs=("float32", "bfloat16"),
                          trials=1, sel_trials=1, target_ms=2.0, db=db)
    for acc in ("float32", "bfloat16"):
        entry = db.get_entry(16, 128, 128, acc)
        assert entry is not None and entry["config"]["use_xla"]
        assert entry["scope"] == "sentinels"
        assert entry["timing_rev"] >= 2
    for col in ("tpul2_float32", "tpul2_bfloat16", "xla_matmul",
                "xla_autotuned_nn", "xla_autotuned_tn"):
        assert res["per_func"][col]["ms"] > 0
    assert "variant" in res["per_func"]["xla_autotuned_nn"]
    db_mod.reset_default_db()


def test_bench_py_emits_json_line(tmp_path, monkeypatch):
    """bench.py (the round headline) runs the campaign methodology and
    prints exactly one JSON line."""
    import importlib.util
    import io
    import json as _json
    import sys as _sys

    monkeypatch.setenv("TPUL2_TUNEDB", str(tmp_path / "db.json"))
    monkeypatch.setenv("TPUL2_BENCH_SHAPES", "16,128,128;32,128,64")
    monkeypatch.setenv("TPUL2_BENCH_TRIALS", "1")
    # run the measurement in-process: the retry wrapper would spawn a
    # subprocess that re-inits the (possibly axon-pinned) backend
    monkeypatch.setenv("TPUL2_BENCH_INNER", "1")
    import tpul2.autotune.db as db_mod
    db_mod.reset_default_db()
    spec = importlib.util.spec_from_file_location(
        "bench_main", str(pathlib.Path(__file__).parent.parent / "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    cap = io.StringIO()
    monkeypatch.setattr(_sys, "stdout", cap)
    assert mod.main() == 0
    monkeypatch.undo()
    lines = [l for l in cap.getvalue().splitlines() if l.startswith("{")]
    assert len(lines) == 1
    payload = _json.loads(lines[0])
    assert payload["metric"] == "geomean_speedup_vs_xla_dot"
    assert payload["value"] > 0
    assert set(payload["shapes"]) == {"16x128x128", "32x128x64"}
    db_mod.reset_default_db()


def test_bench_py_retries_on_transient_pool_failure(monkeypatch, capsys):
    """VERDICT r3 next-round #2: a TPU-pool outage window (UNAVAILABLE at
    backend init) must be retried with backoff, not zero the round
    artifact; a real code failure must NOT be retried."""
    import importlib.util
    import subprocess
    import types

    monkeypatch.delenv("TPUL2_BENCH_INNER", raising=False)
    monkeypatch.setenv("TPUL2_BENCH_RETRIES", "3")
    monkeypatch.setenv("TPUL2_BENCH_RETRY_BASE_S", "0")
    spec = importlib.util.spec_from_file_location(
        "bench_main2", str(pathlib.Path(__file__).parent.parent / "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    calls = []

    def fake_run_transient_then_ok(cmd, env=None, capture_output=True,
                                   text=True):
        calls.append(env.get("TPUL2_BENCH_INNER"))
        if len(calls) < 3:
            return types.SimpleNamespace(
                returncode=1, stdout="",
                stderr="RuntimeError: Unable to initialize backend 'axon': "
                       "UNAVAILABLE: TPU backend setup/compile error")
        return types.SimpleNamespace(returncode=0,
                                     stdout='{"metric": "x"}\n', stderr="")

    monkeypatch.setattr(subprocess, "run", fake_run_transient_then_ok)
    assert mod.main() == 0
    assert calls == ["1", "1", "1"]  # inner flag set, retried twice
    assert '{"metric": "x"}' in capsys.readouterr().out

    calls.clear()

    def fake_run_hard_failure(cmd, env=None, capture_output=True, text=True):
        calls.append(1)
        return types.SimpleNamespace(returncode=1, stdout="",
                                     stderr="TypeError: bad code")

    monkeypatch.setattr(subprocess, "run", fake_run_hard_failure)
    assert mod.main() == 1
    assert len(calls) == 1  # no retry on a non-transient failure


def test_eval_shape_server_lean_end_to_end():
    """Server-mode lean eval on CPU: structure, phase-split derived
    columns, and the quality flag."""
    from tpul2.harness.bench_suite import eval_shape_server_lean

    res = eval_shape_server_lean(64, 64, 64, accs=("float32",),
                                 n_requests=4, request_ms=2.0)
    assert res["mode"] == "server"
    assert res["quality"] in ("ok", "floor_limited")
    pf = res["per_func"]
    assert pf["tpul2_float32"]["ms"] > 0
    for derived in ("xla_autotuned_nn", "xla_autotuned_tn"):
        assert pf[derived]["variant"] in pf
    sp = res["speedups"]["float32"]
    assert set(sp) >= {"xla_matmul", "xla_autotuned_nn", "xla_autotuned_tn"}
    assert all(v > 0 for v in sp.values())
