#!/usr/bin/env python
"""Evaluate one (M, N, K) shape: correctness gate → benchmarks → summary.

Port of the reference driver eval_one_file.sh (SURVEY.md C1): parse flags,
wipe stale benchmark results, run the 0/1 correctness gate and ABORT on
failure, then benchmark the candidate against each of the 7 baselines in
shuffled order (offline or server mode), aborting on any failure, and
finally summarize.  One Python process instead of 9 (the reference re-JIT-
compiles its CUDA extension per process; our compiled kernels are cached
in-process and in the persistent XLA compile cache, so process isolation
buys nothing — pass --isolate to restore per-baseline subprocesses anyway).

Usage:
  python scripts/eval_one_shape.py --mnk 4096 4096 4096 --acc float32 \
      --mode offline --warmup_seconds 2 --benchmark_seconds 10 \
      --base_dir /tmp/eval_4096
"""

from __future__ import annotations

import argparse
import json
import random
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mnk", type=int, nargs=3, required=True,
                    metavar=("M", "N", "K"))
    ap.add_argument("--acc", choices=["float32", "bfloat16"],
                    default="float32",
                    help="accumulator family (ref: F32F16F16F32 / "
                         "F16F16F16F16)")
    ap.add_argument("--mode", choices=["offline", "server"],
                    default="offline")
    ap.add_argument("--target_qps", type=float, default=None,
                    help="required in server mode")
    ap.add_argument("--warmup_seconds", type=float, default=2.0)
    ap.add_argument("--benchmark_seconds", type=float, default=10.0)
    ap.add_argument("--base_dir", type=str, required=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--correctness_seconds", type=float, default=60.0)
    ap.add_argument("--correctness_iters", type=int, default=100)
    ap.add_argument("--skip_correctness", action="store_true")
    ap.add_argument("--gate_first", action="store_true",
                    help="run the correctness gate BEFORE the benchmarks "
                         "(the reference's order).  Default is gate-last: "
                         "the gate's device->host transfers permanently "
                         "degrade fenced-call latency on tunneled TPU "
                         "backends, so benchmarks run on a clean session "
                         "first; a gate failure still fails the whole run "
                         "and discards its results.")
    ap.add_argument("--isolate", action="store_true",
                    help="one subprocess per baseline (reference behavior)")
    ap.add_argument("--defend", action="store_true",
                    help="run the benchmark-integrity defenses on the "
                         "candidate before summarizing (SURVEY.md C8)")
    ap.add_argument("--perf_funcs", nargs="*", default=None,
                    help="subset of baselines (default: all 7)")
    args = ap.parse_args(argv)
    if args.mode == "server" and not args.target_qps:
        ap.error("--target_qps is required in server mode")
    return args


def main(argv=None) -> int:
    args = parse_args(argv)
    m, n, k = args.mnk
    base = Path(args.base_dir)
    base.mkdir(parents=True, exist_ok=True)
    # Wipe stale results (ref eval_one_file.sh:69).
    for f in base.glob("benchmark_result_*.json"):
        f.unlink()

    from tpul2.ops.baselines import BASELINES
    from tpul2.harness.correctness import run_correctness_check
    from tpul2.harness.bench_offline import benchmark_offline
    from tpul2.harness.bench_server import benchmark_server
    from tpul2.harness.summarize import summarize_results

    # --- correctness gate: hard abort on failure (ref :71-80) ---
    def run_gate() -> bool:
        res = run_correctness_check(
            m, n, k, acc=args.acc,
            iterations=args.correctness_iters,
            time_cap_s=args.correctness_seconds,
            seed=args.seed,
            result_path=str(base / "zero_one_correctness_check_result.json"))
        if not res["pass"]:
            print(f"correctness check FAILED: {res.get('failure')}",
                  file=sys.stderr)
            # discard benchmark results of a failed candidate (fail-fast
            # semantics preserved even in gate-last order)
            for f in base.glob("benchmark_result_*.json"):
                f.unlink()
            return False
        print(f"correctness check passed "
              f"({res['stats']['iterations']} iterations, "
              f"density={res['stats']['density']:.3f})")
        return True

    if not args.skip_correctness and args.gate_first:
        if not run_gate():
            return 1

    # --- benchmarks, shuffled baseline order (ref :82-96) ---
    perf_funcs = args.perf_funcs or list(BASELINES)
    random.Random(args.seed).shuffle(perf_funcs)

    if not args.isolate:
        # Amortized path: candidate + all baselines in ONE loop with
        # per-iteration shuffled order (see harness.bench_offline._run_mode
        # for why per-baseline processes are prohibitive on tunneled
        # backends).
        from tpul2.harness.bench_offline import benchmark_offline_all
        from tpul2.harness.bench_server import benchmark_server_all
        try:
            if args.mode == "server":
                results = benchmark_server_all(
                    m, n, k, target_qps=args.target_qps,
                    perf_funcs=perf_funcs, acc=args.acc,
                    warmup_seconds=args.warmup_seconds,
                    benchmark_seconds=args.benchmark_seconds,
                    base_dir=str(base), seed=args.seed)
            else:
                results = benchmark_offline_all(
                    m, n, k, perf_funcs=perf_funcs, acc=args.acc,
                    warmup_seconds=args.warmup_seconds,
                    benchmark_seconds=args.benchmark_seconds,
                    base_dir=str(base), seed=args.seed)
        except Exception as e:  # fail-fast (ref :127-130)
            print(f"benchmark failed: {e}", file=sys.stderr)
            return 1
        for func in perf_funcs:
            r = results[func]
            print(f"{func}: speedup {r['speedup']:.4f}x "
                  f"({r['tpul2']['tflops_median']:.2f} vs "
                  f"{r[func]['tflops_median']:.2f} TFLOPS)")
        perf_funcs_done = True
    else:
        perf_funcs_done = False

    for func in (perf_funcs if not perf_funcs_done else []):
        if args.isolate:
            cmd = [sys.executable, __file__,
                   "--mnk", str(m), str(n), str(k),
                   "--acc", args.acc, "--mode", args.mode,
                   "--base_dir", args.base_dir,
                   "--warmup_seconds", str(args.warmup_seconds),
                   "--benchmark_seconds", str(args.benchmark_seconds),
                   "--seed", str(args.seed),
                   "--skip_correctness", "--perf_funcs", func]
            if args.target_qps:
                cmd += ["--target_qps", str(args.target_qps)]
            rc = subprocess.call(cmd)
            if rc != 0:
                print(f"benchmark {func} failed (rc={rc})", file=sys.stderr)
                return 1
            continue
        try:
            if args.mode == "server":
                r = benchmark_server(
                    m, n, k, func, target_qps=args.target_qps,
                    acc=args.acc, warmup_seconds=args.warmup_seconds,
                    benchmark_seconds=args.benchmark_seconds,
                    base_dir=str(base), seed=args.seed)
            else:
                r = benchmark_offline(
                    m, n, k, func, acc=args.acc,
                    warmup_seconds=args.warmup_seconds,
                    benchmark_seconds=args.benchmark_seconds,
                    base_dir=str(base), seed=args.seed)
        except Exception as e:  # fail-fast (ref :127-130)
            print(f"benchmark {func} failed: {e}", file=sys.stderr)
            return 1
        print(f"{func}: speedup {r['speedup']:.4f}x "
              f"({r['tpul2']['tflops_mean']:.2f} vs "
              f"{r[func]['tflops_mean']:.2f} TFLOPS)")

    # In isolate-child mode (single perf_func, skip_correctness), don't
    # summarize — the parent will.
    if args.skip_correctness and args.perf_funcs and len(args.perf_funcs) == 1:
        return 0

    # --- gate-last (default): benchmarks ran on a clean session above ---
    if not args.skip_correctness and not args.gate_first:
        if not run_gate():
            return 1

    # --- benchmark-integrity defenses on the candidate (ref C8) ---
    if args.defend:
        import jax.numpy as jnp
        import numpy as np

        from tpul2.dispatch import candidate_fn
        from tpul2.harness.bench_utils import fresh_inputs
        from tpul2.harness.defense import run_all_defenses
        data = fresh_inputs(np.random.default_rng(args.seed), m, n, k)
        dres = run_all_defenses(candidate_fn(args.acc), tuple(data),
                                expected_dtype=jnp.bfloat16,
                                expected_shape=(m, n))
        (base / "defense_result.json").write_text(
            json.dumps(dres, indent=1, default=str))
        if not dres["pass"]:
            print("defense checks FAILED:", file=sys.stderr)
            for r in dres["defenses"]:
                if not r["pass"]:
                    print(f"  {r['name']}: {r}", file=sys.stderr)
            return 1
        print(f"defense checks passed ({len(dres['defenses'])} defenses)")

    # --- summary (ref :135) ---
    md = summarize_results(str(base), write_path=str(base / "summary.md"))
    print()
    print(md)
    from tpul2.harness.summarize import speedup_row
    (base / "speedup_row.json").write_text(
        json.dumps(speedup_row(str(base), (m, n, k)), indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
