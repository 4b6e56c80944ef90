"""Harness CLI — argparse front-ends for each harness component.

CLI-surface parity with the reference's standalone scripts (SURVEY.md L4:
zero_one_correctness_check.py, benchmarking_offline.py,
benchmarking_server.py, summarize_result.py — each an argparse CLI):

  python -m tpul2.harness correctness --mnk 512 512 512 --acc float32
  python -m tpul2.harness offline --mnk 4096 4096 4096 \
      --perf_func xla_matmul --base_dir /tmp/out
  python -m tpul2.harness server  --mnk 64 8192 8192 \
      --perf_func xla_autotuned_nn --target_qps 20 --base_dir /tmp/out
  python -m tpul2.harness summarize --base_dir /tmp/out
  python -m tpul2.harness defend --mnk 512 512 512 --acc float32
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="python -m tpul2.harness",
                                 description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    def add_shape(p):
        p.add_argument("--mnk", type=int, nargs=3, required=True,
                       metavar=("M", "N", "K"))
        p.add_argument("--acc", choices=["float32", "bfloat16"],
                       default="float32")

    c = sub.add_parser("correctness")
    add_shape(c)
    c.add_argument("--iterations", type=int, default=100)
    c.add_argument("--seconds", type=float, default=60.0)
    c.add_argument("--result_path", type=str, default=None)

    for mode in ("offline", "server"):
        b = sub.add_parser(mode)
        add_shape(b)
        b.add_argument("--perf_func", type=str, required=True)
        b.add_argument("--warmup_seconds", type=float, default=2.0)
        b.add_argument("--benchmark_seconds", type=float, default=10.0)
        b.add_argument("--base_dir", type=str, default=None)
        if mode == "server":
            b.add_argument("--target_qps", type=float, required=True)

    s = sub.add_parser("summarize")
    s.add_argument("--base_dir", type=str, required=True)
    s.add_argument("--out", type=str, default=None)

    d = sub.add_parser("defend")
    add_shape(d)

    pr = sub.add_parser("profile")
    add_shape(pr)
    pr.add_argument("--trace_dir", type=str, default=None)
    pr.add_argument("--trials", type=int, default=5)

    args = ap.parse_args(argv)

    if args.cmd == "correctness":
        from tpul2.harness.correctness import run_correctness_check
        m, n, k = args.mnk
        res = run_correctness_check(m, n, k, acc=args.acc,
                                    iterations=args.iterations,
                                    time_cap_s=args.seconds,
                                    result_path=args.result_path)
        print(json.dumps(res, indent=1, default=str))
        return 0 if res["pass"] else 1

    if args.cmd in ("offline", "server"):
        m, n, k = args.mnk
        if args.cmd == "offline":
            from tpul2.harness.bench_offline import benchmark_offline
            r = benchmark_offline(m, n, k, args.perf_func, acc=args.acc,
                                  warmup_seconds=args.warmup_seconds,
                                  benchmark_seconds=args.benchmark_seconds,
                                  base_dir=args.base_dir)
        else:
            from tpul2.harness.bench_server import benchmark_server
            r = benchmark_server(m, n, k, args.perf_func,
                                 target_qps=args.target_qps, acc=args.acc,
                                 warmup_seconds=args.warmup_seconds,
                                 benchmark_seconds=args.benchmark_seconds,
                                 base_dir=args.base_dir)
        print(json.dumps(r, indent=1))
        return 0

    if args.cmd == "summarize":
        from tpul2.harness.summarize import summarize_results
        print(summarize_results(args.base_dir, write_path=args.out))
        return 0

    if args.cmd == "profile":
        from tpul2.harness.profiling import profile_shape
        m, n, k = args.mnk
        print(json.dumps(profile_shape(m, n, k, acc=args.acc,
                                       trials=args.trials,
                                       trace_dir=args.trace_dir),
                         indent=1, default=str))
        return 0

    if args.cmd == "defend":
        import jax.numpy as jnp

        from tpul2.dispatch import candidate_fn
        from tpul2.harness.bench_utils import fresh_inputs
        from tpul2.harness.defense import run_all_defenses
        import numpy as np
        m, n, k = args.mnk
        data = fresh_inputs(np.random.default_rng(0), m, n, k)
        res = run_all_defenses(candidate_fn(args.acc), tuple(data),
                               expected_dtype=jnp.bfloat16,
                               expected_shape=(m, n))
        print(json.dumps(res, indent=1, default=str))
        return 0 if res["pass"] else 1

    return 2


if __name__ == "__main__":
    sys.exit(main())
