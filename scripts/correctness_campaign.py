#!/usr/bin/env python
"""Correctness campaign: every tuned Pallas config through the 0/1 gate.

The reference validates each shipped kernel with the 0/1 exactness gate +
guard-band canary before its row enters the published CSVs
(zero_one_correctness_check.py, run fatally first by eval_one_file.sh:71-80).
tpul2's suite-scale eval (bench_suite.eval_shape_lean) screens its XLA
sentinels inline but relies on the tuner's finalist screen for Pallas
winners; this tool closes the loop: it sweeps EVERY non-sentinel DB entry —
the actual shipped product — through the full gate semantics in Pallas
interpret mode on CPU (the repo's sanitizer: out-of-bounds block reads are
hard errors there, and the padded-region canary checks the write side).

Runs entirely on CPU — it can execute alongside a TPU campaign.

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/correctness_campaign.py \
      --db tpul2/data/tunedb_v5e.json --out eval_results/correctness_campaign.json

Large configs are capped by interpret-mode cost (grid steps / flops) and
reported as skipped — coverage is explicit, never silently truncated.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--db", default="tpul2/data/tunedb_v5e.json")
    ap.add_argument("--out", default="eval_results/correctness_campaign.json")
    ap.add_argument("--iterations", type=int, default=2)
    ap.add_argument("--max_steps", type=int, default=512,
                    help="skip configs whose grid exceeds this many "
                         "interpret-mode steps")
    ap.add_argument("--max_flops", type=float, default=2.0 * (1 << 31))
    ap.add_argument("--only_failures", action="store_true",
                    help="print only failing entries")
    args = ap.parse_args(argv)

    import jax
    if jax.default_backend() != "cpu":
        print("warning: not on CPU backend — interpret mode is forced "
              "per-call, results still valid", file=sys.stderr)
    import jax.numpy as jnp

    from tpul2.autotune.db import TuneDB
    from tpul2.config import KernelConfig
    from tpul2.dispatch import matmul
    from tpul2.harness.correctness import canary_check, compare_with_cpu_f32

    db = TuneDB(path=args.db).load()
    results, failures, skipped = [], [], []
    t0 = time.time()
    for (m, n, k), acc, entry in sorted(db.items()):
        cfg_d = entry.get("config") or {}
        if cfg_d.get("use_xla"):
            continue  # sentinels are screened inline by the eval campaign
        cfg = KernelConfig(**cfg_d)
        steps = (math.ceil(m / cfg.bm) * math.ceil(n / cfg.bn)
                 * math.ceil(k / cfg.bk))
        if steps > args.max_steps or 2.0 * m * n * k > args.max_flops:
            skipped.append({"mnk": f"{m}x{n}x{k}", "acc": acc,
                            "steps": steps})
            continue

        def cand(a, b, b_t, _cfg=cfg, _acc=acc):
            return matmul(a, b, acc=_acc, config=_cfg, b_t=b_t,
                          interpret=True)

        stats = compare_with_cpu_f32(
            m, n, k, acc=acc, iterations=args.iterations,
            funcs={"tpul2": cand})
        canary = canary_check(m, n, k, config=cfg, acc=acc)
        diff = stats["avg_max_diff"]["tpul2"]
        ok = (diff == 0.0 and not stats["nan_or_inf"]["tpul2"]
              and canary["pass"])
        rec = {"mnk": f"{m}x{n}x{k}", "acc": acc, "steps": steps,
               "avg_max_diff": diff, "canary_pass": canary["pass"],
               "pass": ok}
        results.append(rec)
        if not ok:
            failures.append(rec)
        if not args.only_failures or not ok:
            print(f"{m}x{n}x{k}/{acc}: "
                  f"{'PASS' if ok else 'FAIL diff=' + repr(diff)}",
                  file=sys.stderr)

    summary = {
        "checked": len(results),
        "passed": sum(r["pass"] for r in results),
        "failed": [r for r in failures],
        "skipped": skipped,
        "iterations": args.iterations,
        "elapsed_s": round(time.time() - t0, 1),
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps({"summary": summary, "results": results},
                              indent=1))
    print(f"correctness campaign: {summary['passed']}/{summary['checked']} "
          f"pass, {len(skipped)} skipped (interpret cost cap), "
          f"{summary['elapsed_s']}s", file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
