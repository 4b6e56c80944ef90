#!/usr/bin/env python
"""Re-verify stored tuning wins against the XLA sentinel; demote fakes.

VERDICT r1 Weak #4 / next-round #7: commit-time tuning claims must reproduce
under the round benchmark's methodology or be demoted.  For every non-
sentinel DB entry this script re-times the stored winner vs stock XLA with
the chained difference-of-reps method (fresh on-device data, shuffled order,
median of N trials), records the reproduced speedup + trial count in the
entry, and — when the win does not reproduce beyond the demotion threshold —
replaces the config with the never-lose XLA sentinel (keeping the demoted
config in the entry for forensics).

Usage:
  python scripts/reverify_db.py [--acc float32] [--demote_below 1.0]
      [--trials 8] [--max_shapes N] [--dry_run]
"""

from __future__ import annotations

import argparse
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--acc", default=None,
                    choices=[None, "float32", "bfloat16"])
    ap.add_argument("--trials", type=int, default=8)
    ap.add_argument("--target_ms", type=float, default=120.0)
    ap.add_argument("--demote_below", type=float, default=1.0,
                    help="reproduced speedup below this -> sentinel")
    ap.add_argument("--max_shapes", type=int, default=None)
    ap.add_argument("--dry_run", action="store_true")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from tpul2.autotune.db import default_db
    from tpul2.autotune.search import _make_fn
    from tpul2.config import KernelConfig
    from tpul2.harness import bench_utils as bu
    from tpul2.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    db = default_db()
    keys = []
    for key in db.keys():
        mnk, acc, dt = key.split("/")
        if args.acc and acc != args.acc:
            continue
        e = db.get_entry(*map(int, mnk.split("_")), acc=acc, in_dtype=dt)
        if KernelConfig(**e["config"]).use_xla:
            continue
        keys.append((key, e))
    if args.max_shapes:
        keys = keys[:args.max_shapes]
    print(f"re-verifying {len(keys)} stored wins", file=sys.stderr)

    rng = np.random.default_rng(0)
    demoted = kept = 0
    t0 = time.time()
    for key, e in keys:
        mnk, acc, dt = key.split("/")
        m, n, k = map(int, mnk.split("_"))
        cfg = KernelConfig(**e["config"])
        in_dtype = jnp.dtype(dt)
        try:
            cand = _make_fn(cfg, in_dtype, interpret=False)
            xla = _make_fn(KernelConfig.xla(), in_dtype, interpret=False)
            data0 = bu.fresh_inputs(rng, m, n, k, in_dtype)
            est = bu.estimate_per_call_ms(xla, data0, m, n, k, in_dtype)
            reps = bu.pick_reps(est, target_ms=args.target_ms)
            timers = {"cand": bu.ChainedTimer(cand, m, n, k, in_dtype, reps),
                      "xla": bu.ChainedTimer(xla, m, n, k, in_dtype, reps)}
            for t in timers.values():
                t.warmup(data0)
            trials = {name: [] for name in timers}
            order = list(timers)
            for _ in range(args.trials):
                data = bu.fresh_inputs(rng, m, n, k, in_dtype)
                random.shuffle(order)
                for name in order:
                    trials[name].append(timers[name].measure(data))
            phys = bu.physical_min_ms(m, n, k, in_dtype)
            ms = {name: bu.ChainedTimer.per_call_ms(
                trials[name], timers[name].reps_lo, timers[name].reps_hi,
                phys_min_ms=phys) for name in timers}
        except Exception as ex:
            print(f"{key}: reverify FAILED ({type(ex).__name__}: "
                  f"{str(ex)[:120]}) -> demoting", file=sys.stderr)
            ms = None

        if ms is None:
            reproduced = 0.0
        else:
            reproduced = ms["xla"] / ms["cand"]
        stored = e.get("speedup_vs_xla", float("nan"))
        extra = dict(e)
        extra.pop("config", None)
        extra.pop("tflops", None)
        extra["reverified_speedup"] = round(reproduced, 4)
        extra["reverify_trials"] = args.trials
        if reproduced < args.demote_below:
            demoted += 1
            extra["demoted_from"] = e["config"]
            new_cfg = KernelConfig.xla()
            tflops = (bu.tflops(m, n, k, ms["xla"]) if ms else
                      e.get("xla_tflops", 0.0))
            print(f"{key}: stored {stored:.3f}x -> reproduced "
                  f"{reproduced:.3f}x  DEMOTED", file=sys.stderr)
        else:
            kept += 1
            new_cfg = cfg
            tflops = bu.tflops(m, n, k, ms["cand"])
            print(f"{key}: stored {stored:.3f}x -> reproduced "
                  f"{reproduced:.3f}x  kept", file=sys.stderr)
        if not args.dry_run:
            db.put(m, n, k, new_cfg, tflops, acc=acc, in_dtype=dt,
                   extra=extra)
            db.save()
    print(f"done in {time.time()-t0:.0f}s: {kept} kept, {demoted} demoted",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
