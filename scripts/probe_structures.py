#!/usr/bin/env python
"""On-chip probe of the round-3 kernel structures (TPU window tool).

For each probe shape, measures with the suite's lean methodology
(calibrated reps, interleaved shuffled trials, median-of-trials):
  - the dispatched candidate (TuneDB config),
  - stock jnp.matmul,
  - the best stored/neighbor Pallas tiling re-run through the manually
    staged pipeline at each --depths value (VERDICT r2 next-round #3b),
  - for unaligned shapes: the masked-edge twin of the tiling (#3a),
and reports each row's distance to the HBM/MXU roofline — the "measured
upper bound" BENCH_NOTES needs if a structure can't win.

Writes one JSON line per shape to --out (default stdout).

Usage:
  python scripts/probe_structures.py --shapes '64,8192,8192;128,4096,4096' \
      --depths 2 4 --acc float32
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def probe_shape(m, n, k, acc, depths, trials=3, target_ms=120.0):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpul2.config import KernelConfig, heuristic_config
    from tpul2.autotune.db import default_db
    from tpul2.dispatch import candidate_fn, resolve_config
    from tpul2.harness import bench_utils as bu
    from tpul2.ops.matmul import pallas_matmul, pallas_matmul_tn
    from tpul2.ops.pipelined import pallas_matmul_pipelined

    t0 = time.perf_counter()
    in_dtype = jnp.bfloat16
    db = default_db()
    cand_cfg = resolve_config(m, n, k, acc, in_dtype)

    # base Pallas tiling for structure variants: the stored/dispatched
    # tiling if it is a real kernel, else the static heuristic
    base = cand_cfg if not cand_cfg.use_xla else heuristic_config(
        m, n, k, acc, in_dtype)

    funcs = {
        "candidate": candidate_fn(acc),
        "jnp_matmul": jax.jit(lambda a, b, bt: jnp.matmul(a, b)),
        "base_pallas": jax.jit(lambda a, b, bt, c=base: (
            pallas_matmul_tn(a, bt, c, out_dtype=a.dtype)
            if c.rhs_layout == "nk"
            else pallas_matmul(a, b, c, out_dtype=a.dtype))),
    }
    for depth in depths:
        if m % base.bm or n % base.bn or k % base.bk or k // base.bk < 3:
            continue
        c = dataclasses.replace(base, pipeline_depth=depth)
        if c.validate(in_dtype, shape=(m, n, k)) is not None:
            continue
        funcs[f"pipelined_d{depth}"] = jax.jit(
            lambda a, b, bt, c=c: pallas_matmul_pipelined(
                a, bt if c.rhs_layout == "nk" else b, c,
                out_dtype=a.dtype))
    if (m % base.bm or n % base.bn or k % base.bk) and base.edge != "mask":
        c = dataclasses.replace(base, edge="mask")
        if c.validate(in_dtype, shape=(m, n, k)) is None:
            funcs["masked_edge"] = jax.jit(
                lambda a, b, bt, c=c: (
                    pallas_matmul_tn(a, bt, c, out_dtype=a.dtype)
                    if c.rhs_layout == "nk"
                    else pallas_matmul(a, b, c, out_dtype=a.dtype)))

    rng = np.random.default_rng(0)
    data0 = bu.fresh_inputs(rng, m, n, k, in_dtype)
    # correctness screen first: every structural variant must match the
    # f32 truth exactly on 0/1 data before it may be timed.  All probe
    # functions emit IN-DTYPE (bf16) outputs, so the screen keys on the
    # OUTPUT dtype's integer-exact bound (256), not the accumulator's —
    # with density sqrt(64/K) every correctly f32-accumulated program is
    # bit-exact after its single output rounding, regardless of acc family.
    from tpul2.harness.correctness import zero_one_density
    dens = zero_one_density(k, "bfloat16")
    a01 = jnp.asarray(rng.random((m, k)) < dens, in_dtype)
    b01 = jnp.asarray(rng.random((k, n)) < dens, in_dtype)
    bt01 = jnp.swapaxes(b01, 0, 1)
    truth = np.asarray(a01, np.float32) @ np.asarray(b01, np.float32)
    mask_ok = np.abs(truth) <= 256.0
    exact = {}
    for name, fn in list(funcs.items()):
        out = np.asarray(jax.block_until_ready(fn(a01, b01, bt01)),
                         np.float32)
        d = np.abs(out - truth)
        d[~mask_ok] = 0.0
        exact[name] = bool(d.max() == 0.0)
        if not exact[name] and name not in ("jnp_matmul", "candidate"):
            del funcs[name]  # never time an inexact structure variant
    if not exact["jnp_matmul"] or not exact["candidate"]:
        raise RuntimeError(f"screen failed for baseline/candidate: {exact}")

    reps = bu.calibrated_reps(funcs["jnp_matmul"], data0, m, n, k,
                              in_dtype, target_ms=target_ms)
    timers = {name: bu.LeanTimer(fn, m, n, k, in_dtype, reps)
              for name, fn in funcs.items()}
    for t in timers.values():
        t.warmup(data0)
    import random as _random
    shuffler = _random.Random(0)
    records = {name: [] for name in funcs}
    order = list(funcs)
    for _ in range(trials):
        data = bu.fresh_inputs(rng, m, n, k, in_dtype)
        shuffler.shuffle(order)
        for name in order:
            records[name].append(timers[name].measure(data))

    ms = {name: float(np.median(v)) for name, v in records.items()}
    phys = bu.physical_min_ms(m, n, k, in_dtype)
    row = {
        "mnk": [m, n, k], "acc": acc, "reps": reps,
        "candidate_config": dataclasses.asdict(cand_cfg),
        "base_config": dataclasses.asdict(base),
        "phys_min_ms": phys,
        "exact": exact,
        "ms": {name: round(v, 6) for name, v in ms.items()},
        "pct_of_roofline": {name: round(100 * phys / v, 1)
                            for name, v in ms.items()},
        "speedup_vs_matmul": {name: round(ms["jnp_matmul"] / v, 4)
                              for name, v in ms.items()},
        "elapsed_s": round(time.perf_counter() - t0, 1),
    }
    return row


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--shapes", required=True,
                    help="'m,n,k;m,n,k;...' or '@file'")
    ap.add_argument("--acc", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--depths", type=int, nargs="*", default=[2, 4])
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--target_ms", type=float, default=120.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    if args.shapes.startswith("@"):
        items = [ln.strip() for ln in
                 Path(args.shapes[1:]).read_text().splitlines()
                 if ln.strip() and not ln.startswith("#")]
    else:
        items = args.shapes.split(";")
    shapes = [tuple(int(x) for x in s.split(",")) for s in items]

    out_f = open(args.out, "a") if args.out else sys.stdout
    from tpul2.utils.platform import enable_compilation_cache
    enable_compilation_cache()
    for (m, n, k) in shapes:
        try:
            row = probe_shape(m, n, k, args.acc, args.depths,
                              trials=args.trials, target_ms=args.target_ms)
        except Exception as e:
            row = {"mnk": [m, n, k], "acc": args.acc,
                   "error": f"{type(e).__name__}: {e}"}
        out_f.write(json.dumps(row) + "\n")
        out_f.flush()
        print(f"# {m}x{n}x{k}: "
              + (row.get("error") or str(row["speedup_vs_matmul"])),
              file=sys.stderr)
    if args.out:
        out_f.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
