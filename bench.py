#!/usr/bin/env python
"""Round benchmark: tuned tpul2 matmul vs XLA over a representative suite.

Prints ONE JSON line:
  {"metric": "geomean_speedup_vs_xla_dot", "value": N, "unit": "x",
   "vs_baseline": N}

The shape suite is a band-stratified sample of the reference's 10^3
evaluation grid ({64..16384}^3, SURVEY.md §6) — see DEFAULT_SHAPES below
for the stratification rule.  Each shape: the dispatched library
(tuning-DB config or derived sentinel; never tuned here) vs XLA
dot_general, offline methodology (fresh on-device data, shuffled order,
selection/publication phase split, calibrated rep sizing).

Env knobs: TPUL2_BENCH_SECONDS (per-shape budget, default 3),
TPUL2_BENCH_SHAPES ("m,n,k;m,n,k;..." override).

The TPU pool behind the axon backend has documented multi-minute outage
windows (BENCH_NOTES.md; it zeroed the round-3 artifact).  ``main`` is
therefore a bounded retry/backoff wrapper: the measurement runs in a
subprocess, and a failure whose output shows a backend-init/UNAVAILABLE
signature is retried (default 5 attempts, 60 s * attempt backoff; tune
with TPUL2_BENCH_RETRIES / TPUL2_BENCH_RETRY_BASE_S).  A subprocess is
required because a failed backend init poisons the parent's JAX state.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: stderr signatures of "the pool is down", not "the code is broken"
_TRANSIENT_SIGNATURES = (
    "UNAVAILABLE",
    "Unable to initialize backend 'axon'",
    "not in the list of known backends",
    "DEADLINE_EXCEEDED",
    "failed to connect",
)

# Stratified sample of the reference's 10^3 evaluation grid (SURVEY.md §6),
# mirroring its band composition so the 20-shape geomean estimates the
# full-grid geomean: thin-K (k<=512, max(m,n)>=2048) is 300/1000 shapes ->
# 6 slots; skinny (one dim <=256, others >=2048) 150/1000 -> 3; squares
# 10/1000 -> 1; other 540/1000 -> 10.  Members sit at evenly spaced value
# ranks (min..max) of their band in the round-2 campaign CSV, with
# internally inconsistent rows (>2x intra-row spread = corrupted
# measurement) excluded from ranking — both tails included, no
# cherry-picking.  scripts/aggregate_results.py:band defines the bands.
DEFAULT_SHAPES = [
    # thin-K (6)
    (8192, 128, 64),
    (12288, 64, 64),
    (2048, 512, 64),
    (2048, 128, 512),
    (64, 4096, 512),
    (64, 8192, 64),
    # skinny, large-K (3)
    (64, 4096, 4096),
    (8192, 128, 8192),
    (64, 8192, 8192),
    # square (1)
    (256, 256, 256),
    # other (10)
    (64, 64, 4096),
    (64, 256, 8192),
    (512, 128, 64),
    (256, 64, 256),
    (128, 64, 4096),
    (64, 64, 12288),
    (1024, 128, 64),
    (128, 1024, 256),
    (1024, 256, 128),
    (1024, 64, 64),
]


def main() -> int:
    """Retry wrapper: run _measure() in a subprocess, backing off on
    transient TPU-pool failures (VERDICT r3 next-round #2)."""
    import subprocess
    import time

    if os.environ.get("TPUL2_BENCH_INNER") == "1":
        return _measure()

    retries = int(os.environ.get("TPUL2_BENCH_RETRIES", "5"))
    base_s = float(os.environ.get("TPUL2_BENCH_RETRY_BASE_S", "60"))
    env = dict(os.environ, TPUL2_BENCH_INNER="1")
    for attempt in range(1, retries + 1):
        proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                              env=env, capture_output=True, text=True)
        sys.stderr.write(proc.stderr)
        sys.stdout.write(proc.stdout)
        sys.stdout.flush()
        if proc.returncode == 0:
            return 0
        blob = proc.stderr + proc.stdout
        transient = any(sig in blob for sig in _TRANSIENT_SIGNATURES)
        if not transient or attempt == retries:
            return proc.returncode
        wait = base_s * attempt
        print(f"# TPU pool transiently unavailable (attempt "
              f"{attempt}/{retries}); retrying in {wait:.0f}s",
              file=sys.stderr)
        time.sleep(wait)
    return 1


def _measure() -> int:
    import numpy as np

    from tpul2.harness.bench_suite import eval_shape_lean
    from tpul2.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    trials = int(os.environ.get("TPUL2_BENCH_TRIALS", "5"))
    shapes_env = os.environ.get("TPUL2_BENCH_SHAPES")
    shapes = ([tuple(map(int, s.split(","))) for s in shapes_env.split(";")]
              if shapes_env else DEFAULT_SHAPES)

    # Same phase-split methodology as the campaign CSVs (selection vs
    # publication samples, calibrated rep sizing, fresh shuffled trials):
    # the headline measures the DISPATCHED library (tuning-DB config or
    # derived sentinel) against stock XLA — it never writes the DB, so a
    # round benchmark cannot clobber campaign-quality entries.
    speedups = []
    per_shape = {}
    for (m, n, k) in shapes:
        res = eval_shape_lean(m, n, k, accs=("float32",), trials=trials)
        sp = res["speedups"]["float32"]["xla_matmul"]
        cand = res["per_func"]["tpul2_float32"]
        per_shape[f"{m}x{n}x{k}"] = {
            "speedup": round(sp, 4),
            "tflops": round(cand["tflops"], 2),
            "xla_tflops": round(res["per_func"]["xla_matmul"]["tflops"], 2),
            "at_max": round(min(
                res["speedups"]["float32"]["xla_autotuned_nn"],
                res["speedups"]["float32"]["xla_autotuned_tn"]), 4),
        }
        speedups.append(sp)
        print(f"# {m}x{n}x{k}: {sp:.4f}x "
              f"({cand['tflops']:.1f} vs "
              f"{res['per_func']['xla_matmul']['tflops']:.1f} TFLOPS)",
              file=sys.stderr)

    # MFU evidence (VERDICT r2 weak #2 / next-round #6): the band suite's
    # single square slot is rank-representative (256^3), which cannot show
    # the >=90%-of-peak target (BASELINE.md:51) — probe the large squares
    # explicitly so the round artifact itself demonstrates it.
    PEAK_TFLOPS = 195.0  # v5e bf16, empirically probed (CLAUDE.md)
    mfu = {}
    # default ON for the real round run, OFF when the shape suite is
    # overridden (tests / quick probes — 8192^3 on an interpret backend
    # would run for hours)
    mfu_default = "0" if shapes_env else "1"
    if os.environ.get("TPUL2_BENCH_MFU", mfu_default) != "0":
        for (m, n, k) in [(2048, 2048, 2048), (4096, 4096, 4096),
                          (8192, 8192, 8192)]:
            res = eval_shape_lean(m, n, k, accs=("float32",),
                                  trials=max(2, trials - 2))
            cand = res["per_func"]["tpul2_float32"]
            mfu[f"{m}x{n}x{k}"] = {
                "tflops": round(cand["tflops"], 1),
                "pct_of_peak": round(100 * cand["tflops"] / PEAK_TFLOPS, 1),
                "speedup": round(
                    res["speedups"]["float32"]["xla_matmul"], 4),
            }
            print(f"# mfu {m}^3: {cand['tflops']:.1f} TFLOPS "
                  f"({100 * cand['tflops'] / PEAK_TFLOPS:.1f}% of peak)",
                  file=sys.stderr)

    geomean = float(np.exp(np.mean(np.log(speedups))))
    # Headline keys LAST: the round driver keeps only the tail of this
    # line, so the large per-shape blocks must print first or the
    # "value" field gets truncated away (VERDICT r4 weak #5 — the round-4
    # headline was unrecoverable from BENCH_r04.json).
    print(json.dumps({
        "shapes": per_shape,
        "mfu": mfu,
        "metric": "geomean_speedup_vs_xla_dot",
        "unit": "x",
        "value": round(geomean, 4),
        "vs_baseline": round(geomean, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
