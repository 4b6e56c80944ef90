#!/usr/bin/env python
"""Thin-K band analysis: per-shape roofline shares + retune targets.

VERDICT r3 next-round #5: the thin-K band (K<=512 with max(M,N)>=2048)
publishes geomean ~1.05 with individual wins to 1.76x — either the searched
space under-fits the band, or the residual is memory-bound physics.  This
tool answers that SHAPE BY SHAPE from the campaign detail sidecars:

  share_naive = t_bound / t_measured with t_bound = max(FLOPs/peak,
      bytes/BW), bytes counting each operand once;
  share_wa    = same with the output's write-allocate cost (a streamed
      store of C first FILLS the cache line from HBM, so a C-write-bound
      shape moves ~2x the output bytes — measured on v5e via
      probe_structures_r3: the 16384x16384x64 row sits at 44% naive /
      ~90% write-allocate-adjusted).

A shape whose CANDIDATE share_wa is already >= the --physics_bar is at the
wall — no tiling can win more; a shape below the bar with the XLA baseline
equally low is headroom worth a re-tune (scripts/retune_thin_k.py consumes
the emitted target list).

Usage:
  python scripts/thin_k_report.py [--csv eval_results/..._offline.csv]
      [--detail eval_results/tpul2_v5e_all_speedup_offline_detail.jsonl]
      [--targets_out /tmp/thin_k_targets.txt] [--markdown]
"""

from __future__ import annotations

import argparse
import csv
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PEAK = 195e12      # v5e bf16 FLOP/s, probed (CLAUDE.md)
HBM_BW = 819e9     # v5e, probed


def bands_of(m, n, k):
    return k <= 512 and max(m, n) >= 2048


def bound_ms(m, n, k, write_alloc: bool, out_bytes: int = 2) -> float:
    """Roofline bound with explicit output-dtype bytes (ADVICE r4 low #3).

    ``out_bytes=2`` is correct for EVERY function the campaigns measure in
    BOTH accumulator families: the candidates (dispatch.matmul defaults
    ``out_dtype`` to ``a.dtype`` = bf16) and all XLA baselines
    (ops/baselines.py casts each dot's f32 product back to ``a.dtype``).
    The 'float32' family names the ACCUMULATOR, not the stored output —
    pass ``out_bytes=4`` only when analyzing a path that truly stores f32.
    """
    flops = 2.0 * m * n * k
    bytes_ = 2 * (m * k + k * n) + \
        (2 * out_bytes if write_alloc else out_bytes) * m * n
    return max(flops / PEAK, bytes_ / HBM_BW) * 1e3


def analyze(csv_path, detail_path, acc,
            physics_bar: float = 0.85, win_bar: float = 1.05):
    """Per-shape thin-K roofline shares for one family.

    Returns (rows, targets, missing): rows are dicts sorted by ascending
    candidate write-allocate share; targets are (m,n,k) below the physics
    bar that are not already winning (retune-worthy headroom).
    """
    # latest detail record per mnk (repairs append a fresh record)
    details = {}
    for line in Path(detail_path).read_text().splitlines():
        try:
            r = json.loads(line)
        except Exception:
            continue
        details["x".join(map(str, r["mnk"]))] = r

    with open(csv_path) as f:
        rows = list(csv.DictReader(f))

    out_rows, targets = [], []
    missing = 0
    for r in rows:
        m, n, k = map(int, r["mnk"].split("x"))
        if not bands_of(m, n, k):
            continue
        d = details.get(r["mnk"])
        if d is None or f"tpul2_{acc}" not in d.get("per_func", {}):
            missing += 1
            continue
        cand_ms = d["per_func"][f"tpul2_{acc}"]["ms"]
        xla_ms = d["per_func"]["xla_matmul"]["ms"]
        rec = {
            "mnk": r["mnk"],
            "speedup": float(r["jnp.matmul"]),
            "cand_share_naive": bound_ms(m, n, k, False) / cand_ms,
            "cand_share_wa": bound_ms(m, n, k, True) / cand_ms,
            "xla_share_wa": bound_ms(m, n, k, True) / xla_ms,
        }
        out_rows.append(rec)
        if (rec["cand_share_wa"] < physics_bar
                and rec["speedup"] < win_bar):
            targets.append((m, n, k))

    out_rows.sort(key=lambda x: x["cand_share_wa"])
    return out_rows, targets, missing


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--csv",
                    default="eval_results/tpul2_v5e_float32_speedup_offline.csv")
    ap.add_argument("--detail",
                    default="eval_results/"
                            "tpul2_v5e_all_speedup_offline_detail.jsonl")
    ap.add_argument("--acc", default="float32")
    ap.add_argument("--physics_bar", type=float, default=0.85,
                    help="candidate share_wa at/above this = at the wall")
    ap.add_argument("--win_bar", type=float, default=1.05,
                    help="rows already winning at least this much are not "
                         "retune targets")
    ap.add_argument("--targets_out", default=None,
                    help="write 'm,n,k' retune targets here")
    ap.add_argument("--markdown", action="store_true",
                    help="print the per-shape markdown table (BENCH_NOTES)")
    args = ap.parse_args(argv)

    out_rows, targets, missing = analyze(
        args.csv, args.detail, args.acc,
        physics_bar=args.physics_bar, win_bar=args.win_bar)
    at_wall = sum(1 for r in out_rows
                  if r["cand_share_wa"] >= args.physics_bar)
    winning = sum(1 for r in out_rows if r["speedup"] >= args.win_bar)
    print(f"thin-K rows analyzed: {len(out_rows)} (missing detail: "
          f"{missing})", file=sys.stderr)
    print(f"  at the write-allocate roofline (share_wa >= "
          f"{args.physics_bar}): {at_wall}", file=sys.stderr)
    print(f"  already winning >= {args.win_bar}x: {winning}",
          file=sys.stderr)
    print(f"  retune targets (below bar, not winning): {len(targets)}",
          file=sys.stderr)

    if args.markdown:
        print("| mnk | speedup | cand naive | cand +WA | XLA +WA |")
        print("|---|---|---|---|---|")
        for r in out_rows:
            print(f"| {r['mnk']} | {r['speedup']:.3f}x | "
                  f"{r['cand_share_naive']:.0%} | {r['cand_share_wa']:.0%} "
                  f"| {r['xla_share_wa']:.0%} |")
    if args.targets_out:
        Path(args.targets_out).write_text(
            "\n".join(f"{m},{n},{k}" for m, n, k in targets) + "\n")
        print(f"wrote {len(targets)} targets to {args.targets_out}",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
