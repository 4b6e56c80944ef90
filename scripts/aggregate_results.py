#!/usr/bin/env python
"""Aggregate per-shape speedup CSVs into summary tables.

The analogue of the reference README's "What's New" mean-speedup tables
(README.md:27-67), computed from eval_results CSVs exactly as SURVEY.md §6
verified them: arithmetic mean and geometric mean per baseline column.

  python scripts/aggregate_results.py eval_results/*.csv
"""

from __future__ import annotations

import csv
import math
import sys
from pathlib import Path


def aggregate(path: Path, quality: str | None = None) -> dict:
    """Per-column summary stats; quality='ok' restricts to rows whose
    measurement passed the noise gates (server rows at the ~30 ms fence
    floor are flagged floor_limited — their per-request numbers are
    dominated by ±ms jitter and carry no signal either way)."""
    with path.open() as f:
        rows = list(csv.DictReader(f))
    if quality is not None:
        rows = [r for r in rows if r.get("quality", "ok") == quality]
    if not rows:
        return {}
    cols = [c for c in rows[0] if c not in ("mnk", "quality", "iqr_rel")]
    out = {}
    for c in cols:
        try:
            vals = [float(r[c]) for r in rows if r.get(c)]
        except ValueError:
            continue  # non-numeric honesty column
        if not vals:
            continue
        out[c] = {
            "n": len(vals),
            "mean": sum(vals) / len(vals),
            "geomean": math.exp(sum(math.log(v) for v in vals) / len(vals)),
            "wins": sum(v > 1.001 for v in vals),
            "ties": sum(0.999 <= v <= 1.001 for v in vals),
        }
    return out


def band(mnk: str) -> str:
    """Shape-band classification for the win-story breakdown: the tuned
    library's wins concentrate in thin-K and skinny streaming bands
    (BENCH_NOTES.md); squares are XLA-parity by design."""
    m, n, k = (int(x) for x in mnk.split("x"))
    if m == n == k:
        return "square"
    if k <= 512 and max(m, n) >= 2048:
        return "thin-K"
    if (m <= 256 and min(n, k) >= 2048) or (n <= 256 and min(m, k) >= 2048):
        return "skinny"
    return "other"


def band_table(path: Path, col: str = "jnp.matmul") -> dict:
    with path.open() as f:
        rows = list(csv.DictReader(f))
    out = {}
    for b in ("thin-K", "skinny", "square", "other"):
        vals = [float(r[col]) for r in rows
                if r.get(col) and band(r["mnk"]) == b]
        if vals:
            out[b] = {
                "n": len(vals),
                "geomean": math.exp(sum(math.log(v) for v in vals)
                                    / len(vals)),
                "max": max(vals),
                "wins": sum(v > 1.03 for v in vals),
            }
    return out


def main(argv=None) -> int:
    paths = [Path(p) for p in (argv or sys.argv[1:])]
    if not paths:
        print("usage: aggregate_results.py CSV [CSV...]", file=sys.stderr)
        return 2
    for p in paths:
        agg = aggregate(p)
        if not agg:
            continue
        print(f"\n## {p.name} ({next(iter(agg.values()))['n']} shapes)\n")
        print("| Baseline | Mean speedup | Geomean | wins | ties |")
        print("|---|---|---|---|---|")
        for c, s in agg.items():
            print(f"| {c} | {s['mean']:.4f}x | {s['geomean']:.4f}x "
                  f"| {s['wins']} | {s['ties']} |")
        bands = band_table(p)
        if bands:
            print("\n| Band (vs jnp.matmul) | n | Geomean | Best | wins>1.03 |")
            print("|---|---|---|---|---|")
            for b, s in bands.items():
                print(f"| {b} | {s['n']} | {s['geomean']:.4f}x "
                      f"| {s['max']:.4f}x | {s['wins']} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
