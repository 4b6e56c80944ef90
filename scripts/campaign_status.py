#!/usr/bin/env python
"""One-glance campaign status: coverage, losses, in-flight rate.

Usage: python scripts/campaign_status.py
"""

from __future__ import annotations

import csv
import math
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
GRID_DIMS = (64, 128, 256, 512, 1024, 2048, 4096, 8192, 12288, 16384)
FULL = {(m, n, k) for m in GRID_DIMS for n in GRID_DIMS for k in GRID_DIMS}


def scan(path: Path, label: str) -> None:
    if not path.exists():
        return
    with path.open() as f:
        rows = list(csv.DictReader(f))
    cols = [c for c in rows[0] if c not in ("mnk", "quality", "iqr_rel")]
    shapes = [tuple(int(x) for x in r["mnk"].split("x")) for r in rows]
    on_grid = sum(1 for s in shapes if s in FULL)
    losses = {}
    for c in cols:
        vals = [(r["mnk"], float(r[c])) for r in rows if r.get(c)]
        bad = [(mnk, v) for mnk, v in vals if v < 0.97]
        g = math.exp(sum(math.log(v) for _, v in vals) / len(vals))
        losses[c] = (g, bad)
    print(f"{label}: {len(rows)} rows ({on_grid}/{len(FULL)} on-grid)")
    worst_col = min(losses, key=lambda c: losses[c][0])
    for c in ("jnp.matmul", "XLA-AutoTuned-max", worst_col):
        g, bad = losses[c]
        print(f"  {c}: geomean {g:.4f}  sub-0.97 rows: {len(bad)}"
              + (f"  e.g. {bad[:3]}" if bad else ""))


def main() -> int:
    for fam in ("float32", "bfloat16"):
        scan(REPO / "eval_results" / f"tpul2_v5e_{fam}_speedup_offline.csv",
             f"offline/{fam}")
        scan(REPO / "eval_results" / f"tpul2_v5e_{fam}_speedup_server.csv",
             f"server/{fam}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
