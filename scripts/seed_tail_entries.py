#!/usr/bin/env python
"""Materialize a TuneDB entry for every reference-grid shape (VERDICT r2
next-round #4: `resolve_config` must hit the DB — not the trace-time
fallback chain — for every grid shape, the analogue of the reference's
one-.cu-file-per-shape zoo, tools/utils.py:50).

For each (shape, family) still missing after the measurement campaign,
this stores EXACTLY what trace-time dispatch would have chosen (the
adapted nearest-neighbor config when the neighbor's measured win clears
the margin, its sentinel variant otherwise, heuristic as last resort) —
so dispatch behavior is unchanged; the entry is just indexed, O(1), and
auditable.  Static entries are honest about their provenance:
``scope='transfer_static'``, ``measured=False``, and a neutral
``speedup_vs_xla=1.0`` so they never masquerade as measured wins in
future neighbor-transfer scoring.  A later campaign eval of the shape
refreshes/demotes the entry through the normal heal path.

Usage:
  python scripts/seed_tail_entries.py [--dry_run] [--accs float32 bfloat16]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.run_suite import REFERENCE_DIMS, grid  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--accs", nargs="*", default=["float32", "bfloat16"])
    ap.add_argument("--dry_run", action="store_true")
    args = ap.parse_args(argv)

    from tpul2.autotune.db import default_db
    from tpul2.dispatch import _neighbor_config
    import jax.numpy as jnp
    from tpul2.config import SPACE_REV, heuristic_config
    from tpul2.harness import bench_utils as bu

    db = default_db()
    n_seeded = {"neighbor": 0, "heuristic": 0}
    for acc in args.accs:
        for (m, n, k) in grid(REFERENCE_DIMS):
            if db.get_entry(m, n, k, acc) is not None:
                continue
            cfg = _neighbor_config(db, m, n, k, acc, jnp.bfloat16)
            source = "neighbor"
            if cfg is None:
                cfg = heuristic_config(m, n, k, acc, jnp.bfloat16)
                source = "heuristic"
            n_seeded[source] += 1
            print(f"seed {m}x{n}x{k}/{acc}: {source} -> "
                  f"{'xla:' + cfg.xla_variant if cfg.use_xla else f'pallas bm={cfg.bm} bn={cfg.bn} bk={cfg.bk}'}")
            if not args.dry_run:
                db.put(m, n, k, cfg, tflops=0.0, acc=acc,
                       extra={"speedup_vs_xla": 1.0,
                              "timing_rev": bu.TIMING_REV,
                              "space_rev": SPACE_REV,
                              "scope": "transfer_static",
                              "measured": False})
    if not args.dry_run and sum(n_seeded.values()):
        db.save()
    print(f"seeded: {n_seeded} (db now {len(db)} entries)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
