"""BENCH_NOTES.md must not drift from the CSVs it claims to summarize.

ADVICE r4 medium #1: the committed notes once claimed 22 server rows while
the committed CSVs had 37 — the doc promises its aggregates "can never
drift from the CSVs", so staleness is a correctness bug of the published
artifact, not a cosmetic one.  This guard re-runs the aggregate pipeline
(scripts/update_bench_notes.py emit path) against the CSVs on disk and
asserts the row counts and geomeans printed in the notes match.  Fix on
failure: `python scripts/update_bench_notes.py --round N` and commit the
regenerated tail together with the CSV change.
"""

import math
import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
NOTES = REPO / "BENCH_NOTES.md"


def _published_tables():
    """(csv_name -> (row_count, geomean vs jnp.matmul)) from the notes."""
    text = NOTES.read_text()
    out = {}
    for m in re.finditer(
            r"^## (tpul2_\S+\.csv) \((\d+) shapes\)\n(.*?)(?=\n## |\Z)",
            text, re.M | re.S):
        name, n, body = m.group(1), int(m.group(2)), m.group(3)
        g = re.search(r"^\| jnp\.matmul \|[^|]*\| ([0-9.]+)x \|", body, re.M)
        out[name] = (n, float(g.group(1)) if g else None)
    return out


@pytest.mark.skipif(not NOTES.exists(), reason="no BENCH_NOTES.md")
def test_bench_notes_match_csvs():
    from scripts.aggregate_results import aggregate

    published = _published_tables()
    assert published, "no per-CSV tables found in BENCH_NOTES.md"
    for name, (n_pub, g_pub) in published.items():
        p = REPO / "eval_results" / name
        assert p.exists(), f"{name} published in notes but missing on disk"
        agg = aggregate(p)
        stats = agg["jnp.matmul"]
        assert stats["n"] == n_pub, (
            f"{name}: notes claim {n_pub} rows, CSV has {stats['n']} — "
            f"rerun scripts/update_bench_notes.py")
        if g_pub is not None:
            assert math.isclose(stats["geomean"], g_pub, abs_tol=5e-4), (
                f"{name}: notes geomean {g_pub} vs CSV "
                f"{stats['geomean']:.4f} — rerun update_bench_notes.py")


@pytest.mark.skipif(not NOTES.exists(), reason="no BENCH_NOTES.md")
def test_bench_notes_coverage_lines():
    """The 'Offline <fam>: X/1000' coverage claims match the CSVs."""
    import csv as _csv
    text = NOTES.read_text()
    dims = (64, 128, 256, 512, 1024, 2048, 4096, 8192, 12288, 16384)
    full = {(m, n, k) for m in dims for n in dims for k in dims}
    for fam in ("float32", "bfloat16"):
        m = re.search(rf"^Offline {fam}: (\d+)/1000", text, re.M)
        if not m:
            continue
        p = REPO / "eval_results" / f"tpul2_v5e_{fam}_speedup_offline.csv"
        with p.open() as f:
            rows = {tuple(int(x) for x in r["mnk"].split("x"))
                    for r in _csv.DictReader(f)}
        assert len(rows & full) == int(m.group(1)), (
            f"offline {fam} coverage drifted — rerun update_bench_notes.py")
