"""BENCH_NOTES.md must not drift from the CSVs it claims to summarize.

ADVICE r4 medium #1: the committed notes once claimed 22 server rows while
the committed CSVs had 37 — the doc promises its aggregates "can never
drift from the CSVs", so staleness is a correctness bug of the published
artifact, not a cosmetic one.  The contract applies to the PUBLISHED
(committed) artifact: this guard reads both the notes and the CSVs from
git HEAD — a live campaign mutates the working-tree CSVs continuously and
those rows are not published until committed (together with a regenerated
notes tail).  Fix on failure: `python scripts/update_bench_notes.py
--round N` and commit the regenerated tail together with the CSV change.
"""

import math
import re
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _git_show(relpath: str):
    """File content at HEAD, or None if not committed / not a git repo."""
    try:
        r = subprocess.run(["git", "show", f"HEAD:{relpath}"],
                           cwd=REPO, capture_output=True, timeout=30)
    except Exception:
        return None
    return r.stdout.decode() if r.returncode == 0 else None


NOTES_AT_HEAD = _git_show("BENCH_NOTES.md")


def _published_tables(text: str):
    """(csv_name -> (row_count, geomean vs jnp.matmul)) from the notes."""
    out = {}
    for m in re.finditer(
            r"^## (tpul2_\S+\.csv) \((\d+) shapes\)\n(.*?)(?=\n## |\Z)",
            text, re.M | re.S):
        name, n, body = m.group(1), int(m.group(2)), m.group(3)
        g = re.search(r"^\| jnp\.matmul \|[^|]*\| ([0-9.]+)x \|", body, re.M)
        out[name] = (n, float(g.group(1)) if g else None)
    return out


def _aggregate_text(csv_text: str, tmp_path: Path):
    from scripts.aggregate_results import aggregate
    p = tmp_path / "head.csv"
    p.write_text(csv_text)
    return aggregate(p)


@pytest.mark.skipif(NOTES_AT_HEAD is None,
                    reason="BENCH_NOTES.md not committed")
def test_bench_notes_match_csvs(tmp_path):
    published = _published_tables(NOTES_AT_HEAD)
    assert published, "no per-CSV tables found in BENCH_NOTES.md at HEAD"
    for name, (n_pub, g_pub) in published.items():
        csv_text = _git_show(f"eval_results/{name}")
        assert csv_text is not None, (
            f"{name} published in the committed notes but not committed")
        stats = _aggregate_text(csv_text, tmp_path)["jnp.matmul"]
        assert stats["n"] == n_pub, (
            f"{name}: committed notes claim {n_pub} rows, committed CSV "
            f"has {stats['n']} — rerun scripts/update_bench_notes.py and "
            f"commit the regenerated tail with the CSV change")
        if g_pub is not None:
            assert math.isclose(stats["geomean"], g_pub, abs_tol=5e-4), (
                f"{name}: committed notes geomean {g_pub} vs CSV "
                f"{stats['geomean']:.4f} — rerun update_bench_notes.py")


@pytest.mark.skipif(NOTES_AT_HEAD is None,
                    reason="BENCH_NOTES.md not committed")
def test_bench_notes_coverage_lines():
    """The 'Offline <fam>: X/1000' coverage claims match the committed
    CSVs."""
    import csv as _csv
    import io
    dims = (64, 128, 256, 512, 1024, 2048, 4096, 8192, 12288, 16384)
    full = {(m, n, k) for m in dims for n in dims for k in dims}
    for fam in ("float32", "bfloat16"):
        m = re.search(rf"^Offline {fam}: (\d+)/1000", NOTES_AT_HEAD, re.M)
        if not m:
            continue
        csv_text = _git_show(
            f"eval_results/tpul2_v5e_{fam}_speedup_offline.csv")
        assert csv_text is not None
        rows = {tuple(int(x) for x in r["mnk"].split("x"))
                for r in _csv.DictReader(io.StringIO(csv_text))}
        assert len(rows & full) == int(m.group(1)), (
            f"offline {fam} coverage drifted — rerun update_bench_notes.py")
