"""Stratified campaign ordering: every truncation prefix of the shape list
must keep the full grid's band composition (VERDICT r2 next-round #5 — a
wall-clock-truncated server campaign over the reference grid must not be
all-cheap or all-one-band, unlike the reference's fixed lexicographic
sweep, benchmarking_server.py applied grid-wide)."""

from collections import Counter

from scripts.aggregate_results import band
from scripts.run_suite import grid

DIMS = [64, 128, 256, 512, 1024, 2048, 4096, 8192]


def _composition(shapes):
    c = Counter(band(f"{m}x{n}x{k}") for m, n, k in shapes)
    total = sum(c.values())
    return {b: v / total for b, v in c.items()}


def test_stratified_is_a_permutation():
    lex = grid(DIMS)
    strat = grid(DIMS, order="stratified")
    assert sorted(strat) == sorted(lex)
    assert len(set(strat)) == len(strat)


def test_prefix_band_composition_tracks_full_grid():
    strat = grid(DIMS, order="stratified")
    full = _composition(strat)
    for frac in (0.25, 0.5, 0.75):
        prefix = _composition(strat[: int(len(strat) * frac)])
        for b, share in full.items():
            assert abs(prefix.get(b, 0.0) - share) < 0.02, (
                f"band {b} at prefix {frac}: {prefix.get(b, 0.0):.3f} "
                f"vs full {share:.3f}")


def test_within_band_cost_ascending():
    strat = grid(DIMS, order="stratified")
    per_band = {}
    for s in strat:
        per_band.setdefault(band(f"{s[0]}x{s[1]}x{s[2]}"), []).append(s)
    for shapes in per_band.values():
        costs = [m * n * k for m, n, k in shapes]
        assert costs == sorted(costs)
