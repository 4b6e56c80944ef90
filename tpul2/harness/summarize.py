"""Result summarizer — markdown table + worst-case '-max' aggregation.

Port of the reference summarize_result.py (SURVEY.md C7): glob the
``benchmark_result_*.json`` files in a run directory, map to display names,
derive the ``-max`` rows as the tn/nn layout variant with the LOWER candidate
speedup (worst case FOR the candidate — the honest aggregation,
summarize_result.py:43-53), and print a fixed-order markdown table of
baseline TFLOPS / tpul2 TFLOPS / speedup.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

DISPLAY_NAMES = {
    "xla_matmul": "jnp.matmul",
    "xla_dot_nn": "XLA-dot-nn",
    "xla_dot_tn": "XLA-dot-tn",
    "xla_highest_nn": "XLA-highest-nn",
    "xla_highest_tn": "XLA-highest-tn",
    "xla_autotuned_nn": "XLA-AutoTuned-nn",
    "xla_autotuned_tn": "XLA-AutoTuned-tn",
}

#: Baseline families with nn/tn layout pairs → derive a worst-case row.
_MAX_FAMILIES = ["xla_dot", "xla_highest", "xla_autotuned"]

_ROW_ORDER = [
    "jnp.matmul",
    "XLA-dot-tn", "XLA-dot-nn", "XLA-dot-max",
    "XLA-highest-tn", "XLA-highest-nn", "XLA-highest-max",
    "XLA-AutoTuned-tn", "XLA-AutoTuned-nn", "XLA-AutoTuned-max",
]


def load_results(base_dir) -> dict:
    out = {}
    for f in sorted(Path(base_dir).glob("benchmark_result_*.json")):
        r = json.loads(f.read_text())
        out[r["perf_func"]] = r
    return out


def summarize_results(base_dir, candidate_name: str = "tpul2",
                      write_path: Optional[str] = None) -> str:
    """Build the summary table; returns (and optionally writes) markdown."""
    results = load_results(base_dir)
    rows = {}
    for func, r in results.items():
        disp = DISPLAY_NAMES.get(func, func)
        rows[disp] = {
            "baseline_tflops": r[func]["tflops_mean"],
            "tpul2_tflops": r[candidate_name]["tflops_mean"],
            "speedup": r["speedup"],
            "baseline_p99": r[func].get("p99_ms"),
            "tpul2_p99": r[candidate_name].get("p99_ms"),
        }

    # Worst-case '-max' rows: the layout with the LOWER candidate speedup.
    for fam in _MAX_FAMILIES:
        tn = rows.get(DISPLAY_NAMES.get(f"{fam}_tn"))
        nn = rows.get(DISPLAY_NAMES.get(f"{fam}_nn"))
        if tn and nn:
            worst = tn if tn["speedup"] <= nn["speedup"] else nn
            fam_disp = DISPLAY_NAMES[f"{fam}_tn"].rsplit("-", 1)[0]
            rows[f"{fam_disp}-max"] = dict(worst)

    header = next(iter(results.values()), None)
    lines = []
    if header:
        m, n, k = header["mnk"]
        lines.append(f"### {header['mode']} · M={m} N={n} K={k} · "
                     f"acc={header['acc']} · {header['in_dtype']}")
        lines.append("")
    lines.append("| Baseline | Baseline TFLOPS | tpul2 TFLOPS | Speedup |")
    lines.append("|---|---|---|---|")
    ordered = [r for r in _ROW_ORDER if r in rows]
    ordered += [r for r in rows if r not in ordered]
    for name in ordered:
        v = rows[name]
        lines.append(f"| {name} | {v['baseline_tflops']:.3f} | "
                     f"{v['tpul2_tflops']:.3f} | {v['speedup']:.4f}x |")
    md = "\n".join(lines)
    if write_path:
        Path(write_path).write_text(md + "\n")
    return md


def speedup_row(base_dir, mnk) -> dict:
    """One CSV row of per-shape speedups (the eval_results/*.csv schema:
    'mnk, jnp.matmul, XLA-dot-{tn,nn,max}, ...', reference C14)."""
    results = load_results(base_dir)
    row = {"mnk": "x".join(map(str, mnk))}
    by_disp = {DISPLAY_NAMES.get(f, f): r["speedup"]
               for f, r in results.items()}
    for fam in _MAX_FAMILIES:
        tn = by_disp.get(DISPLAY_NAMES.get(f"{fam}_tn"))
        nn = by_disp.get(DISPLAY_NAMES.get(f"{fam}_nn"))
        if tn is not None and nn is not None:
            fam_disp = DISPLAY_NAMES[f"{fam}_tn"].rsplit("-", 1)[0]
            by_disp[f"{fam_disp}-max"] = min(tn, nn)
    for name in _ROW_ORDER:
        if name in by_disp:
            row[name] = by_disp[name]
    return row
