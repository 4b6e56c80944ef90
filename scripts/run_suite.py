#!/usr/bin/env python
"""Shape-suite runner: tune and/or evaluate the full (M, N, K) grid.

Reproduces the reference's two suite-level artifacts (SURVEY.md C9/C14):
  tune mode  → the per-shape tuned-config database (the reference ships this
               as 3,736 .cu files; we ship tpul2/data/tunedb_<gen>.json+bin)
  eval mode  → per-shape speedup CSVs vs every baseline
               (eval_results/cuda_l2_*_speedup_{offline,server}.csv
               analogues: eval_results/tpul2_<gen>_<acc>_speedup_<mode>.csv,
               columns 'mnk, jnp.matmul, XLA-dot-{tn,nn,max}, ...')

The grid defaults to the reference's {64,128,256,512,1024,2048,4096,8192,
12288,16384}^3 (SURVEY.md §6).  Both modes are resumable: tuned shapes are
skipped, evaluated shapes are skipped if already present in the CSV.

Usage:
  python scripts/run_suite.py tune --dims 64 128 256 --acc float32
  python scripts/run_suite.py eval --mode offline --benchmark_seconds 3 \
      --out eval_results/tpul2_v5e_float32_speedup_offline.csv
"""

from __future__ import annotations

import argparse
import csv
import itertools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REFERENCE_DIMS = [64, 128, 256, 512, 1024, 2048, 4096, 8192, 12288, 16384]

CSV_COLUMNS = ["mnk", "jnp.matmul",
               "XLA-dot-tn", "XLA-dot-nn", "XLA-dot-max",
               "XLA-highest-tn", "XLA-highest-nn", "XLA-highest-max",
               "XLA-AutoTuned-tn", "XLA-AutoTuned-nn", "XLA-AutoTuned-max"]


def grid(dims, max_shapes=None, max_elems=None, order="lex"):
    shapes = [s for s in itertools.product(dims, dims, dims)]
    if max_elems:
        shapes = [s for s in shapes
                  if max(s[0] * s[2], s[2] * s[1], s[0] * s[1]) <= max_elems]
    if order == "cost":
        # cheap shapes first: maximizes completed CSV rows per wall-hour
        # (compile+measure cost scales with the problem size)
        shapes.sort(key=lambda s: (s[0] * s[1] * s[2], s))
    elif order == "stratified":
        # proportional-fair merge of cost-ascending per-band lists: every
        # truncation prefix keeps the band composition of the full grid
        # (VERDICT r2 next-round #5 — a wall-clock-truncated server
        # campaign must not be all-cheap/all-one-band)
        from scripts.aggregate_results import band
        buckets = {}
        for s in sorted(shapes, key=lambda s: (s[0] * s[1] * s[2], s)):
            buckets.setdefault(band(f"{s[0]}x{s[1]}x{s[2]}"), []).append(s)
        merged = [(i / len(bl), i, b, s)
                  for b, bl in sorted(buckets.items())
                  for i, s in enumerate(bl)]
        merged.sort()
        shapes = [s for _, _, _, s in merged]
    if max_shapes:
        shapes = shapes[:max_shapes]
    return shapes


def cmd_tune(args) -> int:
    from tpul2.autotune.db import default_db
    from tpul2.autotune.search import tune_many

    db = default_db()
    shapes = grid(args.dims, args.max_shapes, args.max_elems)
    print(f"tuning {len(shapes)} shapes (DB has {len(db)} entries)",
          file=sys.stderr)
    t0 = time.time()
    done = 0
    # chunked so the DB persists incrementally (resume-safe)
    for i in range(0, len(shapes), args.chunk):
        chunk = shapes[i:i + args.chunk]
        results = tune_many(chunk, acc=args.acc, db=db, skip_tuned=True,
                            max_candidates=args.max_candidates,
                            stage1_rounds=args.stage1_rounds,
                            stage2_rounds=args.stage2_rounds,
                            finalists=args.finalists,
                            verbose=args.verbose)
        done += len(results)
        print(f"[{time.time() - t0:.0f}s] {i + len(chunk)}/{len(shapes)} "
              f"({done} newly tuned)", file=sys.stderr)
    return 0


def _load_done(path: Path) -> set:
    if not path.exists():
        return set()
    with path.open() as f:
        return {row["mnk"] for row in csv.DictReader(f)}


def _repair_csv(path: Path, threshold: float = 0.97,
                ratio_cap: float = 2.5, max_loss_repairs: int = 1,
                max_inconsistent_repairs: int = 3,
                any_col_floor: float = 0.90,
                implausible_ceiling: float = 0.5,
                iqr_invalid: float = 1.0) -> set:
    """Drop tainted rows from a campaign CSV so they are re-evaluated.

    Three taint classes, with different retry policies (ADVICE r2 medium
    #2: an unbounded retry-until-win loop on loss rows censors the noise
    distribution, making 'zero losses' partly selection bias):

      implausible taint — EVERY speedup column < ``implausible_ceiling``,
        or the row's own ``iqr_rel`` > ``iqr_invalid``.  Dispatch always
        has the XLA sentinels in its candidate set, so a winner that is
        simultaneously 2x+ slower than every XLA formulation is not a
        measurement of the kernel — it is a stall (multi-second fence or
        recompile) landing inside the candidate's trials.  Because the
        stall hits the candidate, all columns sink TOGETHER and the
        ratio_cap inconsistency test cannot see it (observed round 5:
        64x128x64 published at 0.0054x with iqr_rel 3.9).  Re-measured up
        to ``max_inconsistent_repairs`` times, then kept as-is.

      loss taint — the candidate lost to ``jnp.matmul`` beyond the noise
        band (< threshold) or >10% to ANY column.  A row is re-measured
        for loss AT MOST ``max_loss_repairs`` times (journaled per-mnk in
        ``<csv>.repairs.json``); the re-measurement publishes
        unconditionally — a row still below threshold after its repair
        budget stays in the artifact as an honest loss.
      inconsistency taint — columns internally inconsistent (max/min >
        ratio_cap: the XLA formulations are near-identical programs, so a
        2.5x spread inside one row usually means a corrupted measurement,
        e.g. a recompile or fence stall landed inside one column's
        trials).  Re-measured up to ``max_inconsistent_repairs`` times;
        a row that STILL spreads past the cap after that many fresh
        measurements is a real property of the shape (e.g. one
        formulation genuinely that much slower) and is kept — otherwise
        one such shape would re-evaluate every chunk forever and the
        campaign's completion check could never fire.

    Runs at chunk start, before the CSV is opened for append; re-evals go
    through the heal_entries_from_eval never-lose path.  Returns the
    dropped mnks."""
    import json as _json

    if not path.exists():
        return set()
    with path.open() as f:
        rows = list(csv.DictReader(f))
    if not rows:
        return set()
    journal_path = Path(str(path) + ".repairs.json")
    journal = (_json.loads(journal_path.read_text())
               if journal_path.exists() else {})
    fieldnames = list(rows[0].keys())
    dropped = set()
    for r in rows:
        vals = [float(v) for c, v in r.items()
                if c != "mnk" and c not in SERVER_EXTRA_COLUMNS and v]
        if not vals:
            continue
        inconsistent = max(vals) / min(vals) > ratio_cap
        implausible = (max(vals) < implausible_ceiling
                       or float(r.get("iqr_rel") or 0.0) > iqr_invalid)
        # any_col_floor mirrors the heal gate: a row losing beyond it to
        # ANY published column gets its one journaled re-measure through
        # the heal path (the never-lose contract covers every column,
        # VERDICT r2 next-round #2)
        lossy = (float(r["jnp.matmul"]) < threshold
                 or min(vals) < any_col_floor)
        if not (inconsistent or lossy or implausible):
            continue  # clean rows never enter the journal
        rec = journal.setdefault(r["mnk"], {"loss": 0, "inconsistent": 0})
        if implausible and rec.setdefault("implausible", 0) \
                < max_inconsistent_repairs:
            rec["implausible"] += 1
            dropped.add(r["mnk"])
        elif inconsistent and rec["inconsistent"] < max_inconsistent_repairs:
            rec["inconsistent"] += 1
            dropped.add(r["mnk"])
        elif lossy and not inconsistent and rec["loss"] < max_loss_repairs:
            rec["loss"] += 1
            dropped.add(r["mnk"])
        if r["mnk"] in dropped:
            # keep the dropped row's data so a re-eval that permanently
            # fails can restore it instead of leaving a silent coverage
            # hole (ADVICE r3 low #4)
            rec["last_row"] = dict(r)
    if dropped:
        keep = [r for r in rows if r["mnk"] not in dropped]
        tmp = path.with_suffix(".tmp")
        with tmp.open("w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fieldnames)
            w.writeheader()
            w.writerows(keep)
        tmp.replace(path)
        journal_path.write_text(_json.dumps(journal, indent=1,
                                            sort_keys=True))
    return dropped


def _restore_exhausted_rows(path: Path, failed: set) -> int:
    """Restore repair-dropped rows whose re-eval permanently failed.

    ADVICE r3 low #4: a row dropped by _repair_csv whose re-measurement
    then raises ``max_attempts`` times lands in the .failures sidecar and
    is treated as done — silently vanishing from the CSV.  Put the
    journal-backed original (tainted) row back so the artifact shows the
    truncated coverage honestly instead of hiding it."""
    import json as _json

    journal_path = Path(str(path) + ".repairs.json")
    if not path.exists() or not journal_path.exists() or not failed:
        return 0
    journal = _json.loads(journal_path.read_text())
    with path.open() as f:
        reader = csv.DictReader(f)
        fieldnames = reader.fieldnames
        present = {row["mnk"] for row in reader}
    restored = 0
    with path.open("a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fieldnames)
        for mnk in sorted(failed):
            rec = journal.get(mnk)
            if mnk in present or not rec or "last_row" not in rec:
                continue
            w.writerow({c: rec["last_row"].get(c, "") for c in fieldnames})
            restored += 1
            print(f"restored repair-dropped row {mnk} after exhausted "
                  f"re-eval retries (kept original tainted measurement)",
                  file=sys.stderr)
    return restored


def _load_failures(detail: Path, max_attempts: int = 2) -> set:
    """mnks recorded ≥max_attempts times in the .failures sidecar.

    ADVICE r2 low #4: without this, a permanently infeasible shape is
    retried every chunk and the campaign's 'evaluating 0 shapes'
    completion check can never fire.  One recorded failure still gets a
    retry (transient TPU-session errors are common); repeat offenders are
    treated as done, mirroring the reference 3090 CSV's omission of its
    infeasible shapes (SURVEY.md §6)."""
    sidecar = detail.with_suffix(".failures")
    if not sidecar.exists():
        return set()
    counts: dict = {}
    for line in sidecar.read_text().splitlines():
        mnk = line.split("\t", 1)[0].strip()
        if mnk:
            counts[mnk] = counts.get(mnk, 0) + 1
    return {mnk for mnk, c in counts.items() if c >= max_attempts}


def _parse_shapes(spec: str) -> list:
    """'m,n,k;m,n,k;...' or '@file' (one m,n,k per line, # comments)."""
    if spec.startswith("@"):
        lines = Path(spec[1:]).read_text().splitlines()
        items = [ln.strip() for ln in lines
                 if ln.strip() and not ln.lstrip().startswith("#")]
    else:
        items = spec.split(";")
    return [tuple(int(x) for x in s.split(",")) for s in items]


def pallas_win_band(m: int, n: int, k: int) -> bool:
    """Shapes where per-shape Pallas tiling plausibly beats XLA, from
    round-1 measured evidence (BENCH_NOTES.md): thin contractions (XLA's
    tiling degrades on small K) and skinny-M/N streaming shapes (whole-K
    resident blocks win).  Elsewhere XLA is at 94-98% of peak and the
    honest candidate is the best XLA formulation — so the campaign spends
    its Pallas-compile budget only where it can pay off."""
    if k <= 512 and max(m, n) >= 2048:
        return True
    if m <= 256 and min(n, k) >= 2048:
        return True
    if n <= 256 and min(m, k) >= 2048:
        return True
    return False


#: lean-eval speedup key -> CSV column
_LEAN_COLS = {
    "xla_matmul": "jnp.matmul",
    "xla_dot_tn": "XLA-dot-tn",
    "xla_dot_nn": "XLA-dot-nn",
    "xla_highest_tn": "XLA-highest-tn",
    "xla_highest_nn": "XLA-highest-nn",
    "xla_autotuned_tn": "XLA-AutoTuned-tn",
    "xla_autotuned_nn": "XLA-AutoTuned-nn",
}
_MAX_PAIRS = [("XLA-dot", "XLA-dot-tn", "XLA-dot-nn"),
              ("XLA-highest", "XLA-highest-tn", "XLA-highest-nn"),
              ("XLA-AutoTuned", "XLA-AutoTuned-tn", "XLA-AutoTuned-nn")]


def _row_from_lean(mnk: str, sp: dict) -> dict:
    row = {"mnk": mnk}
    for key, col in _LEAN_COLS.items():
        row[col] = round(sp[key], 4)
    for fam, tn, nn in _MAX_PAIRS:
        row[f"{fam}-max"] = round(min(row[tn], row[nn]), 4)
    return row


def cmd_eval(args) -> int:
    """Lean offline evaluation over the grid — one process per chunk,
    resumable CSV per accumulator family, JSONL detail sidecar with
    per-func medians and IQRs (the variance record VERDICT r1 #3 asks
    for).  Server-mode campaigns use cmd_eval_server below."""
    import json

    import jax.numpy as jnp

    from tpul2.autotune.db import default_db
    from tpul2.autotune.search import tune_shape
    from tpul2.dispatch import refresh_candidates
    from tpul2.harness.bench_suite import eval_shape_lean
    from tpul2.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    accs = args.accs
    outs = {acc: Path(args.out.format(acc=acc)) for acc in accs}
    for p in outs.values():
        p.parent.mkdir(parents=True, exist_ok=True)
    # ONE family-neutral sidecar per mode: every detail line carries BOTH
    # accumulator families' measurements (speedups are per-acc keys of the
    # same record), so per-family copies would be byte-identical
    # duplicates.  Named '..._all_...' since round 4 (VERDICT r3 weak #5:
    # the old float32-derived name made the bf16 sidecar look missing).
    detail = Path(args.detail or
                  args.out.format(acc="all").replace(".csv",
                                                     "_detail.jsonl"))
    if args.repair:
        for acc, p in outs.items():
            dropped = _repair_csv(p, threshold=args.repair_threshold,
                                  any_col_floor=args.repair_floor)
            if dropped:
                print(f"repair[{acc}]: re-evaluating {len(dropped)} tainted "
                      f"rows: {sorted(dropped)}", file=sys.stderr)
    failed = _load_failures(detail)
    if failed:
        print(f"skipping {len(failed)} repeat-failure shapes from "
              f"{detail.with_suffix('.failures').name}", file=sys.stderr)
        for p in outs.values():
            _restore_exhausted_rows(p, failed)
    done_sets = {acc: _load_done(p) | failed for acc, p in outs.items()}
    pool = (_parse_shapes(args.shapes) if getattr(args, "shapes", None)
            else grid(args.dims, args.max_shapes, args.max_elems,
                      order=args.order))
    shapes = [s for s in pool
              if any(f"{s[0]}x{s[1]}x{s[2]}" not in done_sets[acc]
                     for acc in accs)]
    if args.chunk_shapes:
        shapes = shapes[:args.chunk_shapes]
    print(f"evaluating {len(shapes)} shapes "
          f"({ {a: len(d) for a, d in done_sets.items()} } already done)",
          file=sys.stderr)

    db = default_db()
    files, writers = {}, {}
    for acc, p in outs.items():
        write_header = not p.exists()
        files[acc] = p.open("a", newline="")
        writers[acc] = csv.DictWriter(files[acc], fieldnames=CSV_COLUMNS)
        if write_header:
            writers[acc].writeheader()
    try:
        for (m, n, k) in shapes:
            mnk = f"{m}x{n}x{k}"
            # Pallas mini-tune only in the measured win bands (the compile
            # count of tile candidates dominated campaign wall clock);
            # everywhere else eval_shape_lean derives sentinel DB entries
            # from its own baseline measurements at zero extra compiles.
            if args.mini_tune and pallas_win_band(m, n, k):
                from tpul2.autotune.transfer import neighbor_seed_configs
                from tpul2.config import SPACE_REV
                from tpul2.harness import bench_utils as bu
                tuned_any = False
                for acc in accs:
                    entry = db.get_entry(m, n, k, acc)
                    stale = (entry is not None
                             and (entry.get("timing_rev", 1) < bu.TIMING_REV
                                  or entry.get("space_rev", 1) < SPACE_REV))
                    if args.tune_mode == "transfer":
                        # Zero-search tuning for the expensive tail: adopt
                        # the top adapted-neighbor Pallas config as the
                        # entry and let THIS shape's eval measure it — the
                        # publication measurement refreshes the entry's
                        # bookkeeping (heal_entries_from_eval) and the heal
                        # gate demotes it if it loses.  One kernel compile
                        # per family instead of a mini-tune's dozens.
                        if entry is None:
                            seeds = neighbor_seed_configs(db, m, n, k, acc,
                                                          limit=1,
                                                          with_scores=True)
                            # margin gate: spend the kernel compile only
                            # where the band's stored win predicts a real
                            # margin; below it the sentinel fill gives
                            # honest parity at zero extra compiles
                            if seeds and seeds[0][1] >= \
                                    args.transfer_min_speedup:
                                db.put(m, n, k, seeds[0][0], tflops=0.0,
                                       acc=acc,
                                       extra={"speedup_vs_xla": 1.0,
                                              "timing_rev": bu.TIMING_REV,
                                              "space_rev": SPACE_REV,
                                              "scope": "transfer"})
                                # persist now: if this shape's eval then
                                # fails, the adopted config must survive
                                # for the retry chunk (stale sentinels are
                                # refreshed by the eval's sentinel fill)
                                db.save()
                                tuned_any = True
                        continue
                    if entry is None or stale:
                        seeds = neighbor_seed_configs(db, m, n, k, acc)
                        if stale:
                            seeds = [db.get(m, n, k, acc)] + seeds
                        # neighbor-transfer seeding: with seeds available,
                        # skip full tile enumeration — each large-tile
                        # Mosaic compile costs 20-60 s, and the seeds carry
                        # the band's winning structure (see
                        # tpul2.autotune.transfer)
                        n_tiles = 0 if seeds else args.mini_tune_cands
                        try:
                            tune_shape(m, n, k, acc=acc, db=db,
                                       max_candidates=n_tiles,
                                       stage1_rounds=2, stage2_rounds=5,
                                       finalists=3, save=True,
                                       seed_configs=seeds or None)
                            tuned_any = True
                        except Exception as e:
                            print(f"{mnk}/{acc}: mini-tune failed "
                                  f"({type(e).__name__}: {str(e)[:120]})",
                                  file=sys.stderr)
                if tuned_any:
                    refresh_candidates()
            res = None
            for attempt in range(2):
                try:
                    # giants get fewer trials: their per-trial runtime is
                    # long and their rows are less noise-prone
                    # (compute-bound)
                    trials = (max(2, args.trials - 1)
                              if m * n * k >= (8192 ** 3) else args.trials)
                    res = eval_shape_lean(m, n, k, accs=accs,
                                          trials=trials,
                                          target_ms=args.target_ms,
                                          db=db if args.mini_tune else None)
                    if args.mini_tune:
                        # never-lose self-healing: demote losing configs to
                        # the fastest screened sentinel and re-measure once
                        from tpul2.harness.bench_suite import \
                            heal_entries_from_eval
                        demoted = heal_entries_from_eval(db, m, n, k, accs,
                                                         jnp.bfloat16, res)
                        if demoted:
                            print(f"{mnk}: healed {demoted}, re-measuring",
                                  file=sys.stderr)
                            refresh_candidates()
                            res = eval_shape_lean(m, n, k, accs=accs,
                                                  trials=trials,
                                                  target_ms=args.target_ms,
                                                  db=None)
                    break
                except Exception as e:
                    print(f"{mnk}: FAILED {type(e).__name__}: {e}",
                          file=sys.stderr)
                    res = None
                    # A stored Pallas winner that cannot compile on this
                    # device would otherwise drop the row from the campaign
                    # FOREVER (the shape is recorded as done below) —
                    # demote it to the fastest screened sentinel and retry
                    # the eval once (VERDICT r4 next-round #4).
                    if attempt == 0 and args.mini_tune:
                        from tpul2.harness.bench_suite import \
                            demote_uncompilable_entries
                        fixed = demote_uncompilable_entries(
                            db, m, n, k, accs)
                        if fixed:
                            print(f"{mnk}: demoted uncompilable {fixed}, "
                                  f"retrying eval", file=sys.stderr)
                            refresh_candidates()
                            continue
                    if args.fail_fast:
                        return 1
                    # campaign mode: record the failure and keep going —
                    # one infeasible giant must not end a 1,000-shape run
                    # (the reference's 3090 CSV similarly just omits its
                    # 264 infeasible shapes, SURVEY.md §6)
                    with detail.with_suffix(".failures").open("a") as ff:
                        ff.write(f"{mnk}\t{type(e).__name__}: {e}\n")
                    for acc in accs:
                        done_sets[acc].add(mnk)
                    break
            if res is None:
                continue
            for acc in accs:
                if mnk in done_sets[acc]:
                    continue
                writers[acc].writerow(_row_from_lean(mnk, res["speedups"][acc]))
                files[acc].flush()
            with detail.open("a") as df:
                df.write(json.dumps(res) + "\n")
            sp = res["speedups"][accs[0]]
            print(f"{mnk}: matmul={sp['xla_matmul']:.3f} "
                  f"AT-max={min(sp['xla_autotuned_tn'], sp['xla_autotuned_nn']):.3f} "
                  f"({res['elapsed_s']:.1f}s)", file=sys.stderr)
    finally:
        for f in files.values():
            f.close()
    return 0


SERVER_EXTRA_COLUMNS = ["iqr_rel", "quality"]


def cmd_eval_server(args) -> int:
    """Server-mode (Poisson-arrival) campaign — same resumable-CSV shape
    as cmd_eval, plus per-row honesty columns: iqr_rel (worst relative IQR
    across the measured functions) and quality ('ok' | 'floor_limited').
    VERDICT r1 #3: no silently-trusted server rows."""
    import json

    import jax.numpy as jnp

    from tpul2.autotune.db import default_db
    from tpul2.dispatch import refresh_candidates
    from tpul2.harness.bench_suite import (eval_shape_server_lean,
                                           heal_entries_from_eval)
    from tpul2.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    accs = args.accs
    outs = {acc: Path(args.out.format(acc=acc)) for acc in accs}
    for p in outs.values():
        p.parent.mkdir(parents=True, exist_ok=True)
    # family-neutral sidecar (see cmd_eval)
    detail = Path(args.detail or
                  args.out.format(acc="all").replace(".csv",
                                                     "_detail.jsonl"))
    if args.repair:
        for acc, p in outs.items():
            dropped = _repair_csv(p, threshold=args.repair_threshold,
                                  any_col_floor=args.repair_floor)
            if dropped:
                print(f"repair[{acc}]: re-evaluating {len(dropped)} tainted "
                      f"server rows: {sorted(dropped)}", file=sys.stderr)
    db = default_db()
    failed = _load_failures(detail)
    if failed:
        for p in outs.values():
            _restore_exhausted_rows(p, failed)
    done_sets = {acc: _load_done(p) | failed for acc, p in outs.items()}
    pool = (_parse_shapes(args.shapes) if getattr(args, "shapes", None)
            else grid(args.dims, args.max_shapes, args.max_elems,
                      order=args.order))
    shapes = [s for s in pool
              if any(f"{s[0]}x{s[1]}x{s[2]}" not in done_sets[acc]
                     for acc in accs)]
    if args.chunk_shapes:
        shapes = shapes[:args.chunk_shapes]
    print(f"server-evaluating {len(shapes)} shapes", file=sys.stderr)

    cols = CSV_COLUMNS + SERVER_EXTRA_COLUMNS
    files, writers = {}, {}
    for acc, p in outs.items():
        write_header = not p.exists()
        files[acc] = p.open("a", newline="")
        writers[acc] = csv.DictWriter(files[acc], fieldnames=cols)
        if write_header:
            writers[acc].writeheader()
    try:
        for (m, n, k) in shapes:
            mnk = f"{m}x{n}x{k}"
            try:
                res = eval_shape_server_lean(
                    m, n, k, accs=accs, n_requests=args.n_requests,
                    request_ms=args.request_ms, load=args.load)
                # never-lose healing for server rows too (VERDICT r2
                # next-round #2: server is where the bf16 family lost):
                # demote to the fastest family-screened variant and
                # re-measure ONCE, publishing that re-measurement
                # unconditionally.  ONLY quality='ok' rows may touch the
                # DB — a floor_limited measurement is jitter-dominated and
                # must never demote entries or overwrite offline-measured
                # bookkeeping (the row's own flag says so).
                demoted = (heal_entries_from_eval(db, m, n, k, accs,
                                                  jnp.bfloat16, res,
                                                  mode="server")
                           if res["quality"] == "ok" else [])
                if demoted:
                    print(f"{mnk}: healed {demoted}, re-measuring",
                          file=sys.stderr)
                    refresh_candidates()
                    res = eval_shape_server_lean(
                        m, n, k, accs=accs, n_requests=args.n_requests,
                        request_ms=args.request_ms, load=args.load)
            except Exception as e:
                print(f"{mnk}: FAILED {type(e).__name__}: {e}",
                      file=sys.stderr)
                if args.fail_fast:
                    return 1
                with detail.with_suffix(".failures").open("a") as ff:
                    ff.write(f"{mnk}\t{type(e).__name__}: {e}\n")
                for acc in accs:
                    done_sets[acc].add(mnk)
                continue
            iqr_rel = max(v["iqr_ms"] / v["ms"]
                          for v in res["per_func"].values())
            for acc in accs:
                if mnk in done_sets[acc]:
                    continue
                row = _row_from_lean(mnk, res["speedups"][acc])
                row["iqr_rel"] = round(iqr_rel, 4)
                row["quality"] = res["quality"]
                writers[acc].writerow(row)
                files[acc].flush()
            with detail.open("a") as df:
                df.write(json.dumps(res) + "\n")
            sp = res["speedups"][accs[0]]
            print(f"{mnk}: matmul={sp['xla_matmul']:.3f} "
                  f"AT-max={min(sp['xla_autotuned_tn'], sp['xla_autotuned_nn']):.3f} "
                  f"[{res['quality']}] ({res['elapsed_s']:.1f}s)",
                  file=sys.stderr)
    finally:
        for f in files.values():
            f.close()
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--dims", type=int, nargs="*",
                        default=REFERENCE_DIMS)
    common.add_argument("--max_shapes", type=int, default=None)
    common.add_argument("--max_elems", type=int, default=None,
                        help="skip shapes whose largest operand exceeds "
                             "this element count")
    common.add_argument("--acc", choices=["float32", "bfloat16"],
                        default="float32")

    t = sub.add_parser("tune", parents=[common])
    t.add_argument("--chunk", type=int, default=8)
    t.add_argument("--max_candidates", type=int, default=16)
    t.add_argument("--stage1_rounds", type=int, default=3)
    t.add_argument("--stage2_rounds", type=int, default=6)
    t.add_argument("--finalists", type=int, default=4)
    t.add_argument("--verbose", action="store_true")
    t.set_defaults(fn=cmd_tune)

    e = sub.add_parser("eval", parents=[common])
    e.add_argument("--accs", nargs="+", default=["float32"],
                   choices=["float32", "bfloat16"],
                   help="accumulator families evaluated in one pass "
                        "(baseline measurements are shared)")
    e.add_argument("--out", type=str, required=True,
                   help="CSV path; may contain {acc}")
    e.add_argument("--detail", type=str, default=None,
                   help="JSONL sidecar with per-func medians + IQRs")
    e.add_argument("--trials", type=int, default=3)
    e.add_argument("--target_ms", type=float, default=150.0)
    e.add_argument("--chunk_shapes", type=int, default=None,
                   help="process at most this many shapes then exit "
                        "(the driver loops; keeps jit caches bounded)")
    e.add_argument("--mini_tune", action="store_true", default=True)
    e.add_argument("--no_mini_tune", dest="mini_tune", action="store_false")
    e.add_argument("--mini_tune_cands", type=int, default=6)
    e.add_argument("--transfer_min_speedup", type=float, default=1.05,
                   help="transfer mode's margin gate: adopt a neighbor "
                        "config only when its stored win is at least this "
                        "(compiles go where the band predicts real wins)")
    e.add_argument("--tune_mode", choices=["mini", "transfer"],
                   default="mini",
                   help="win-band tuning strategy: 'mini' = seeded "
                        "mini-tune (default); 'transfer' = adopt the top "
                        "adapted-neighbor config with zero search and let "
                        "the eval itself measure/heal it (the compile-"
                        "budget mode for the expensive tail)")
    e.add_argument("--repair", action="store_true", default=True,
                   help="drop tainted CSV rows (candidate loss beyond "
                        "noise, or inconsistent columns) at startup so "
                        "they re-evaluate through the healing path")
    e.add_argument("--no_repair", dest="repair", action="store_false")
    e.add_argument("--repair_threshold", type=float, default=0.97)
    e.add_argument("--repair_floor", type=float, default=0.95,
                   help="any-column loss floor for the one journaled "
                        "re-measure (mirrors the heal gate)")
    e.add_argument("--order", choices=["lex", "cost", "stratified"],
                   default="cost")
    e.add_argument("--shapes", type=str, default=None,
                   help="explicit 'm,n,k;m,n,k;...' list evaluated INSTEAD "
                        "of the dims grid (priority passes, e.g. the round-"
                        "benchmark suite); still resumable/healed like any "
                        "campaign shape")
    e.add_argument("--fail_fast", action="store_true",
                   help="abort on the first shape failure (default: log to "
                        "the .failures sidecar and continue)")
    e.set_defaults(fn=cmd_eval)

    s = sub.add_parser("eval_server", parents=[common])
    s.add_argument("--accs", nargs="+", default=["float32"],
                   choices=["float32", "bfloat16"])
    s.add_argument("--out", type=str, required=True,
                   help="CSV path; may contain {acc}")
    s.add_argument("--detail", type=str, default=None)
    s.add_argument("--n_requests", type=int, default=16)
    s.add_argument("--request_ms", type=float, default=80.0,
                   help="per-request chained-program size; must sit well above\n                        the ~30 ms fence floor or rows get quality=floor_limited")
    s.add_argument("--load", type=float, default=1.0,
                   help="offered load as a fraction of capacity "
                        "(gap mean = service estimate / load)")
    s.add_argument("--repair", action="store_true", default=True,
                   help="drop tainted server rows at startup (same "
                        "journaled once-per-row loss policy as eval)")
    s.add_argument("--no_repair", dest="repair", action="store_false")
    s.add_argument("--repair_threshold", type=float, default=0.97)
    s.add_argument("--repair_floor", type=float, default=0.98,
                   help="any-column loss floor (server default matches "
                        "the heal gate: the bf16 family's systematic "
                        "-max losses are the VERDICT r2 #2 item)")
    s.add_argument("--chunk_shapes", type=int, default=None)
    s.add_argument("--order", choices=["lex", "cost", "stratified"],
                   default="cost")
    s.add_argument("--shapes", type=str, default=None,
                   help="explicit 'm,n,k;...' or '@file' list evaluated "
                        "INSTEAD of the dims grid (e.g. the stratified "
                        "server sample)")
    s.add_argument("--fail_fast", action="store_true")
    s.set_defaults(fn=cmd_eval_server)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
