"""Suite-scale (lean) per-shape evaluation — the 1,000-shape campaign engine.

The reference's published product is per-shape speedup CSVs over the full
{64..16384}^3 grid (SURVEY.md C14, eval_results/*.csv, ~1,000 rows per
device x precision).  Reproducing that coverage on a tunneled TPU backend is
compile-bound: the faithful per-baseline methodology (bench_offline._run_mode)
costs ~25 fresh XLA compiles per shape.  This module is the amortized path:

  - ONE probe compile sizes the rep count for every function of the shape;
  - each function gets ONE LeanTimer program (floor-subtracted, physical-
    minimum clamped) instead of ChainedTimer's two;
  - the XLA-AutoTuned-{nn,tn} baselines are DERIVED as the per-shape best
    of each layout's measured variant set (= the winner the explicit
    pre-tune in find_best_xla_variant would select, without re-timing it);
  - both accumulator families share one set of baseline measurements
    (the baselines don't depend on the candidate's accumulator).

Per-row variance (IQR over shuffled trials) is recorded alongside every
median so downstream CSVs can carry an honesty column (VERDICT r1 #3).
"""

from __future__ import annotations

import random
import time
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from tpul2.dispatch import candidate_fn
from tpul2.harness import bench_utils as bu
from tpul2.ops.baselines import AUTOTUNED_VARIANT_SETS, LEAN_EVAL_FUNCS


def _iqr(xs) -> float:
    arr = np.asarray(xs, np.float64)
    return float(np.percentile(arr, 75) - np.percentile(arr, 25))


def _candidate_with_options(acc: str, m: int, n: int, k: int, in_dtype,
                            mode: str = "offline"):
    """The candidate entry, carrying the dispatched sentinel's program-
    scope compiler options (if any) for the timing chain to apply.

    A flag-variant sentinel (e.g. 'nolhs_nn') wins through per-compilation
    XLA TPU flags; those can only attach at jit scope, so the harness
    resolves the shape's config and forwards the options to
    make_chained_runner — the identical mechanism the xla_nolhs_* BASELINE
    columns are measured with (no asymmetric advantage)."""
    from tpul2.dispatch import resolve_config
    from tpul2.ops.baselines import XLA_VARIANT_COMPILER_OPTIONS

    cand = candidate_fn(acc, mode=mode)
    cfg = resolve_config(m, n, k, acc, in_dtype, mode=mode)
    opts = (XLA_VARIANT_COMPILER_OPTIONS.get(cfg.xla_variant)
            if cfg.use_xla else None)
    if not opts:
        return cand

    def fn(a, b, b_t):
        return cand(a, b, b_t)
    fn._compiler_options = opts
    fn.__name__ = getattr(cand, "__name__", f"tpul2_{acc}")
    return fn


def eval_shape_server_lean(m: int, n: int, k: int,
                           accs: Sequence[str] = ("float32",),
                           in_dtype=jnp.bfloat16,
                           n_requests: int = 20,
                           request_ms: float = 40.0,
                           load: float = 1.0,
                           seed: int = 0) -> dict:
    """Server-mode (Poisson arrivals) measurement for one shape.

    The reference's server mode sleeps an Exponential(1/qps) gap between
    single GEMM calls so each call runs on a cooled-down device
    (benchmarking_server.py:127-145).  On a tunneled TPU backend a single
    call is unmeasurable below the ~30 ms fence floor, so the honest
    translation is per-REQUEST service time: each request is a chained
    program sized to ~request_ms (> floor), requests arrive with
    Exponential gaps (mean = service estimate / load), and we report
    p50/p99/IQR of floor-subtracted, physical-minimum-clamped service
    times.  A `quality` flag marks shapes where the floor jitter exceeds
    10% of the service time — those rows are published but flagged, never
    silently trusted (round-1's server CSV was quarantined for exactly
    this; VERDICT r1 weak #5).
    """
    t0 = time.perf_counter()
    funcs = {}
    for acc in accs:
        # server twins: dispatch prefers each shape's server-regime winner
        # (VERDICT r3 weak #3 — offline winners don't transfer)
        funcs[f"tpul2_{acc}"] = _candidate_with_options(
            acc, m, n, k, in_dtype, mode="server")
    funcs.update(LEAN_EVAL_FUNCS)

    rng = np.random.default_rng(seed)
    data0 = bu.fresh_inputs(rng, m, n, k, in_dtype)
    reps = bu.calibrated_reps(LEAN_EVAL_FUNCS["xla_matmul"], data0,
                              m, n, k, in_dtype, target_ms=request_ms)
    phys_req = bu.physical_min_ms(m, n, k, in_dtype) * reps

    timers = {name: bu.LeanTimer(fn, m, n, k, in_dtype, reps)
              for name, fn in funcs.items()}
    for t in timers.values():
        t.warmup(data0)

    floor = bu.fence_floor_ms(5)
    floor_iqr = _iqr([bu.fence_floor_ms(1) for _ in range(5)])
    est_service = request_ms  # request target ~ mean service
    gap_mean_s = est_service / load * 1e-3

    records = {name: [] for name in funcs}
    order = list(funcs)
    # order-bias control across funcs; seeded so trial ordering is
    # replayable from `seed` like the data/arrival draws (ADVICE r2 low #5)
    random.Random(seed).shuffle(order)
    for name in order:
        run = timers[name].run
        for _ in range(n_requests):
            time.sleep(float(rng.exponential(gap_mean_s)))
            data = bu.fresh_inputs(rng, m, n, k, in_dtype)
            t_req0 = time.perf_counter()
            bu.device_fence(run(*data))
            service = (time.perf_counter() - t_req0) * 1e3
            records[name].append(max(service - floor, phys_req))

    # Selection/publication split, as in eval_shape_lean: the derived
    # AutoTuned columns pick each layout's variant on the FIRST half of the
    # requests and publish the SECOND half's median — a min-over-variants
    # on one sample set is biased fast, which would overstate the baseline.
    per_func, sel_ms = {}, {}
    for name, ms_list in records.items():
        arr = np.asarray(ms_list, np.float64) / reps
        half = max(len(arr) // 2, 1)
        sel_ms[name] = float(np.median(arr[:half]))
        pub = arr[half:] if len(arr) > 1 else arr
        per_func[name] = {
            "ms": float(np.median(pub)),          # p50 per call
            "p99_ms": float(np.percentile(pub, 99)),
            "iqr_ms": _iqr(pub),
            "tflops": bu.tflops(m, n, k, float(np.median(pub))),
        }
    for derived, variants in AUTOTUNED_VARIANT_SETS.items():
        best = min(variants, key=lambda v: sel_ms[v])
        per_func[derived] = dict(per_func[best], variant=best)

    p50s = [v["ms"] for v in per_func.values()]
    quality = ("ok" if floor_iqr <= 0.1 * min(p50s) * reps
               else "floor_limited")
    speedups = {}
    for acc in accs:
        cand = per_func[f"tpul2_{acc}"]["ms"]
        speedups[acc] = {name: per_func[name]["ms"] / cand
                         for name in per_func
                         if not name.startswith("tpul2")}
    return {
        "mnk": [m, n, k],
        "mode": "server",
        "per_func": per_func,
        "speedups": speedups,
        "reps_per_request": reps,
        "n_requests": n_requests,
        "floor_ms": floor,
        "floor_iqr_ms": floor_iqr,
        "quality": quality,
        "elapsed_s": time.perf_counter() - t0,
    }


def _screen_variant_exact(variant: str, m: int, n: int, k: int,
                          in_dtype, acc: str, seed: int) -> bool:
    """0/1 exactness screen of one XLA sentinel formulation (the family
    contract — same criterion as the tuner's finalist screen,
    tpul2.autotune.search._ShapeTuning.finish)."""
    import jax

    from tpul2.harness.correctness import zero_one_density
    from tpul2.ops.baselines import XLA_VARIANT_FNS

    # The screen keys on the ACCUMULATOR family, not the input dtype
    # (ADVICE r2 medium #1: keying on in_dtype made the f32 branch
    # unreachable — inputs are always bf16 — so bf16-rounded formulations
    # passed vacuously).  For acc=float32 the sums reach ~K/4 (p=0.5, up
    # to 2^24-exact in f32); the pass criterion accepts a result that is
    # the f32-accumulated product EITHER exactly (the variant's f32
    # product survives the jit boundary — XLA folds away intermediate
    # converts) OR after exactly ONE final bf16 rounding (in case a
    # compiler change ever materializes the cast).  A formulation that
    # ACCUMULATES through bf16 (split-K partial rounding) differs from
    # both wherever K makes partial sums exceed 256, so the family
    # contract holds without depending on XLA's convert folding.
    bf16ish = acc == "bfloat16"
    dens = zero_one_density(k, "bfloat16" if bf16ish else "float32")
    bound = 256.0 if bf16ish else float(1 << 24)
    key = jax.random.key(seed)

    @jax.jit
    def diff(key):
        ka, kb = jax.random.split(key)
        sa = (jax.random.uniform(ka, (m, k)) < dens).astype(in_dtype)
        sb = (jax.random.uniform(kb, (k, n)) < dens).astype(in_dtype)
        sbt = jnp.swapaxes(sb, 0, 1)
        truth = jax.lax.dot_general(
            sa.astype(jnp.float32), sb.astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        out = XLA_VARIANT_FNS[variant](sa, sb, sbt).astype(jnp.float32)
        d = jnp.abs(out - truth)
        if not bf16ish:
            truth_r1 = truth.astype(jnp.bfloat16).astype(jnp.float32)
            d = jnp.minimum(d, jnp.abs(out - truth_r1))
        d = jnp.where(jnp.abs(truth) <= bound, d, 0.0)
        finite = jnp.all(jnp.isfinite(out))
        return jnp.where(finite, jnp.max(d), jnp.inf)

    return float(jax.device_get(diff(key))) == 0.0


def _tune_sentinels_from_eval(db, m: int, n: int, k: int, accs,
                              in_dtype, sel_ms: dict, seed: int) -> bool:
    """Derive per-acc sentinel DB entries from the eval's own baseline
    measurements (fastest exactness-screened variant) — the campaign-scale
    replacement for a separate sentinel-only tune_shape pass, whose compile
    count dominated wall clock.  Only fills missing or stale-SENTINEL
    entries; stored Pallas winners are left for the full tuner."""
    from tpul2.config import SPACE_REV, XLA_VARIANTS_FOR_ACC
    from tpul2.harness.bench_utils import TIMING_REV

    changed = False
    for acc in accs:
        allowed = XLA_VARIANTS_FOR_ACC[acc]
        ranked = sorted((v for v in LEAN_EVAL_FUNCS
                         if v in sel_ms and v[len("xla_"):] in allowed),
                        key=lambda v: sel_ms[v])
        entry = db.get_entry(m, n, k, acc, in_dtype)
        if entry is not None:
            stale = (entry.get("timing_rev", 1) < TIMING_REV
                     or entry.get("space_rev", 1) < SPACE_REV)
            if not (stale and entry["config"].get("use_xla")):
                continue
        best = None
        for name in ranked:
            variant = name[len("xla_"):]
            if _screen_variant_exact(variant, m, n, k, in_dtype, acc, seed):
                best = name
                break
        if best is None:
            continue
        from tpul2.config import KernelConfig
        db.put(m, n, k, KernelConfig.xla(best[len("xla_"):]),
               bu.tflops(m, n, k, sel_ms[best]), acc=acc,
               in_dtype=in_dtype,
               extra={"speedup_vs_xla": sel_ms["xla_matmul"] / sel_ms[best],
                      "xla_tflops": bu.tflops(m, n, k,
                                              sel_ms["xla_matmul"]),
                      "timing_rev": TIMING_REV, "space_rev": SPACE_REV,
                      "scope": "sentinels"})
        changed = True
    if changed:
        db.save()
    return changed


def _best_screened_variant(per_func: dict, m: int, n: int, k: int,
                           in_dtype, acc: str, seed: int):
    """Fastest phase-2-measured XLA variant that passes the 0/1 exactness
    screen for this acc family, or None.  Only formulations admitted by
    the family's variant set compete (config.XLA_VARIANTS_FOR_ACC)."""
    from tpul2.config import XLA_VARIANTS_FOR_ACC
    allowed = XLA_VARIANTS_FOR_ACC[acc]
    ranked = sorted((v for v in LEAN_EVAL_FUNCS
                     if v in per_func and v[len("xla_"):] in allowed),
                    key=lambda v: per_func[v]["ms"])
    for name in ranked:
        if _screen_variant_exact(name[len("xla_"):], m, n, k, in_dtype,
                                 acc, seed):
            return name
    return None


#: Speedup keys that feed published CSV columns (run_suite._LEAN_COLS +
#: the derived AutoTuned pair); the heal gate runs over all of them.
PUBLISHED_SPEEDUP_KEYS = (
    "xla_matmul", "xla_dot_tn", "xla_dot_nn", "xla_highest_tn",
    "xla_highest_nn", "xla_autotuned_tn", "xla_autotuned_nn")


def heal_entries_from_eval(db, m: int, n: int, k: int, accs, in_dtype,
                           res: dict, threshold: float = 0.97,
                           max_threshold: float = 0.98,
                           seed: int = 0, mode: str = "offline") -> list:
    """Post-eval self-healing of the tuning DB (the never-lose contract).

    Two repairs, both from the eval's own PUBLICATION-phase measurements
    (no extra device work beyond the exactness screens):

      1. demote-on-loss: if the candidate lost beyond the noise band to
         ``jnp.matmul`` (``speedup < threshold``) or to ANY published
         column (``< max_threshold`` — the derived -max columns are a
         min over two near-identical noisy draws, structurally ~1% fast,
         so their gate is looser; VERDICT r2 next-round #2: the
         never-lose contract must hold against the ``-max`` columns, not
         just ``jnp.matmul``), the stored config
         — stale round-1 Pallas tilings and corrupted-selection sentinels
         alike — is replaced by the fastest exactness-screened XLA variant
         measured in phase 2 (the prior config is kept as ``demoted_from``);
      2. sentinel bookkeeping refresh: any sentinel entry's
         ``speedup_vs_xla``/``tflops`` are rewritten from phase-2 medians,
         so a corrupted selection-phase sample (observed: a 15.5x
         'speedup' on a use_xla entry) cannot persist in the DB.

    ``mode='server'`` (VERDICT r3 weak #3): the eval measured the server
    Poisson regime, whose winners demonstrably differ from offline ones.
    Demotions then write the shape's ``server`` sub-entry — the offline
    config and its offline-measured bookkeeping are NEVER touched (round
    3's server campaign overwrote offline winners with server-regime
    choices, which the offline repair pass then had to heal back).

    Returns the list of accs whose entry was DEMOTED (callers should
    refresh dispatch and re-measure those rows)."""
    from tpul2.config import SPACE_REV, KernelConfig
    from tpul2.harness.bench_utils import TIMING_REV

    per_func = res["per_func"]
    demoted = []
    changed = False
    for acc in accs:
        entry = db.get_entry(m, n, k, acc, in_dtype)
        sp = res["speedups"][acc]
        lost = (sp.get("xla_matmul", 1.0) < threshold
                or min((sp.get(c, 1.0) for c in PUBLISHED_SPEEDUP_KEYS),
                       default=1.0) < max_threshold)
        # the config this eval actually dispatched (mode-dependent)
        server_sub = (entry or {}).get("server") if mode == "server" else None
        live_cfg = (server_sub["config"] if server_sub
                    else entry["config"] if entry else None)
        is_sentinel = bool(live_cfg and live_cfg.get("use_xla"))
        if lost:
            best = _best_screened_variant(per_func, m, n, k, in_dtype,
                                          acc, seed)
            if best is None:
                continue
            variant = best[len("xla_"):]
            if is_sentinel and live_cfg.get("xla_variant") == variant:
                # Already dispatching the measured-best variant: there is
                # no better config to switch to.  Re-measure only for a
                # REAL loss (vs jnp.matmul beyond the noise band) — a
                # -max-column-only shortfall at this point is the derived
                # columns' min-of-two-medians bias (~1%), which a
                # re-measurement reproduces rather than repairs; spending
                # a second eval on it is pure campaign churn.
                if sp.get("xla_matmul", 1.0) < threshold:
                    demoted.append(acc)
                continue
            heal_extra = {
                "speedup_vs_xla": (per_func["xla_matmul"]["ms"]
                                   / per_func[best]["ms"]),
                "timing_rev": TIMING_REV, "space_rev": SPACE_REV,
                "scope": f"{mode}_heal" if mode != "offline"
                         else "heal_demote",
                "demoted_from": dict(live_cfg) if live_cfg else None,
                "tflops": per_func[best]["tflops"],
            }
            if mode == "server":
                db.put_server(m, n, k, KernelConfig.xla(variant),
                              acc=acc, in_dtype=in_dtype, extra=heal_extra)
            else:
                heal_extra.pop("tflops")
                db.put(m, n, k, KernelConfig.xla(variant),
                       per_func[best]["tflops"], acc=acc, in_dtype=in_dtype,
                       extra=heal_extra)
            demoted.append(acc)
            changed = True
        elif mode == "server":
            # bookkeeping refresh for an existing server sub-entry only;
            # offline fields stay offline-measured
            if server_sub and server_sub["config"].get("use_xla"):
                name = f"xla_{server_sub['config'].get('xla_variant', 'matmul')}"
                if name in per_func:
                    server_sub["tflops"] = per_func[name]["tflops"]
                    server_sub["speedup_vs_xla"] = (
                        per_func["xla_matmul"]["ms"] / per_func[name]["ms"])
                    server_sub["timing_rev"] = TIMING_REV
                    changed = True
        elif is_sentinel:
            variant = entry["config"].get("xla_variant", "matmul")
            name = f"xla_{variant}"
            if name in per_func:
                entry["tflops"] = per_func[name]["tflops"]
                entry["speedup_vs_xla"] = (per_func["xla_matmul"]["ms"]
                                           / per_func[name]["ms"])
                entry["timing_rev"] = TIMING_REV
                # A statically seeded entry (seed_tail_entries: scope
                # 'transfer_static', measured=False) just received a real
                # publication-phase measurement — promote it so
                # dispatch._neighbor_config ranks it with measured
                # neighbors (ADVICE r3 low #3).
                if not entry.get("measured", True):
                    entry["measured"] = True
                    if entry.get("scope") == "transfer_static":
                        entry["scope"] = "transfer"
                changed = True
        elif entry is not None and f"tpul2_{acc}" in per_func:
            # Pallas entry that did NOT lose: refresh its bookkeeping from
            # this eval's publication-phase candidate measurement (matters
            # for 'transfer'-scope entries recorded with provisional
            # numbers — their real speedup seeds future neighbor
            # transfers).
            cand = per_func[f"tpul2_{acc}"]
            entry["tflops"] = cand["tflops"]
            entry["speedup_vs_xla"] = (per_func["xla_matmul"]["ms"]
                                       / cand["ms"])
            entry["timing_rev"] = TIMING_REV
            if not entry.get("measured", True):
                entry["measured"] = True
                if entry.get("scope") == "transfer_static":
                    entry["scope"] = "transfer"
            changed = True
    if changed:
        db.save()
    return demoted


def demote_to_fastest_sentinel(db, m: int, n: int, k: int, acc: str,
                               reason: str,
                               in_dtype=jnp.bfloat16) -> Optional[str]:
    """Replace the stored winner with the fastest exactness-screened XLA
    sentinel, measured fresh on this device (VERDICT r4 next-round #4: a
    Pallas winner that persistently fails on-chip must be demoted, never
    served).  The race is ``tune_shape`` over the sentinel-only candidate
    set (``max_candidates=0`` — config.candidate_configs always includes
    every family-admissible formulation), so selection methodology and the
    0/1 screen are identical to a full tune.  Records ``demoted_from`` /
    ``demotion_reason``.  Returns the adopted variant name, or None if the
    race itself failed (e.g. a compile-service outage — the broken entry
    is then left for a later pass rather than blindly rewritten)."""
    from tpul2.autotune.search import tune_shape

    old = db.get_entry(m, n, k, acc, in_dtype)
    old_cfg = dict(old["config"]) if old else None
    try:
        res = tune_shape(m, n, k, acc=acc, in_dtype=in_dtype, db=db,
                         max_candidates=0, stage1_rounds=3, stage2_rounds=8,
                         finalists=4, save=True)
    except Exception:
        return None
    entry = db.get_entry(m, n, k, acc, in_dtype)
    entry["demoted_from"] = old_cfg
    entry["demotion_reason"] = reason
    entry["scope"] = "compile_demote"
    db.save()
    return res.best.xla_variant


def demote_uncompilable_entries(db, m: int, n: int, k: int, accs,
                                in_dtype=jnp.bfloat16) -> list:
    """After an eval failure: demote stored Pallas winners that fail to
    compile/run ON THIS DEVICE, so the shape's row can be measured instead
    of being dropped from the campaign forever (run_suite records a failed
    shape as done).  Fires only when a trivial program still executes (the
    failure is config-specific, not a pool outage); each config gets one
    retry after a pause before the verdict.  Returns the demoted accs."""
    import jax

    try:  # pool-alive canary (CLAUDE.md protocol)
        float(jax.device_get((jnp.ones((8, 128)) * 2)[0, 0]))
    except Exception:
        return []

    from tpul2.autotune.search import _make_fn
    from tpul2.config import KernelConfig

    demoted = []
    for acc in accs:
        entry = db.get_entry(m, n, k, acc, in_dtype)
        if entry is None or entry["config"].get("use_xla"):
            continue
        cfg = KernelConfig(**entry["config"])
        f32_ok = cfg.serves_out_dtype(m, n, k, in_dtype, jnp.float32)
        out_dt = jnp.float32 if (acc == "float32" and f32_ok) \
            else jnp.bfloat16
        a = jnp.zeros((m, k), in_dtype)
        b = jnp.zeros((k, n), in_dtype)
        b_t = jnp.swapaxes(b, 0, 1)
        err = None
        for attempt in range(2):
            try:
                fn = _make_fn(cfg, out_dt, interpret=False)
                float(jax.device_get(fn(a, b, b_t)[0, 0]))
                err = None
                break
            except Exception as e:
                err = f"{type(e).__name__}: {str(e)[:160]}"
                if attempt == 0:
                    time.sleep(20)
        if err is None:
            continue
        variant = demote_to_fastest_sentinel(
            db, m, n, k, acc,
            reason=f"on-device compile/run failure: {err}",
            in_dtype=in_dtype)
        if variant is not None:
            demoted.append(acc)
    return demoted


def eval_shape_lean(m: int, n: int, k: int,
                    accs: Sequence[str] = ("float32",),
                    in_dtype=jnp.bfloat16,
                    trials: int = 3,
                    target_ms: float = 150.0,
                    seed: int = 0,
                    probe_reps: int = 32,
                    extra_funcs: Optional[dict] = None,
                    db=None,
                    sel_trials: int = 2) -> dict:
    """Measure candidate(s) + all lean baselines for one shape.

    Two phases, mirroring the reference's pre-tune/benchmark split
    (SURVEY.md §3.5): a short SELECTION phase times the XLA baselines
    (choosing each AutoTuned layout's variant, and — when ``db`` is given —
    deriving sentinel DB entries for missing/stale shapes at zero extra
    compile cost); the PUBLICATION phase then re-measures every published
    column (candidates + all variants) interleaved and shuffled, so no
    column reuses the measurement that selected it.

    Returns {"per_func": {name: {"ms", "iqr_ms", "tflops"}},
             "speedups": {acc: {baseline_or_derived: speedup}},
             "reps", "elapsed_s"}.
    """
    t0 = time.perf_counter()
    rng = np.random.default_rng(seed)
    data0 = bu.fresh_inputs(rng, m, n, k, in_dtype)

    # one shared calibrated probe sizes reps for every function of this
    # shape (iterative refinement — in the dispatch-floor regime a short
    # probe cannot resolve sub-µs per-call times, see bu.calibrated_reps)
    reps = bu.calibrated_reps(LEAN_EVAL_FUNCS["xla_matmul"], data0,
                              m, n, k, in_dtype, target_ms=target_ms,
                              probe_reps=probe_reps)

    base_funcs = dict(LEAN_EVAL_FUNCS)
    if extra_funcs:
        base_funcs.update(extra_funcs)
    timers = {name: bu.LeanTimer(fn, m, n, k, in_dtype, reps)
              for name, fn in base_funcs.items()}
    for t in timers.values():
        t.warmup(data0)

    # ---- phase 1: selection (baselines only) ----
    shuffler = random.Random(seed)  # replayable ordering (ADVICE r2 low #5)
    sel_records = {name: [] for name in base_funcs}
    order = list(base_funcs)
    for _ in range(max(sel_trials, 1)):
        data = bu.fresh_inputs(rng, m, n, k, in_dtype)
        shuffler.shuffle(order)
        for name in order:
            sel_records[name].append(timers[name].measure(data))
    sel_ms = {name: float(np.median(v)) for name, v in sel_records.items()}
    at_choice = {derived: min(variants, key=lambda v: sel_ms[v])
                 for derived, variants in AUTOTUNED_VARIANT_SETS.items()}

    if db is not None:
        if _tune_sentinels_from_eval(db, m, n, k, accs, in_dtype, sel_ms,
                                     seed):
            from tpul2.dispatch import refresh_candidates
            refresh_candidates()

    # ---- phase 2: publication (candidates + every baseline column) ----
    funcs = dict(base_funcs)
    for acc in accs:
        funcs[f"tpul2_{acc}"] = _candidate_with_options(acc, m, n, k,
                                                        in_dtype)
        timers[f"tpul2_{acc}"] = bu.LeanTimer(funcs[f"tpul2_{acc}"],
                                              m, n, k, in_dtype, reps)
        timers[f"tpul2_{acc}"].warmup(data0)

    records = {name: [] for name in funcs}
    order = list(funcs)
    for trial in range(trials):
        data = bu.fresh_inputs(rng, m, n, k, in_dtype)
        shuffler.shuffle(order)  # order-bias control (reference C5 :132)
        for name in order:
            records[name].append(timers[name].measure(data))

    per_func = {}
    for name, ms_list in records.items():
        med = float(np.median(ms_list))
        per_func[name] = {
            "ms": med,
            "iqr_ms": _iqr(ms_list),
            "tflops": bu.tflops(m, n, k, med),
        }

    # derived autotuned columns: the phase-1-selected variant's PHASE-2
    # measurement (selection and publication never share a sample, so the
    # min-of-medians bias of a derived column vanishes)
    for derived, best in at_choice.items():
        per_func[derived] = dict(per_func[best], variant=best)

    speedups = {}
    for acc in accs:
        cand_ms = per_func[f"tpul2_{acc}"]["ms"]
        speedups[acc] = {
            name: per_func[name]["ms"] / cand_ms
            for name in per_func if not name.startswith("tpul2")}
    return {
        "mnk": [m, n, k],
        "per_func": per_func,
        "speedups": speedups,
        "reps": reps,
        "trials": trials,
        "elapsed_s": time.perf_counter() - t0,
    }
