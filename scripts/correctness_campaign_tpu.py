#!/usr/bin/env python
"""On-chip correctness campaign: every tuned Pallas config through the 0/1
gate ON THE REAL TPU (VERDICT r3 next-round #8).

The interpret-mode campaign (scripts/correctness_campaign.py) is the
sanitizer pass — out-of-bounds block reads are hard errors there — but the
reference's gate always runs on the device that serves the kernels
(zero_one_correctness_check.py:192-271), and 12 giant configs exceeded the
interpret cost cap and were never checked anywhere.  This tool runs the
full DB of non-sentinel winners on the TPU with NO cost cap.

Device-side methodology (the host-truth gate of correctness.py would pull
full outputs through the tunnel — a 16384^2 f32 result is ~1 GB, minutes
per transfer): truth is an INDEPENDENT on-device f32/HIGHEST dot_general on
0/1 inputs (integer-exact below the family bound — the same trust anchor as
the tuner's finalist screen, autotune/search.py finish()); the comparison
reduces to ONE scalar per (config, iteration).  The guard-band canary runs
the padded kernel and reduces the pad region on device the same way.

Resumable AND config-aware: results append to a JSONL with the verified
config embedded; a retuned winner re-verifies automatically (the verdict
belongs to the config, not the shape).  A config that fails with a live
pool is retried once; failing both attempts, it is DEMOTED to the fastest
exactness-screened XLA sentinel (the reference gate hard-fails before any
benchmark, zero_one_correctness_check.py:263-268 — on an autotuned library
the equivalent stance is demote-to-sentinel, recorded as demoted_from/
demotion_reason; disable with --no_demote).  A summary JSON is (re)written
at the end of every run.

  timeout 3600 python scripts/correctness_campaign_tpu.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


#: stderr signatures of infrastructure failure (the remote-compile service
#: 500s in bursts; the pool has documented outage windows) — retryable,
#: unlike a numerical failure, whose verdict must never be rerolled.
TRANSIENT_SIGNATURES = ("remote_compile", "HTTP 500", "UNAVAILABLE",
                        "DEADLINE_EXCEEDED", "failed to connect")


def load_done(jsonl_text: str) -> set:
    """(mnk, acc) keys that should NOT be re-run on resume.

    A pass is done; a numerical failure is done (final verdict); a failure
    with a transient infrastructure signature is retried — and a later
    retry's verdict supersedes it (records are processed in order).
    """
    done: set = set()
    for line in jsonl_text.splitlines():
        try:
            r = json.loads(line)
            key = (r["mnk"], r["acc"])
        except Exception:
            # tolerate corrupt/foreign jsonl lines — a line that parses as
            # JSON but is not a record with mnk/acc must not abort resume
            # (ADVICE r4 low #2)
            continue
        if r.get("pass"):
            done.add(key)
        elif any(s in r.get("error", "") for s in TRANSIENT_SIGNATURES):
            done.discard(key)
        else:
            done.add(key)
    return done


def load_latest_configs(jsonl_text: str) -> dict:
    """(mnk, acc) -> the config of the LATEST record that carries one.

    Records written since round 5 embed the verified config; older records
    have only the key and cannot be invalidated by a retune."""
    latest: dict = {}
    for line in jsonl_text.splitlines():
        try:
            r = json.loads(line)
            if isinstance(r, dict) and "config" in r:
                latest[(r["mnk"], r["acc"])] = r["config"]
        except Exception:
            continue
    return latest


def verdict_covers(done: set, latest_cfg: dict, key, current_cfg) -> bool:
    """True if a stored verdict covers the CURRENT config (resume skip).

    The verdict belongs to the config it ran against: a shape retuned to
    a different config since the record was written must re-verify, even
    though its key is 'done'."""
    rec_cfg = latest_cfg.get(key)
    return key in done and (rec_cfg is None or rec_cfg == current_cfg)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--db", default="tpul2/data/tunedb_v5e.json")
    ap.add_argument("--out",
                    default="eval_results/correctness_campaign_tpu.json")
    ap.add_argument("--jsonl",
                    default="eval_results/correctness_campaign_tpu.jsonl")
    ap.add_argument("--iterations", type=int, default=2)
    ap.add_argument("--budget_s", type=float, default=3300.0,
                    help="stop starting new configs past this wall budget "
                         "(resume on the next run)")
    ap.add_argument("--no_demote", dest="demote", action="store_false",
                    help="report persistent failures without demoting the "
                         "DB entry to the fastest screened sentinel")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpul2.autotune.db import TuneDB
    from tpul2.config import KernelConfig
    from tpul2.dispatch import matmul
    from tpul2.harness.correctness import EXACT_BOUND, zero_one_density
    from tpul2.utils.platform import enable_compilation_cache, on_tpu

    if not on_tpu():
        print("correctness_campaign_tpu: not on a TPU backend — refusing "
              "(use scripts/correctness_campaign.py for the interpret "
              "sweep)", file=sys.stderr)
        return 2
    enable_compilation_cache()

    db = TuneDB(path=args.db).load()
    jsonl = Path(args.jsonl)
    done = load_done(jsonl.read_text()) if jsonl.exists() else set()

    latest_cfg = (load_latest_configs(jsonl.read_text())
                  if jsonl.exists() else {})

    todo = [((m, n, k), acc, entry)
            for (m, n, k), acc, entry in sorted(db.items())
            if not (entry.get("config") or {}).get("use_xla")
            and not verdict_covers(done, latest_cfg, (f"{m}x{n}x{k}", acc),
                                   entry.get("config"))]
    print(f"on-TPU correctness campaign: {len(todo)} Pallas configs to "
          f"check ({len(done)} already done)", file=sys.stderr)

    t0 = time.time()
    jsonl.parent.mkdir(parents=True, exist_ok=True)
    n_fail = 0
    for (m, n, k), acc, entry in todo:
        if time.time() - t0 > args.budget_s:
            print(f"budget reached with "
                  f"{len(todo) - len(done)} configs left; resumable",
                  file=sys.stderr)
            break
        cfg = KernelConfig(**entry["config"])
        # Gate at the widest out_dtype DISPATCH would serve through this
        # config.  Requesting f32 out on a config whose output block only
        # fits VMEM at 2 bytes would Mosaic-compile-fail — but dispatch
        # serves that request through the sentinel (dispatch.matmul's
        # out_dtype feasibility guard), so the kernel's own contract is
        # bf16 delivery; gate it there, with the bf16-family 0/1 bound
        # (products <= 256 are exactly representable in bf16, keeping the
        # diff == 0.0 criterion meaningful).
        f32_servable = cfg.serves_out_dtype(m, n, k, jnp.bfloat16,
                                            jnp.float32)
        out_dt = jnp.float32 if f32_servable else jnp.bfloat16
        fam = ("bfloat16" if (acc == "bfloat16" or not f32_servable)
               else "float32")
        dens = zero_one_density(k, fam)
        bound = float(EXACT_BOUND[fam])

        def gate(seed, _cfg=cfg, _acc=acc, _dens=dens, _bound=bound,
                 _out_dt=out_dt):
            @jax.jit
            def prog(key):
                ka, kb = jax.random.split(key)
                a = (jax.random.uniform(ka, (m, k)) < _dens).astype(
                    jnp.bfloat16)
                b = (jax.random.uniform(kb, (k, n)) < _dens).astype(
                    jnp.bfloat16)
                b_t = jnp.swapaxes(b, 0, 1)
                truth = jax.lax.dot_general(
                    a.astype(jnp.float32), b.astype(jnp.float32),
                    (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
                out = matmul(a, b, acc=_acc, config=_cfg, b_t=b_t,
                             out_dtype=_out_dt,
                             interpret=False).astype(jnp.float32)
                d = jnp.abs(out - truth)
                d = jnp.where(jnp.abs(truth) <= _bound, d, 0.0)
                finite = jnp.all(jnp.isfinite(out))
                return jnp.where(finite, jnp.max(d), jnp.inf)
            return float(jax.device_get(prog(jax.random.key(seed))))

        def canary(seed, _cfg=cfg, _dens=dens):
            """Guard-band check, on device: the padded kernel output's pad
            rows/cols must be exactly 0 (reference 'memory overflow'
            canary, zero_one_correctness_check.py:98-149)."""
            from tpul2.ops.matmul import pallas_matmul_padded
            mp = -(-m // _cfg.bm) * _cfg.bm
            np_ = -(-n // _cfg.bn) * _cfg.bn
            if mp == m and np_ == n:
                return 0.0  # no pad region exists for this tiling

            @jax.jit
            def prog(key):
                ka, kb = jax.random.split(key)
                a = (jax.random.uniform(ka, (m, k)) < _dens).astype(
                    jnp.bfloat16)
                b = (jax.random.uniform(kb, (k, n)) < _dens).astype(
                    jnp.bfloat16)
                out = pallas_matmul_padded(a, b, _cfg, out_dtype=out_dt)
                rows = (jnp.max(jnp.abs(out[m:, :]))
                        if out.shape[0] > m else 0.0)
                cols = (jnp.max(jnp.abs(out[:, n:]))
                        if out.shape[1] > n else 0.0)
                return jnp.maximum(rows, cols)
            return float(jax.device_get(prog(jax.random.key(seed))))

        def pool_alive() -> bool:
            """Tiny canary: an infra outage fails EVERYTHING; only a
            failure with a live pool may be blamed on the config."""
            try:
                return float(jax.device_get(
                    (jnp.ones((8, 128)) * 2)[0, 0])) == 2.0
            except Exception:
                return False

        t_cfg = time.time()
        base = {"mnk": f"{m}x{n}x{k}", "acc": acc,
                "config": dict(entry["config"]),
                "out_dtype": jnp.dtype(out_dt).name}
        rec = None
        err = None
        for try_i in range(2):
            try:
                diffs = [gate(100 * try_i + s)
                         for s in range(args.iterations)]
                pad_max = canary(7)
                ok = all(d == 0.0 for d in diffs) and pad_max == 0.0
                rec = {**base, "diffs": diffs, "pad_max": pad_max,
                       "pass": ok}
                if try_i:
                    rec["retried_after"] = err
                break  # numerical verdicts are final — never rerolled
            except Exception as e:
                err = f"{type(e).__name__}: {str(e)[:200]}"
                if not pool_alive():
                    rec = {**base, "pass": False, "error": err,
                           "infra": True}
                    break
                # pool alive → the failure is config-specific; one retry
                # distinguishes a compile-service blip from a persistent
                # Mosaic failure
        if rec is None:  # config-specific failure on BOTH attempts
            rec = {**base, "pass": False, "error": err, "persistent": True}
        if not f32_servable:
            rec["note"] = ("f32-out infeasible for this tiling; "
                           "dispatch serves f32 requests via the "
                           "sentinel (out_dtype guard)")
        if not rec["pass"] and not rec.get("infra") and args.demote:
            # VERDICT r4 next-round #4: a winner that persistently fails
            # on the serving device must be demoted, never served.  The
            # reference gate hard-fails before any benchmark
            # (zero_one_correctness_check.py:263-268); on an autotuned
            # library the equivalent stance is demote-to-sentinel.
            from tpul2.harness.bench_suite import demote_to_fastest_sentinel
            reason = ("on-chip 0/1 gate failure" if "error" not in rec
                      else f"persistent on-chip failure: {err[:140]}")
            variant = demote_to_fastest_sentinel(db, m, n, k, acc,
                                                 reason=reason)
            if variant is not None:
                rec["demoted_to"] = variant
        rec["elapsed_s"] = round(time.time() - t_cfg, 1)
        if not rec["pass"]:
            n_fail += 1
        with jsonl.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"{m}x{n}x{k}/{acc}: "
              f"{'PASS' if rec['pass'] else 'FAIL ' + str(rec)} "
              f"({rec['elapsed_s']}s)", file=sys.stderr)

    # summary over the FULL jsonl (all runs); a retried config's LATEST
    # record supersedes earlier transient-failure records.  Only records
    # for CURRENT Pallas winners count (a record whose shape has since
    # been retuned to a sentinel — or to a different Pallas config — is
    # history, not coverage; stale records once drove "skipped" negative).
    by_key = {}
    for line in jsonl.read_text().splitlines():
        try:
            r = json.loads(line)
            by_key[(r["mnk"], r["acc"])] = r
        except Exception:
            pass
    pallas = {(f"{m}x{n}x{k}", acc): e for (m, n, k), acc, e in db.items()
              if not (e.get("config") or {}).get("use_xla")}
    recs = [r for key, r in by_key.items()
            if key in pallas
            and r.get("config") in (None, pallas[key].get("config"))]
    demotions = [{"mnk": r["mnk"], "acc": r["acc"],
                  "demoted_to": r["demoted_to"],
                  "error": r.get("error", "0/1 gate failure")[:140]}
                 for r in by_key.values() if r.get("demoted_to")]
    summary = {
        "checked": len(recs),
        "total_pallas_entries": len(pallas),
        "passed": sum(r["pass"] for r in recs),
        "failed": [r for r in recs if not r["pass"]],
        "demotions": demotions,
        "skipped": len(pallas) - len(recs),
        "iterations": args.iterations,
        "device": "tpu",
    }
    Path(args.out).write_text(json.dumps(
        {"summary": summary, "results": recs}, indent=1))
    print(f"on-TPU correctness: {summary['passed']}/{summary['checked']} "
          f"pass ({summary['skipped']} not yet run, "
          f"{len(demotions)} demotions on record)", file=sys.stderr)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
