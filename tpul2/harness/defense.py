"""Benchmark-integrity defenses — anti-cheating checks for the harness.

Port of the reference defense.py (SURVEY.md C8) with each CUDA-era attack
translated to its JAX/TPU equivalent:

  thread injection (ref :14-38)      → same: a perf_func must not leave
                                        helper threads running work after it
                                        returns.
  stream injection (ref :41-142)     → async-dispatch cheating: on an async
                                        runtime a perf_func can return before
                                        the work is done; we hybrid-time with
                                        event-free vs fully-fenced timing and
                                        flag a large ratio, then USE the
                                        fenced timing (same remedy as ref).
  lazy evaluation (ref :145-207)     → output must be a concrete, committed,
                                        materialized jax.Array on the right
                                        device — not a tracer, not a lazy
                                        stand-in object, not deleted/donated.
  precision downgrade (ref :210-249) → output dtype must match the input
                                        contract.
  monkey patching (ref :252-282)     → identity-compare the timing/fencing
                                        primitives against references
                                        captured at import time.

``run_all_defenses`` composes all five (ref :285-329).  Standalone module:
imports only jax/numpy (the reference's is likewise torch-only).
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Sequence

import jax
import numpy as np

# --- references captured at import (monkey-patch canaries, ref :7-11) ---
_REF_PERF_COUNTER = time.perf_counter
_REF_BLOCK_UNTIL_READY = jax.block_until_ready
_REF_SLEEP = time.sleep


def defend_against_thread_injection(perf_func: Callable, args: tuple,
                                    settle_s: float = 0.2) -> dict:
    """Flag perf funcs that spawn threads still alive after the call."""
    before = threading.active_count()
    out = perf_func(*args)
    _REF_BLOCK_UNTIL_READY(out)
    _REF_SLEEP(settle_s)
    after = threading.active_count()
    return {
        "name": "thread_injection",
        "pass": after <= before,
        "threads_before": before,
        "threads_after": after,
    }


def _device_order_barrier():
    """Drain the device queue: enqueue a trivial computation and wait for it.

    TPU (and XLA generally) executes programs on a device in enqueue order,
    so blocking on a fresh computation implies everything enqueued earlier —
    including work a cheating perf_func launched without tying it to its
    returned output — has finished.  This is the role of the reference's
    ``torch.cuda.synchronize()`` full-device fence (defense.py:41-142).
    Uses a 1-element D2H (bench_utils.device_fence), the only wait that is
    reliable on every backend."""
    import jax.numpy as jnp

    from tpul2.harness.bench_utils import device_fence
    device_fence(jnp.zeros((8, 128)) + 1.0)


def defend_against_async_cheating(perf_func: Callable, args: tuple,
                                  iters: int = 10,
                                  ratio_threshold: float = 1.5,
                                  barrier: Callable = None) -> dict:
    """Hybrid timing: per-output fence vs full device-order barrier.

    The reference's stream-injection defense: a kernel can run its real work
    on a side stream so event-based timing on the main stream misses it;
    timing with a full device sync catches everything, and a ratio > 1.5×
    between the two flags the cheat, after which the sync timing is used
    (defense.py:41-142).  JAX analogue: ``block_until_ready(out)`` only waits
    for the returned arrays ('event' timing); a device-order barrier waits
    for ALL enqueued work ('sync' timing).  Median of `iters` each,
    randomized interleaving; the barrier timing is always authoritative.
    """
    if barrier is None:
        barrier = _device_order_barrier
    event_t, sync_t = [], []
    order = ["e", "s"] * iters
    np.random.default_rng(0).shuffle(order)
    # warmup + drain
    _REF_BLOCK_UNTIL_READY(perf_func(*args))
    barrier()
    # The barrier itself has a fixed dispatch cost that would swamp tiny
    # workloads; measure it on an empty queue and discount it below.
    bcost = []
    for _ in range(5):
        t0 = _REF_PERF_COUNTER()
        barrier()
        bcost.append(_REF_PERF_COUNTER() - t0)
    barrier_cost = float(np.median(bcost))
    for tag in order:
        if tag == "e":
            t0 = _REF_PERF_COUNTER()
            out = perf_func(*args)
            _REF_BLOCK_UNTIL_READY(out)
            event_t.append(_REF_PERF_COUNTER() - t0)
            barrier()  # drain outside the timed region
        else:
            t0 = _REF_PERF_COUNTER()
            out = perf_func(*args)
            _REF_BLOCK_UNTIL_READY(out)
            barrier()
            sync_t.append(_REF_PERF_COUNTER() - t0)
    me, ms = float(np.median(event_t)), float(np.median(sync_t))
    ms_adj = max(ms - barrier_cost, me)
    ratio = ms_adj / max(me, 1e-9)
    # Flag only when the hidden work is BOTH relatively and absolutely
    # significant (>=0.5 ms) — sub-ms deltas are scheduler noise, and a
    # cheat that hides less than that cannot move a benchmark result.
    flagged = ratio > ratio_threshold and (ms_adj - me) > 5e-4
    return {
        "name": "async_cheating",
        "pass": not flagged,
        "event_ms": me * 1e3,
        "sync_ms": ms * 1e3,
        "barrier_cost_ms": barrier_cost * 1e3,
        "ratio": ratio,
        "authoritative_ms": ms_adj * 1e3,
    }


def defend_against_lazy_evaluation(perf_func: Callable, args: tuple,
                                   expected_shape=None) -> dict:
    """Output must be a real, materialized jax.Array on an addressable
    device — not a tracer/lazy proxy (ref LazyTensor subclass attack)."""
    out = perf_func(*args)
    checks = {}
    checks["is_jax_array"] = isinstance(out, jax.Array) and not isinstance(
        out, jax.core.Tracer)
    checks["not_deleted"] = checks["is_jax_array"] and not out.is_deleted()
    checks["on_device"] = False
    checks["committed_backend"] = False
    if checks["is_jax_array"]:
        try:
            devs = out.devices()
            checks["on_device"] = len(devs) > 0
            checks["committed_backend"] = all(
                d.platform == jax.default_backend() for d in devs)
        except Exception:
            pass
    checks["materializes"] = False
    if checks["is_jax_array"]:
        try:
            arr = np.asarray(out)
            checks["materializes"] = arr.size > 0
        except Exception:
            pass
    if expected_shape is not None:
        checks["shape_ok"] = checks["is_jax_array"] and \
            tuple(out.shape) == tuple(expected_shape)
    return {"name": "lazy_evaluation",
            "pass": all(checks.values()), **checks}


def defend_against_precision_downgrade(perf_func: Callable, args: tuple,
                                       expected_dtype) -> dict:
    """Output dtype must match the contract (ref :210-249)."""
    out = perf_func(*args)
    actual = getattr(out, "dtype", None)
    import jax.numpy as jnp
    ok = actual is not None and jnp.dtype(actual) == jnp.dtype(expected_dtype)
    return {"name": "precision_downgrade", "pass": bool(ok),
            "expected": str(jnp.dtype(expected_dtype)),
            "actual": str(actual)}


def defend_against_monkey_patching() -> dict:
    """Timing/fencing primitives must be the originals (ref :252-282)."""
    checks = {
        "time.perf_counter": time.perf_counter is _REF_PERF_COUNTER,
        "jax.block_until_ready": jax.block_until_ready is _REF_BLOCK_UNTIL_READY,
        "time.sleep": time.sleep is _REF_SLEEP,
    }
    return {"name": "monkey_patching", "pass": all(checks.values()), **checks}


def run_all_defenses(perf_func: Callable, args: tuple,
                     expected_dtype=None,
                     expected_shape=None,
                     which: Sequence[str] = ("monkey_patching",
                                             "thread_injection",
                                             "async_cheating",
                                             "lazy_evaluation",
                                             "precision_downgrade")) -> dict:
    """Compose the defenses (ref run_all_defenses :285-329).

    Returns {"pass": bool, "defenses": [per-defense dicts]}; the async
    defense's ``authoritative_ms`` should be used as the trusted timing when
    its flag trips.
    """
    results = []
    for name in which:
        if name == "monkey_patching":
            results.append(defend_against_monkey_patching())
        elif name == "thread_injection":
            results.append(defend_against_thread_injection(perf_func, args))
        elif name == "async_cheating":
            results.append(defend_against_async_cheating(perf_func, args))
        elif name == "lazy_evaluation":
            results.append(defend_against_lazy_evaluation(
                perf_func, args, expected_shape=expected_shape))
        elif name == "precision_downgrade":
            if expected_dtype is not None:
                results.append(defend_against_precision_downgrade(
                    perf_func, args, expected_dtype))
        else:
            raise ValueError(f"unknown defense {name}")
    return {"pass": all(r["pass"] for r in results), "defenses": results}
