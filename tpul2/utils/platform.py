"""Backend detection and TPU peak-FLOPs table.

The reference keys its kernel zoo by GPU (`3090|a100|h100`, SURVEY.md C9) and
reads device name/capability at build time (``tools/utils.py:96-99``).  The
TPU analogue: detect the JAX backend + TPU generation, decide whether Pallas
must run in interpreter mode (CPU), and expose peak-MXU numbers for
%-of-peak reporting (SURVEY.md §5 "Tracing": TFLOPS vs peak).
"""

from __future__ import annotations

import functools
import os

import jax

# Peak dense matmul throughput per chip, TFLOP/s.  Public numbers.
_PEAK_TFLOPS_BF16 = {
    "v4": 275.0,
    "v5e": 197.0,
    "v5p": 459.0,
    "v6e": 918.0,
}


@functools.cache
def backend() -> str:
    return jax.default_backend()


def on_tpu() -> bool:
    return backend() == "tpu"


def default_interpret() -> bool:
    """Pallas interpret mode: required off-TPU (our CPU 'fake backend',
    playing the role the reference never had — it required a real GPU
    everywhere, SURVEY.md §4.4)."""
    return not on_tpu()


@functools.cache
def tpu_generation() -> str:
    """Best-effort TPU generation string, e.g. 'v5e'.

    ``TPUL2_GEN`` overrides detection — the supported way for off-TPU
    tools (interpret-mode correctness sweeps, DB inspection) to address a
    real generation's tuning DB without pointing TPUL2_TUNEDB at a path."""
    env = os.environ.get("TPUL2_GEN")
    if env:
        return env
    if not on_tpu():
        return "cpu"
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    # e.g. "TPU v5 lite" -> v5e, "TPU v4" -> v4
    if "lite" in kind:
        return "v6e" if "v6" in kind else "v5e"
    for gen in ("v6e", "v5p", "v5", "v4"):
        if gen in kind.replace(" ", ""):
            return "v5p" if gen == "v5" else gen
    return "unknown"


def debug_log(msg: str) -> None:
    """Progress logging for long device-bound phases (TPUL2_DEBUG=1)."""
    import os
    import sys
    import time as _time
    if os.environ.get("TPUL2_DEBUG") == "1":
        print(f"[tpul2 {_time.strftime('%H:%M:%S')}] {msg}",
              file=sys.stderr, flush=True)


_cache_enabled = False


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache.

    The analogue of the reference's torch cpp_extension build cache in
    ``base_dir`` (tools/utils.py:106, SURVEY.md §5 'checkpoint/resume'):
    first Mosaic compile of a kernel config costs tens of seconds on the
    remote-compile TPU path; the cache makes re-tuning and re-benchmarking
    runs warm-start.
    """
    global _cache_enabled
    if _cache_enabled:
        return
    import os

    import jax as _jax
    path = path or os.environ.get(
        "TPUL2_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    os.makedirs(path, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", path)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _cache_enabled = True


def tpu_peak_flops(dtype="bfloat16") -> float:
    """Peak matmul FLOP/s for the current chip (bf16 inputs)."""
    gen = tpu_generation()
    tf = _PEAK_TFLOPS_BF16.get(gen)
    if tf is None:
        return float("nan")
    return tf * 1e12
