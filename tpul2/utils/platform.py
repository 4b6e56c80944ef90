"""Backend detection and TPU peak-FLOPs table.

The reference keys its kernel zoo by GPU (`3090|a100|h100`, SURVEY.md C9) and
reads device name/capability at build time (``tools/utils.py:96-99``).  The
TPU analogue: detect the JAX backend + TPU generation, decide whether Pallas
must run in interpreter mode (CPU), and expose peak-MXU numbers for
%-of-peak reporting (SURVEY.md §5 "Tracing": TFLOPS vs peak).
"""

from __future__ import annotations

import functools

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
    """Best-effort TPU generation string, e.g. 'v5e'."""
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


def tpu_peak_flops(dtype="bfloat16") -> float:
    """Peak matmul FLOP/s for the current chip (bf16 inputs)."""
    gen = tpu_generation()
    tf = _PEAK_TFLOPS_BF16.get(gen)
    if tf is None:
        return float("nan")
    return tf * 1e12
