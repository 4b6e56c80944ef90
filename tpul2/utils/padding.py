"""Tile-alignment and zero-padding helpers.

TPU-native replacement for the reference's tile-metadata extractor + caller-side
padding (C3 in SURVEY.md: reference ``tools/utils.py:8-36`` regex-extracts
BM/BN/BK from kernel source and callers zero-pad M,N,K up to tile multiples,
e.g. ``benchmarking_offline.py:102-113``).  Here tile sizes are first-class
config fields, so no regex: we pad operands to the kernel config's block
multiples, run the kernel on the padded problem, and slice the result.

Zero padding is exact for matmul: padded K contributes 0 to every dot product,
and padded M/N rows/cols are sliced away.
"""

from __future__ import annotations

import jax.numpy as jnp

#: TPU lane width — the last dim of any VMEM tile is always 128.
LANE = 128

#: Minimum sublane count (second-to-last dim) per dtype for one VMEM tile.
_MIN_SUBLANE = {
    "float32": 8,
    "bfloat16": 16,
    "float16": 16,
    "int8": 32,
    "float8_e4m3fn": 32,
    "float8_e5m2": 32,
}


def min_sublane(dtype) -> int:
    """Minimum sublane (second-to-last dim) tile size for ``dtype``."""
    return _MIN_SUBLANE.get(jnp.dtype(dtype).name, 8)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def pad_to(x, rows: int, cols: int):
    """Zero-pad a 2D array up to (rows, cols). No-op if already that shape."""
    r, c = x.shape
    if r == rows and c == cols:
        return x
    return jnp.pad(x, ((0, rows - r), (0, cols - c)))


def pad_operands(a, b, bm: int, bn: int, bk: int):
    """Zero-pad (a: MxK, b: KxN) to multiples of the block tile.

    Returns (a_pad, b_pad, (M, N)) where (M, N) is the unpadded output shape
    the caller should slice back to.
    """
    m, k = a.shape
    k2, n = b.shape
    assert k == k2, f"matmul dim mismatch: {a.shape} @ {b.shape}"
    mp, np_, kp = round_up(m, bm), round_up(n, bn), round_up(k, bk)
    return pad_to(a, mp, kp), pad_to(b, kp, np_), (m, n)
