"""Lazy build + ctypes bindings for the native tuning-cache core.

The reference JIT-builds its native layer at runtime with
``torch.utils.cpp_extension.load`` (tools/utils.py:95-107, SURVEY.md C2);
tpul2 does the same with make + ctypes: first use compiles
``libtpul2.so`` into the package dir (cached thereafter), and every entry
point degrades gracefully to the pure-Python implementation if the
toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

_DIR = Path(__file__).resolve().parent
_LIB_PATH = _DIR / "libtpul2.so"

_lock = threading.Lock()
_lib = None
_build_failed = False


class TL2Config(ctypes.Structure):
    # v2 layout — must match struct TL2Config in tunecache.cc (kVersion=2).
    _fields_ = [
        ("bm", ctypes.c_int32),
        ("bn", ctypes.c_int32),
        ("bk", ctypes.c_int32),
        ("acc", ctypes.c_int32),
        ("grid_order", ctypes.c_int32),
        ("flags", ctypes.c_int32),      # bit0 xla, bit1 parallel_mn, bit2 rhs
                                        # nk, bits3-5 xla_variant id
        ("vmem_limit", ctypes.c_int32),  # 0 = compiler default
        ("tflops", ctypes.c_float),
    ]


class TL2Key(ctypes.Structure):
    _fields_ = [
        ("m", ctypes.c_int32),
        ("n", ctypes.c_int32),
        ("k", ctypes.c_int32),
        ("acc", ctypes.c_int32),
        ("dtype", ctypes.c_int32),
    ]


_ACC_IDS = {"float32": 0, "bfloat16": 1}
_DTYPE_IDS = {"bfloat16": 0, "float32": 1}


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    try:
        # Regenerate the shared-constants header from tpul2.config (the
        # single source of truth) so C++ and Python cannot silently diverge.
        from tpul2.native.gen_constants import generate
        generate()
    except Exception:
        pass
    srcs = [_DIR / "tunecache.cc", _DIR / "tl2_constants.h"]
    if _LIB_PATH.exists() and all(
            _LIB_PATH.stat().st_mtime >= s.stat().st_mtime
            for s in srcs if s.exists()):
        return ctypes.CDLL(str(_LIB_PATH))
    try:
        subprocess.run(["make", "-s", "libtpul2.so"], cwd=_DIR, check=True,
                       capture_output=True, timeout=120)
        return ctypes.CDLL(str(_LIB_PATH))
    except Exception:
        _build_failed = True
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is None and not _build_failed:
            lib = _build()
            if lib is not None:
                lib.tl2_cache_new.restype = ctypes.c_void_p
                lib.tl2_cache_free.argtypes = [ctypes.c_void_p]
                lib.tl2_cache_size.restype = ctypes.c_uint64
                lib.tl2_cache_size.argtypes = [ctypes.c_void_p]
                lib.tl2_cache_put.argtypes = [
                    ctypes.c_void_p, ctypes.POINTER(TL2Key),
                    ctypes.POINTER(TL2Config)]
                lib.tl2_cache_get.restype = ctypes.c_int32
                lib.tl2_cache_get.argtypes = [
                    ctypes.c_void_p, ctypes.POINTER(TL2Key),
                    ctypes.POINTER(TL2Config)]
                lib.tl2_cache_save.restype = ctypes.c_int32
                lib.tl2_cache_save.argtypes = [ctypes.c_void_p,
                                               ctypes.c_char_p]
                lib.tl2_cache_load.restype = ctypes.c_int32
                lib.tl2_cache_load.argtypes = [ctypes.c_void_p,
                                               ctypes.c_char_p]
                lib.tl2_heuristic.argtypes = [
                    ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                    ctypes.c_int32, ctypes.c_int32,
                    ctypes.POINTER(TL2Config)]
            _lib = lib
        return _lib


def native_available() -> bool:
    return _get_lib() is not None


def _key(m, n, k, acc, in_dtype_name) -> TL2Key:
    return TL2Key(m, n, k, _ACC_IDS[acc], _DTYPE_IDS.get(in_dtype_name, 0))


def _to_kernel_config(c: TL2Config):
    from tpul2.config import XLA_VARIANTS, KernelConfig
    if c.flags & 1:
        # bits 3-5 (+ bit 10 as the high bit, round 4: the XLA-flag
        # variants pushed the id past 7) carry the sentinel's XLA
        # formulation; id 0 = 'matmul' keeps round-1 sidecars (which never
        # set these bits) decoding to the identical config.
        vid = ((c.flags >> 3) & 7) | (((c.flags >> 10) & 1) << 3)
        return KernelConfig.xla(XLA_VARIANTS[vid])
    return KernelConfig(
        bm=c.bm, bn=c.bn, bk=c.bk,
        acc_dtype="float32" if c.acc == 0 else "bfloat16",
        grid_order="mn" if c.grid_order == 0 else "nm",
        parallel_mn=bool(c.flags & 2),
        rhs_layout="nk" if c.flags & 4 else "kn",
        # bit 6: round-3 masked-edge mode (unset on older sidecars = 'pad')
        edge="mask" if c.flags & 64 else "pad",
        # bits 7-9: staged-pipeline depth index into _PIPELINE_DEPTHS
        # (0 on older sidecars = Mosaic auto)
        pipeline_depth=_PIPELINE_DEPTHS[(c.flags >> 7) & 7],
        vmem_limit_bytes=int(c.vmem_limit) if c.vmem_limit else None,
    )


#: flags bits 7-9 codec for KernelConfig.pipeline_depth (config.validate
#: admits exactly these values; index 0 = automatic pipelining).
_PIPELINE_DEPTHS = (0, 2, 3, 4, 6, 8, 0, 0)


def _from_kernel_config(cfg, acc: str, tflops: float = 0.0) -> TL2Config:
    from tpul2.config import XLA_VARIANTS
    flags = ((1 if cfg.use_xla else 0) | (2 if cfg.parallel_mn else 0)
             | (4 if cfg.rhs_layout == "nk" else 0)
             | (64 if getattr(cfg, "edge", "pad") == "mask" else 0))
    depth = getattr(cfg, "pipeline_depth", 0)
    if depth in _PIPELINE_DEPTHS:
        flags |= _PIPELINE_DEPTHS.index(depth) << 7
    if cfg.use_xla:
        vid = XLA_VARIANTS.index(cfg.xla_variant)
        flags |= ((vid & 7) << 3) | (((vid >> 3) & 1) << 10)
    return TL2Config(cfg.bm, cfg.bn, cfg.bk,
                     _ACC_IDS.get(cfg.acc_dtype, 0),
                     0 if cfg.grid_order == "mn" else 1,
                     flags, int(cfg.vmem_limit_bytes or 0), tflops)


class NativeTuneCache:
    """ctypes wrapper over the C++ open-addressing cache."""

    def __init__(self):
        lib = _get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = ctypes.c_void_p(lib.tl2_cache_new())

    def __del__(self):
        if getattr(self, "_h", None) and getattr(self, "_lib", None):
            self._lib.tl2_cache_free(self._h)
            self._h = None

    def __len__(self):
        return int(self._lib.tl2_cache_size(self._h))

    def put(self, m, n, k, config, acc="float32", in_dtype="bfloat16",
            tflops: float = 0.0):
        key = _key(m, n, k, acc, str(in_dtype))
        cfg = _from_kernel_config(config, acc, tflops)
        self._lib.tl2_cache_put(self._h, ctypes.byref(key),
                                ctypes.byref(cfg))

    def get(self, m, n, k, acc="float32", in_dtype="bfloat16"):
        key = _key(m, n, k, acc, str(in_dtype))
        out = TL2Config()
        if self._lib.tl2_cache_get(self._h, ctypes.byref(key),
                                   ctypes.byref(out)):
            return _to_kernel_config(out)
        return None

    def save(self, path) -> None:
        rc = self._lib.tl2_cache_save(self._h,
                                      str(path).encode())
        if rc != 0:
            raise IOError(f"tl2_cache_save failed: {rc}")

    def load(self, path) -> "NativeTuneCache":
        rc = self._lib.tl2_cache_load(self._h, str(path).encode())
        if rc != 0:
            raise IOError(f"tl2_cache_load failed: {rc}")
        return self


def native_heuristic(m: int, n: int, k: int, acc: str = "float32",
                     sublane: int = 16):
    """C++ heuristic config (must agree with config.heuristic_config)."""
    lib = _get_lib()
    if lib is None:
        return None
    out = TL2Config()
    lib.tl2_heuristic(m, n, k, _ACC_IDS[acc], sublane, ctypes.byref(out))
    return _to_kernel_config(out)
