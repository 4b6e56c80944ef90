"""Native C++ core tests: build, cache round trip, heuristic lockstep."""

import subprocess
from pathlib import Path

import pytest

from tpul2.config import KernelConfig, heuristic_config
from tpul2.native import NativeTuneCache, native_available, native_heuristic

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


def test_put_get_roundtrip():
    nc = NativeTuneCache()
    cfg = KernelConfig(bm=32, bn=256, bk=512, acc_dtype="bfloat16",
                       grid_order="nm")
    nc.put(64, 128, 256, cfg, acc="bfloat16", tflops=42.0)
    assert len(nc) == 1
    got = nc.get(64, 128, 256, acc="bfloat16")
    assert got == cfg
    assert nc.get(64, 128, 256, acc="float32") is None
    assert nc.get(65, 128, 256, acc="bfloat16") is None


def test_xla_sentinel_roundtrip():
    nc = NativeTuneCache()
    nc.put(8, 8, 8, KernelConfig.xla())
    assert nc.get(8, 8, 8).use_xla


def test_persistence(tmp_path):
    nc = NativeTuneCache()
    for i, m in enumerate((64, 128, 256)):
        nc.put(m, m, m, KernelConfig(bm=64, bn=128, bk=128), tflops=float(i))
    p = tmp_path / "cache.bin"
    nc.save(p)
    nc2 = NativeTuneCache().load(p)
    assert len(nc2) == 3
    assert nc2.get(128, 128, 128) == KernelConfig(bm=64, bn=128, bk=128)


def test_heuristic_lockstep_with_python():
    """The C++ heuristic must agree with config.heuristic_config — the
    native layer is a mirror, never a fork."""
    shapes = [(64, 64, 64), (1, 4096, 11008), (16384, 16384, 16384),
              (512, 128, 2048), (100, 200, 300), (8, 8192, 8192)]
    for (m, n, k) in shapes:
        for acc in ("float32", "bfloat16"):
            py = heuristic_config(m, n, k, acc)
            cc = native_heuristic(m, n, k, acc, sublane=16)
            assert (cc.bm, cc.bn, cc.bk) == (py.bm, py.bn, py.bk), \
                (m, n, k, acc, py, cc)
            assert cc.acc_dtype == py.acc_dtype


def test_heuristic_lockstep_dense_grid():
    """Dense lockstep sweep (VERDICT r1 next-round #8: a deliberate change
    to one side must fail a test): covers the shrink loop (big bn x bm
    accumulators), sub-lane full-dim dims, and both acc families."""
    dims = [1, 8, 12, 64, 100, 128, 300, 512, 2048, 4096, 16384]
    for m in dims:
        for n in dims:
            for k in dims:
                for acc in ("float32", "bfloat16"):
                    py = heuristic_config(m, n, k, acc)
                    cc = native_heuristic(m, n, k, acc, sublane=16)
                    assert (cc.bm, cc.bn, cc.bk, cc.acc_dtype) == \
                        (py.bm, py.bn, py.bk, py.acc_dtype), \
                        (m, n, k, acc, py, cc)


def test_v2_fields_roundtrip():
    """rhs_layout and vmem_limit_bytes survive the native cache (ADVICE r1
    #2: round-1 sidecars silently turned 'nk' into 'kn')."""
    nc = NativeTuneCache()
    cfg = KernelConfig(bm=64, bn=4096, bk=512, rhs_layout="nk",
                       vmem_limit_bytes=64 << 20, grid_order="nm",
                       parallel_mn=False)
    nc.put(64, 4096, 512, cfg)
    assert nc.get(64, 4096, 512) == cfg


def test_v1_sidecar_rejected(tmp_path):
    """A stale v1 binary sidecar must be refused, not silently misparsed."""
    import struct

    p = tmp_path / "old.bin"
    p.write_bytes(struct.pack("<III", 0x54503255, 1, 0))
    with pytest.raises(IOError):
        NativeTuneCache().load(p)


def test_db_binary_sidecar(tmp_path):
    from tpul2.autotune.db import TuneDB

    db = TuneDB(path=tmp_path / "db.json")
    cfg = KernelConfig(bm=128, bn=256, bk=512)
    db.put(1024, 1024, 1024, cfg, tflops=150.0)
    db.save()
    assert (tmp_path / "db.bin").exists()
    nc = db.native_cache()
    assert nc is not None
    assert nc.get(1024, 1024, 1024) == cfg


def test_standalone_binary_selftest():
    """The gated main() (reference: #ifndef NO_*_BIN) builds and passes."""
    native_dir = Path(__file__).resolve().parent.parent / "tpul2" / "native"
    subprocess.run(["make", "-s", "tunecache_test"], cwd=native_dir,
                   check=True, capture_output=True)
    out = subprocess.run([str(native_dir / "tunecache_test")],
                         capture_output=True, text=True, check=True)
    assert "PASS" in out.stdout


def test_xla_variant_flag_bits_roundtrip():
    from tpul2.config import XLA_VARIANTS
    nc = NativeTuneCache()
    for i, v in enumerate(XLA_VARIANTS):
        nc.put(8 + i, 8, 8, KernelConfig.xla(v))
    for i, v in enumerate(XLA_VARIANTS):
        got = nc.get(8 + i, 8, 8)
        assert got.use_xla and got.xla_variant == v, (v, got)
