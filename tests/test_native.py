"""Native library loader: build, recovery, and entry-point behavior.

The recovery tests redirect `_LIB_PATH` to a temp file: overwriting the
REAL cached .so in place would corrupt a mapping the test process itself
holds (SIGBUS) — the exact hazard the loader's atomic temp+rename build
exists to prevent.
"""

import shutil
import subprocess

import numpy as np
import pytest

from basic_pitch_tpu import native

needs_gxx = pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")


def _reset_loader():
    native._lib = None
    native._build_failed = False


@pytest.fixture()
def sandboxed_lib_path(tmp_path, monkeypatch):
    """Run the loader against an isolated lib path, restoring the real
    cached library handle afterwards."""
    monkeypatch.setattr(native, "_LIB_PATH", tmp_path / "libbp_native.so")
    _reset_loader()
    yield native._LIB_PATH
    monkeypatch.undo()
    _reset_loader()
    native.load()


@needs_gxx
def test_load_builds_and_binds():
    lib = native.load()
    assert lib is not None
    assert hasattr(lib, "pack_pcm16_residual")


@needs_gxx
def test_corrupt_cached_so_triggers_rebuild(sandboxed_lib_path):
    """A garbage .so with a fresh mtime (NFS cache from another arch,
    interrupted write) must be rebuilt from the bundled source, not crash
    or silently disable the native paths forever."""
    import os

    sandboxed_lib_path.write_bytes(b"\x7fELF garbage not a library")
    src_mtime = native._SRC.stat().st_mtime
    os.utime(sandboxed_lib_path, (src_mtime + 60, src_mtime + 60))
    lib = native.load()
    assert lib is not None  # rebuilt from source into the sandboxed path
    assert hasattr(lib, "crc32c")


@needs_gxx
def test_build_failure_falls_back_cleanly(sandboxed_lib_path, monkeypatch):
    """No compiler and no usable cached .so -> load() returns None and the
    python fallbacks keep working (no exception escapes)."""
    monkeypatch.setattr(
        subprocess, "run",
        lambda *a, **k: (_ for _ in ()).throw(FileNotFoundError("g++")),
    )
    assert native.load() is None
    assert native.decode_pcm_mono(b"\x00\x00", 16, False, 1) is None


@needs_gxx
def test_native_resample_poly_refuses_general_ratios():
    """up != 1 is not scipy-exactness-verified; the wrapper must route
    callers back to the scipy path."""
    taps = np.zeros(21, np.float64)
    assert native.resample_poly(np.zeros(100, np.float32), 2, 1, taps, 200) is None


@needs_gxx
def test_crc32c_matches_python():
    from basic_pitch_tpu.data import tfrecord

    data = bytes(range(256)) * 7
    native_crc = native.crc32c(data)
    assert native_crc is not None
    # pure-python table implementation (the fallback inside tfrecord.crc32c)
    crc = 0xFFFFFFFF
    for byte in data:
        crc = (crc >> 8) ^ int(tfrecord._TABLE[(crc ^ byte) & 0xFF])
    assert native_crc == crc ^ 0xFFFFFFFF
