"""Loader for the native host library (ctypes; builds on first use).

The shared object is compiled from the bundled C++ source with the system
g++ the first time it is needed and cached next to the source. Every entry
point has a pure-python fallback, so the framework works without a compiler;
with it, host-side decode/resample/CRC run at native speed.
"""

from __future__ import annotations

import ctypes
import logging
import os
import pathlib
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_SRC = pathlib.Path(__file__).resolve().parent / "bp_native.cpp"
_LIB_PATH = _SRC.with_name("libbp_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    # no -march=native: the .so is cached next to the source, so a checkout
    # shared between machines (NFS, container images) would execute another
    # host's ISA extensions and SIGILL; these entry points are stream/byte
    # bound, so portable -O3 costs nothing measurable
    # compile to a process-unique temp name and atomically rename: another
    # process mid-CDLL (or one that already mapped the old .so) must never
    # observe a truncated file
    tmp = _LIB_PATH.with_name(f"{_LIB_PATH.name}.{os.getpid()}.tmp")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", str(tmp), str(_SRC)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB_PATH)
        return True
    except Exception as exc:  # no compiler / failed build -> python fallbacks
        logger.info("native build unavailable (%s); using python fallbacks", exc)
        try:
            tmp.unlink(missing_ok=True)
        except OSError:
            pass
        return False


def _bind(lib: ctypes.CDLL) -> None:
    """Declare every entry point's signature (raises AttributeError when the
    cached .so predates a symbol — callers rebuild then)."""
    i64, i32, u32 = ctypes.c_int64, ctypes.c_int32, ctypes.c_uint32
    ptr = ctypes.c_void_p
    lib.decode_pcm16_mono.argtypes = [ptr, i64, i32, ptr]
    lib.decode_pcm24_mono.argtypes = [ptr, i64, i32, ptr]
    lib.decode_pcm32_mono.argtypes = [ptr, i64, i32, ptr]
    lib.decode_float32_mono.argtypes = [ptr, i64, i32, ptr]
    lib.resample_poly_f32.argtypes = [ptr, i64, i32, i32, ptr, i32, ptr, i64]
    lib.resample_down_f32.argtypes = [ptr, i64, i32, ptr, i32, ptr, i64]
    lib.crc32c.argtypes = [ptr, i64]
    lib.crc32c.restype = u32
    lib.pack_pcm16_residual.argtypes = [ptr, i64, i32, ptr, i32, ptr, i64, ptr, ptr, ptr]
    lib.pack_pcm16_residual.restype = i64
    lib.residual_order_costs.argtypes = [ptr, i64, ptr]
    lib.lpc_analyze_pcm16.argtypes = [ptr, i64, i32, ptr, ptr]
    lib.lpc_analyze_pcm16.restype = i64
    lib.pack_pcm16_lpc.argtypes = [ptr, i64, i32, ptr, ptr, ptr, i32, ptr, i64, ptr, ptr, ptr]
    lib.pack_pcm16_lpc.restype = i64


def _try_open() -> Optional[ctypes.CDLL]:
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        _bind(lib)
        return lib
    except (OSError, AttributeError):
        # wrong-arch / truncated / stale .so missing a newer symbol
        return None


def load() -> Optional[ctypes.CDLL]:
    """The shared library, building it on first call; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        lib = None
        if _LIB_PATH.exists() and _LIB_PATH.stat().st_mtime >= _SRC.stat().st_mtime:
            lib = _try_open()
        if lib is None:
            # missing, stale, or unloadable (other-arch NFS cache, truncated
            # write, predates a symbol): rebuild from the bundled source
            if not _build():
                _build_failed = True
                return None
            lib = _try_open()
            if lib is None:
                _build_failed = True
                return None
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def _as_ptr(array: np.ndarray):
    return array.ctypes.data_as(ctypes.c_void_p)


def decode_pcm_mono(payload: bytes, bits: int, is_float: bool, n_channels: int) -> Optional[np.ndarray]:
    """Interleaved PCM payload -> float32 mono, or None when unsupported."""
    lib = load()
    if lib is None:
        return None
    if is_float and bits != 32:
        return None
    if is_float:
        itemsize, fn, dtype = 4, lib.decode_float32_mono, np.float32
    elif bits == 16:
        itemsize, fn, dtype = 2, lib.decode_pcm16_mono, np.int16
    elif bits == 24:
        itemsize, fn, dtype = 3, lib.decode_pcm24_mono, np.uint8
    elif bits == 32:
        itemsize, fn, dtype = 4, lib.decode_pcm32_mono, np.int32
    else:
        return None
    n_frames = len(payload) // (itemsize * n_channels)
    if n_frames == 0:
        return np.zeros(0, np.float32)
    usable = n_frames * itemsize * n_channels
    raw = np.frombuffer(payload[:usable], dtype=np.uint8)
    out = np.empty(n_frames, np.float32)
    fn(_as_ptr(raw), n_frames, n_channels, _as_ptr(out))
    return out


def resample_poly(x: np.ndarray, up: int, down: int, taps: np.ndarray, n_out: int) -> Optional[np.ndarray]:
    """Polyphase resample with the given symmetric odd-length taps.

    Only the pure-decimation case (up == 1) is claimed natively; general
    ratios involve scipy's tap-padding alignment rules and stay on the
    scipy path.
    """
    if up != 1:
        # general ratios are NOT scipy-exactness-verified (tap-padding
        # alignment differs); returning None keeps callers on the scipy
        # path instead of silently diverging numerically
        return None
    lib = load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    taps = np.ascontiguousarray(taps, np.float64)
    out = np.empty(n_out, np.float32)
    lib.resample_down_f32(
        _as_ptr(x), len(x), down, _as_ptr(taps), len(taps), _as_ptr(out), n_out
    )
    return out


def crc32c(data: bytes) -> Optional[int]:
    lib = load()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8) if data else np.zeros(0, np.uint8)
    return int(lib.crc32c(_as_ptr(buf), len(data)))
