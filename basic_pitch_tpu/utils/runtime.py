"""Process-level runtime setup: persistent XLA compilation cache.

The pipeline's executables take ~25-40 s to compile on a TPU backend
(docs/DESIGN.md §5). The reference pays nothing comparable (its engines
ship pre-compiled graphs), so cold-start parity demands persisting XLA
binaries across processes: with the cache enabled, a fresh `basic-pitch`
invocation loads its executables from disk in ~100 ms instead of
recompiling.

Enabled automatically by `inference.Model` and
`pipeline.StreamingTranscriber`; opt out with
``BASIC_PITCH_NO_COMPILE_CACHE=1`` or pick the location with
``JAX_COMPILATION_CACHE_DIR`` (takes precedence, honored by JAX itself).
"""

from __future__ import annotations

import logging
import os
import pathlib

import jax

logger = logging.getLogger(__name__)

_done = False


def default_cache_dir() -> pathlib.Path:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return pathlib.Path(base) / "basic_pitch_tpu" / "xla"


def enable_compilation_cache() -> None:
    """Idempotently point JAX's persistent compilation cache at a real dir.

    Never raises: an unwritable cache location just means cold compiles.
    """
    global _done
    if _done or os.environ.get("BASIC_PITCH_NO_COMPILE_CACHE") == "1":
        return
    _done = True
    try:
        if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
            return  # user already configured it; JAX reads the env itself
        cache_dir = default_cache_dir()
        cache_dir.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        # cache every executable that takes noticeable time, not just >1 s
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception as exc:  # pragma: no cover - depends on environment
        logger.info("compilation cache unavailable (%s); compiling cold", exc)


def pin_cpu_if_requested() -> None:
    """Honor a cpu-platform request programmatically BEFORE any backend-
    initializing call: the hosted TPU plugin ignores JAX_PLATFORMS=cpu, so
    scripts that should run on virtual host devices (driver dryruns, demos)
    must pin the platform via jax.config. Shared by `__graft_entry__` and
    `tools/train_demo`."""
    xla_flags = os.environ.get("XLA_FLAGS", "")
    wants_host_devices = "--xla_force_host_platform_device_count" in xla_flags
    wants_cpu = "cpu" in os.environ.get("JAX_PLATFORMS", "").lower()
    if wants_host_devices or wants_cpu:
        jax.config.update("jax_platforms", "cpu")
