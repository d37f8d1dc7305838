"""Host allocator tuning for large-buffer streaming workloads.

Every hot host path in this framework (loader collate, PCM packing,
window rasterization, batch stacking) allocates multi-10-MB numpy arrays
per step. glibc malloc serves those via fresh ``mmap`` regions, so each
step re-faults every page — and on the deployment microVMs the fault
path runs at ~90-140 MB/s while warm memory copies at 5-11 GB/s
(measured: a fresh 90 MB alloc+touch costs ~1000 ms; the same copy into
warm pages costs 16 ms). ``tune_host_allocator`` raises glibc's mmap and
trim thresholds via ``mallopt`` so freed large blocks stay on the warm
heap and are reused instead of re-faulted: the measured loader feed
chain at batch 128 drops several-fold (tools/feed_profile.json arms).

Trade-off: the process retains its high-water allocation instead of
returning memory to the OS — the standard allocator posture for
training/serving daemons (jemalloc/tcmalloc behave this way out of the
box). Call sites are the long-running engines (loader, pipeline, serve,
train loop), not library import.

The reference has no analogue (it inherits TF's allocator); this is a
deployment-hardware concern the TPU build owns explicitly.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import logging

logger = logging.getLogger(__name__)

# glibc mallopt parameter numbers (malloc.h)
_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3
_M_ARENA_MAX = -8

_tuned = False


def tune_host_allocator(threshold_bytes: int = 1 << 30) -> bool:
    """Keep large freed blocks on the warm heap (idempotent, best-effort).

    Three settings, all required for the win: raised mmap/trim thresholds
    keep big freed blocks heap-resident, and ``M_ARENA_MAX=1`` routes the
    loader/prefetch WORKER threads through the main arena — non-main glibc
    arenas cap their heaps at 64 MB, so a >64 MB batch buffer allocated on
    a worker thread falls back to mmap (and re-faults) no matter the
    threshold. Single-arena lock contention is irrelevant on the 1-vCPU
    deployment hosts; processes with real CPU parallelism that want arena
    concurrency back can pass a larger arena cap via glibc env vars.

    Returns True when glibc accepted all settings; False (and logs once)
    on non-glibc platforms, where the call is a safe no-op.
    """
    global _tuned
    if _tuned:
        return True
    try:
        libc = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6",
                           use_errno=True)
        mallopt = libc.mallopt
        mallopt.argtypes = (ctypes.c_int, ctypes.c_int)
        mallopt.restype = ctypes.c_int
        ok = (
            bool(mallopt(_M_ARENA_MAX, 1))
            and bool(mallopt(_M_MMAP_THRESHOLD, threshold_bytes))
            and bool(mallopt(_M_TRIM_THRESHOLD, threshold_bytes))
        )
    except (OSError, AttributeError) as exc:  # non-glibc / static libc
        logger.info("host allocator tuning unavailable: %s", exc)
        return False
    if ok:
        _tuned = True
    else:
        logger.info("mallopt rejected allocator thresholds")
    return ok
