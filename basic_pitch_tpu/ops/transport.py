"""PCM upload-transport selection: residual codec vs raw int16, measured.

Two exact ways exist to get PCM16 samples into HBM:

- **codec** (`ops/pcmcodec.py`): pack to ~1.4-1.9x fewer bytes on host
  worker threads, ship the packed words, reconstruct on device. Wins when
  the host->device link is the bottleneck (this repo's tunneled runtime
  measures ~35 MB/s on a typical day — DESIGN.md SS2), because packing
  overlaps uploads and the wire carries fewer bytes.
- **raw**: one `device_put` of the int16 samples. Wins when the link is
  fast relative to the packer (~410 MB/s/thread measured, 2 worker
  threads) and to the codec's per-piece unpack-program dispatches (3-17
  small device programs, each a round trip on a remote runtime).

Like the decode backend (decode/select.py), the winner is a property of
the RUNTIME — link speed, RPC latency, host CPU — not of the code, and on
a shared tunnel it changes hour to hour (measured 35 MB/s to ~1 GB/s on
the same machine). So the choice is measured: `probe()` times both
transports end-to-end on a canned buffer and picks the faster; with
`StreamingTranscriber(pcm_transport="auto")` the probe re-runs after a
TTL so a long-lived server tracks the weather, with hysteresis so the
transport doesn't flap on noise.

The reference has no analogue (its inference is in-process CPU/GPU); this
subsystem exists because a TPU serving deployment separates the audio
frontend from the accelerator by a real link.
"""

from __future__ import annotations

import threading
import time
from typing import Dict, Optional

import numpy as np

# module-level cache: {"ts": monotonic seconds, "result": probe dict}
_PROBE_CACHE: Optional[Dict] = None
# serializes measurement starts: two threads re-probing concurrently would
# contend on the same link and both measure garbage
_PROBE_LOCK = threading.Lock()
_REPROBE_THREAD: Optional[threading.Thread] = None

# a new winner must beat the incumbent by this factor to flip the cached
# decision — tunnel throughput is noisy minute-to-minute, and flapping
# between transports churns executable caches for no gain
HYSTERESIS = 1.15

PROBE_MIB = 2  # per-transport probe traffic; ~100 ms at 35 MB/s

# worker threads the dispatch loop packs on (pipeline.StreamingTranscriber's
# pool size imports THIS constant): the probe models codec throughput as
# max(pack/PACK_WORKERS, device unpack), so the two must agree
PACK_WORKERS = 2


def _canned_pcm(n_bytes: int, seed: int = 0) -> np.ndarray:
    """A random-walk PCM16 buffer compressing at ~1.4x — the ratio the
    codec achieves on real music (tools/f1_report corpus median 1.41x)."""
    rng = np.random.RandomState(seed)
    steps = rng.randint(-300, 300, n_bytes // 2)
    return np.cumsum(steps).astype(np.int16)


def _measure(device=None, size_mib: int = PROBE_MIB) -> Dict:
    """Time raw device_put vs pack+decode_to_device on one canned buffer."""
    import jax

    from basic_pitch_tpu.ops import pcmcodec

    pcm = _canned_pcm(size_mib << 20)
    put = jax.device_put if device is None else (lambda x: jax.device_put(x, device))

    # warm both paths once (compiles the unpack programs at this shape; the
    # persistent compilation cache makes that a per-machine cost)
    jax.block_until_ready(put(pcm))
    packed = pcmcodec.pack(pcm)
    jax.block_until_ready(pcmcodec.decode_to_device(packed, len(pcm), device=device))

    raw_s = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(put(pcm))
        raw_s = min(raw_s, time.perf_counter() - t0)

    pack_s = float("inf")
    codec_dev_s = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        packed = pcmcodec.pack(pcm)
        pack_s = min(pack_s, time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(pcmcodec.decode_to_device(packed, len(pcm), device=device))
        codec_dev_s = min(codec_dev_s, time.perf_counter() - t0)

    # steady state the dispatch loop overlaps packing (PACK_WORKERS threads)
    # with uploads, so the codec's per-byte cost is whichever of the two
    # stages is the wall, not their sum
    codec_s = max(pack_s / PACK_WORKERS, codec_dev_s)
    # SERIAL model: on a feed whose host CPU is already saturated (the
    # training loader on a 1-vCPU deployment host), pack CPU cannot hide
    # under anything — it adds to the wall outright, so the codec's cost
    # is the SUM of pack and upload. Train-side callers decide with this
    # (`resolve(serial=True)`); the overlapped model above stays right for
    # inference, where the host is idle while `device_put` holds the link.
    codec_serial_s = pack_s + codec_dev_s
    mib = float(size_mib)
    return {
        "platform": jax.devices()[0].platform,
        "probe_mib": size_mib,
        "raw_mib_s": round(mib / raw_s, 1),
        "codec_mib_s": round(mib / codec_s, 1),
        "codec_serial_mib_s": round(mib / codec_serial_s, 1),
        "pack_mib_s": round(mib / pack_s, 1),
        "codec_device_mib_s": round(mib / codec_dev_s, 1),
        "packed_ratio": round(pcm.nbytes / packed.packed_bytes, 2),
        "transport": "codec" if codec_s < raw_s else "raw",
        "transport_serial": "codec" if codec_serial_s < raw_s else "raw",
        "note": (
            "measured end-to-end on this runtime; link speed and RPC "
            "latency differ between tunneled dev runtimes and local-PCIe "
            "production parts"
        ),
    }


def _reprobe(old: Dict, device=None) -> Dict:
    """Re-measure and apply hysteresis against the incumbent decision.

    When the challenger is not decisively better (HYSTERESIS), the record
    keeps the incumbent transport and says so (``held_by_hysteresis``) —
    the measurements stay the NEW ones, so the stored speeds and the
    stored decision are individually honest even when they disagree.
    """
    new = _measure(device)
    for key, codec_speed in (
        ("transport", "codec_mib_s"),
        ("transport_serial", "codec_serial_mib_s"),
    ):
        if key in old and new[key] != old[key]:
            speeds = {"raw": new["raw_mib_s"], "codec": new[codec_speed]}
            incumbent, challenger = old[key], new[key]
            if speeds[challenger] < HYSTERESIS * speeds[incumbent]:
                new[key] = incumbent  # not decisively better: hold
                new.setdefault("held_by_hysteresis", True)
    return new


def probe(
    device: "jax.Device | None" = None, ttl_s: Optional[float] = None, force: bool = False
) -> Dict:
    """Measured transport decision, cached per process.

    ``ttl_s`` re-measures when the cached probe is older than that many
    seconds (shared-tunnel throughput varies 2-3x minute-to-minute). The
    re-measure runs on a BACKGROUND thread — callers keep getting the
    cached decision until the new one lands, so a live request never
    absorbs the probe's transfers as latency (only the very first probe,
    which has nothing to fall back on, is synchronous). The cached winner
    is kept unless the challenger beats it by >HYSTERESIS. ``force``
    re-measures synchronously and takes the new winner outright.
    """
    global _PROBE_CACHE, _REPROBE_THREAD
    now = time.monotonic()
    if _PROBE_CACHE is not None and not force:
        stale = ttl_s is not None and (now - _PROBE_CACHE["ts"]) >= ttl_s
        if stale:
            with _PROBE_LOCK:
                # re-check under the lock: another thread may have kicked
                # (or finished) the re-probe while we waited
                cache = _PROBE_CACHE
                still_stale = (time.monotonic() - cache["ts"]) >= ttl_s
                if still_stale and (
                    _REPROBE_THREAD is None or not _REPROBE_THREAD.is_alive()
                ):

                    def run(old=cache["result"]):
                        global _PROBE_CACHE
                        # lock so a concurrent force-probe never measures
                        # the link at the same time as this thread
                        with _PROBE_LOCK:
                            result = _reprobe(old, device)
                            _PROBE_CACHE = {
                                "ts": time.monotonic(),
                                "result": result,
                            }

                    _REPROBE_THREAD = threading.Thread(
                        target=run, name="bp-transport-reprobe", daemon=True
                    )
                    _REPROBE_THREAD.start()
        return _PROBE_CACHE["result"]
    with _PROBE_LOCK:
        if _PROBE_CACHE is not None and not force:
            return _PROBE_CACHE["result"]
        result = _measure(device)
        _PROBE_CACHE = {"ts": time.monotonic(), "result": result}
    return result


MODES = ("codec", "raw", "auto")


def check_mode(pcm_transport: str) -> str:
    """Validate a requested transport mode (single source of the contract)."""
    if pcm_transport not in MODES:
        raise ValueError(
            f"pcm_transport must be {'|'.join(MODES)}, got {pcm_transport!r}"
        )
    return pcm_transport


def resolve(
    pcm_transport: str,
    device: "jax.Device | None" = None,
    ttl_s: Optional[float] = None,
    serial: bool = False,
) -> str:
    """Map a requested transport ("codec" | "raw" | "auto") to a concrete one.

    "auto" measures (see probe); it resolves to "raw" outright when the
    native packer is absent, since the numpy packer is too slow for the
    throughput path (pcmcodec.available). ``serial=True`` decides with the
    serial cost model (pack + upload, no overlap) — right for feeds whose
    host CPU is already the bottleneck, i.e. the training loader.
    """
    if check_mode(pcm_transport) in ("codec", "raw"):
        return pcm_transport
    from basic_pitch_tpu.ops import pcmcodec

    if not pcmcodec.available():
        return "raw"
    record = probe(device=device, ttl_s=ttl_s)
    return record["transport_serial" if serial else "transport"]


def report(device: "jax.Device | None" = None) -> Dict:
    """Probe record for benchmark artifacts.

    Honest when the native packer is missing: the production path resolves
    "auto" -> "raw" there, so no numpy-fallback pack timings are recorded
    as if they were the codec the run used.
    """
    from basic_pitch_tpu.ops import pcmcodec

    if not pcmcodec.available():
        return {
            "transport": "raw",
            "note": "native packer unavailable; codec not measured",
        }
    return probe(device=device)
