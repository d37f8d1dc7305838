"""Decode-backend selection: XLA while-loop vs Pallas kernel, measured.

Two exact implementations of the greedy note decode exist (both fuzz-pinned
to the host oracle and the reference decoder):

- `decode/device.py` — `lax.while_loop` over XLA ops. Per-note cost is
  dominated by op-scheduling latency (~36 us/onset note on this runtime).
- `decode/pallas_kernel.py` — both greedy stages inside one `pallas_call`
  with VMEM-resident slabs. Per-note cost is dominated by the DMA
  latency of its per-note 4-row slab round trips, which differs sharply
  between runtimes (measured ~6x slower through this tunneled runtime;
  projected faster on local-PCIe production v5e — DESIGN §4d).

Because the winner is a property of the runtime, not the code, the choice
is MEASURED: `probe()` times both backends on a canned workload and
returns per-note costs + the winner. `StreamingTranscriber(
decode_backend="auto")` runs the probe once per process at init;
`tools/decoder_microbench.py` records the same measurement into
`tools/decoder_bench.json` so the decision is auditable per runtime.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np

_PROBE_CACHE: Optional[Dict] = None


def _canned_workload(n_frames: int = 600, seed: int = 0):
    """Posteriorgrams with a known-ish note density (~0.5 notes/frame)."""
    rng = np.random.RandomState(seed)
    frames = (rng.rand(n_frames, 88) ** 3).astype(np.float32)
    onsets = (rng.rand(n_frames, 88) ** 5).astype(np.float32)
    return frames, onsets


def _time_backend(fn, frames, onsets, repeats: int = 3) -> tuple:
    """(best seconds, n_notes) for one jitted decode callable."""
    import jax

    out = fn(frames, onsets)  # compile + warm
    jax.block_until_ready(out.starts)
    n_notes = int(out.n_notes)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        out = fn(frames, onsets)
        jax.block_until_ready(out.starts)
        best = min(best, time.time() - t0)
    return best, n_notes


def probe(n_frames: int = 600, force: bool = False) -> Dict:
    """Measure per-note decode cost of both backends on this runtime.

    Returns {"backend", "platform", "xla_us_per_note", "pallas_us_per_note",
    "n_notes", "note"}. On the CPU backend the Pallas kernel only runs in
    interpret mode (no TPU lowering), which measures the interpreter, not
    the hardware — the probe skips it and selects XLA with a note saying so.
    Cached per process; `force=True` re-measures.
    """
    global _PROBE_CACHE
    if _PROBE_CACHE is not None and not force:
        return _PROBE_CACHE

    import jax
    import jax.numpy as jnp

    from basic_pitch_tpu.decode import device as device_decode

    platform = jax.devices()[0].platform
    frames_np, onsets_np = _canned_workload(n_frames)
    frames = jnp.asarray(frames_np)
    onsets = jnp.asarray(onsets_np)
    max_notes = 4096

    xla_fn = jax.jit(
        lambda f, o: device_decode.decode(f, o, 0.5, 0.3, 5, max_notes=max_notes)
    )
    xla_s, n_notes = _time_backend(xla_fn, frames, onsets)

    result: Dict = {
        "platform": platform,
        "n_frames": n_frames,
        "n_notes": n_notes,
        "xla_us_per_note": round(xla_s / max(n_notes, 1) * 1e6, 2),
    }
    if platform == "cpu":
        result.update(
            backend="xla",
            pallas_us_per_note=None,
            note=(
                "cpu backend: pallas only runs interpreted here (measures "
                "the interpreter, not hardware) — XLA selected without a race"
            ),
        )
    else:
        from basic_pitch_tpu.decode import pallas_kernel

        pallas_fn = jax.jit(
            lambda f, o: pallas_kernel.decode_pallas(
                f, o, 0.5, 0.3, 5, max_notes=max_notes
            )
        )
        try:
            pallas_s, n_pallas = _time_backend(pallas_fn, frames, onsets)
            assert n_pallas == n_notes, "backends disagree on the probe workload"
            result.update(
                pallas_us_per_note=round(pallas_s / max(n_notes, 1) * 1e6, 2),
                backend="pallas" if pallas_s < xla_s else "xla",
                note=(
                    "measured on this runtime; DMA latency through a remote/"
                    "tunneled device differs from local-PCIe production parts"
                ),
            )
        except Exception as err:  # pallas lowering unavailable on this part
            result.update(
                backend="xla",
                pallas_us_per_note=None,
                note=f"pallas probe failed ({type(err).__name__}); XLA selected",
            )
    _PROBE_CACHE = result
    return result


def resolve(decode_backend: str) -> str:
    """Map a requested backend ("xla" | "pallas" | "auto") to a concrete one."""
    if decode_backend == "auto":
        return probe()["backend"]
    if decode_backend not in ("xla", "pallas"):
        raise ValueError(f"decode_backend must be xla|pallas|auto, got {decode_backend!r}")
    return decode_backend
