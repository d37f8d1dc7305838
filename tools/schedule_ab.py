"""A/B the dispatch schedule on the real chip: interleaved vs phase-separated.

The link probe (tools/link_probe.py) measured that on the tunneled runtime
(a) device_put is synchronous, (b) concurrent device_puts collapse aggregate
throughput, and (c) a device_put issued while compute is in flight runs up to
~19x slower. The production _dispatch interleaves upload(c+1) with compute(c)
— the pessimal order under (c). This experiment times, interleaved round-robin
to ride out tunnel weather:

  A: transcriber.transcribe(...)            (interleaved schedule)
  B: bench.measure_stages(...)              (upload-all, then compute, decode, fetch)

Run: python tools/schedule_ab.py [minutes]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
    import bench

    from basic_pitch_tpu import pipeline

    seconds = minutes * 60.0
    y = bench.synth_audio(seconds, seed=7)
    pcm = np.clip(np.round(y * 32768.0), -32768, 32767).astype(np.int16)

    tr = pipeline.StreamingTranscriber(
        windows_per_chunk=192, decode_backend="auto", pcm_transport="auto"
    )
    tr.transcribe(pcm, 22050)  # warm
    bench.measure_stages(tr, pcm)  # warm stage path

    rows = []
    for i in range(5):
        t0 = time.time()
        tr.transcribe(pcm, 22050)
        a = time.time() - t0

        t0 = time.time()
        stages = bench.measure_stages(tr, pcm)
        b = time.time() - t0
        rows.append({"interleaved_s": round(a, 3), "phased_s": round(b, 3), **stages})
        print(
            f"round {i}: interleaved {a:.3f}s ({seconds/a:.0f}x) vs "
            f"phased {b:.3f}s ({seconds/b:.0f}x)  stages={stages}",
            file=sys.stderr,
        )
    print(json.dumps({"audio_s": seconds, "rows": rows}))


if __name__ == "__main__":
    main()
