"""Headline benchmark: end-to-end transcription throughput per chip.

Measures audio-seconds transcribed per wall-clock second through the FULL
pipeline — raw 44.1 kHz samples -> on-device decimation, windowing, CQT,
model heads, overlap trim -> host note-event decoding — on synthetic
piano-like audio. Prints one JSON line:

    {"metric": ..., "value": N, "unit": "audio_sec_per_sec_per_chip",
     "vs_baseline": N / 500}

Baseline: the reference publishes no throughput numbers (BASELINE.md); the
driver-set target is 500x real-time per TPU v5e chip at note-F1 parity, so
vs_baseline = value / 500.
"""

from __future__ import annotations

import json
import time

import numpy as np


def synth_audio(seconds: float, sample_rate: int = 44100, seed: int = 0) -> np.ndarray:
    """Polyphonic piano-ish test signal: random note events with decay."""
    rng = np.random.RandomState(seed)
    n = int(seconds * sample_rate)
    y = np.zeros(n, dtype=np.float32)
    t_total = np.arange(n) / sample_rate
    n_notes = int(seconds * 3)  # ~3 notes/sec
    for _ in range(n_notes):
        start = rng.rand() * (seconds - 1.0)
        dur = 0.2 + rng.rand() * 1.5
        midi = rng.randint(36, 84)
        f0 = 440.0 * 2 ** ((midi - 69) / 12)
        i0, i1 = int(start * sample_rate), min(int((start + dur) * sample_rate), n)
        t = t_total[: i1 - i0]
        env = np.exp(-3.0 * t) * min(1.0, (i1 - i0) / (0.01 * sample_rate))
        tone = np.zeros_like(t)
        for h in (1, 2, 3):
            tone += (0.5 ** (h - 1)) * np.sin(2 * np.pi * f0 * h * t)
        y[i0:i1] += (0.1 + 0.15 * rng.rand()) * env * tone
    peak = np.abs(y).max()
    if peak > 0.95:
        y *= 0.95 / peak
    return y


def main() -> None:
    from basic_pitch_tpu import pipeline

    audio_seconds = 600.0
    audio = synth_audio(audio_seconds)

    transcriber = pipeline.StreamingTranscriber(windows_per_chunk=128)

    # warmup: compile chunk + decode executables at the bench shapes
    events = transcriber.transcribe(audio, 44100)

    best = 0.0
    for _ in range(3):
        t0 = time.time()
        events = transcriber.transcribe(audio, 44100)
        dt = time.time() - t0
        best = max(best, audio_seconds / dt)

    print(
        json.dumps(
            {
                "metric": "end_to_end_transcription_throughput",
                "value": round(best, 1),
                "unit": "audio_sec_per_sec_per_chip",
                "vs_baseline": round(best / 500.0, 3),
                "detail": {
                    "audio_seconds": audio_seconds,
                    "note_events": len(events),
                    "pipeline": "44.1kHz raw -> device decimate+window+model+decode -> events",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
