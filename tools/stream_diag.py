"""Diagnose streaming-vs-offline mismatches on the worst STREAM_PARITY cell.

Runs real_vocal_tiled at the aggressive setting (segment 1 s / lookahead
0.5 s / context 8 s), bipartite-matches streamed vs offline events, and
prints every unmatched event on both sides with its nearest same-pitch
neighbor — the raw material for deciding whether the parity gap is a
mechanism bug (fixable) or the measured floor of segment-local decoding.

CPU-safe: JAX_PLATFORMS=cpu python tools/stream_diag.py [seconds]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")

if os.environ.get("STREAM_DIAG_CPU", "1") == "1":
    # the hosted TPU plugin ignores JAX_PLATFORMS; pin explicitly
    import jax

    jax.config.update("jax_platforms", "cpu")


def main() -> None:
    from basic_pitch_tpu import pipeline
    from basic_pitch_tpu.streaming import StreamingSession
    from basic_pitch_tpu.utils import eval as eval_utils
    import bench

    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    seg, look, ctx = 1.0, 0.5, 8.0
    sr = 22050
    audio = bench.real_audio(seconds)
    transcriber = pipeline.StreamingTranscriber(
        windows_per_chunk=16, decode_backend="auto", pcm_transport="auto"
    )
    offline = transcriber.transcribe(audio, sr)

    session = StreamingSession(
        transcriber,
        sample_rate=sr,
        segment_seconds=seg,
        lookahead_seconds=look,
        max_context_seconds=ctx,
    )
    streamed = []
    block = int(0.25 * sr)
    for lo in range(0, len(audio), block):
        streamed.extend(session.feed(audio[lo : lo + block]))
    streamed.extend(session.close())

    ref = eval_utils.events_to_notes(offline)
    est = eval_utils.events_to_notes(streamed)
    scored = eval_utils.precision_recall_f1(ref, est)
    print(
        json.dumps(
            {
                "f1_onset": scored["f1"],
                "offline": len(ref),
                "streamed": len(est),
                "matched": scored["n_matched"],
                "stats": session.stats,
            }
        )
    )

    # Re-derive the match set so we can print the leftovers.
    matched_ref = set()
    matched_est = set()
    # greedy re-match with the same criterion (onset 50 ms + pitch) — close
    # enough to the bipartite matcher for diagnostics
    used = set()
    for i, (ron, roff, rp) in enumerate(ref):
        best, bestd = None, None
        for j, (eon, eoff, ep) in enumerate(est):
            if j in used or ep != rp:
                continue
            d = abs(eon - ron)
            if d <= 0.05 and (bestd is None or d < bestd):
                best, bestd = j, d
        if best is not None:
            used.add(best)
            matched_ref.add(i)
            matched_est.add(best)

    def near(evts, onset, pitch):
        c = [
            (abs(s - onset), s, e) for s, e, p in evts if p == pitch
        ]
        return min(c)[1:] if c else None

    print("--- offline events MISSED by streaming ---")
    for i, (s, e, p) in enumerate(ref):
        if i not in matched_ref:
            print(
                f"  miss onset={s:7.3f} end={e:7.3f} pitch={p}"
                f" nearest_streamed={near(est, s, p)}"
            )
    print("--- streamed events NOT in offline (spurious) ---")
    for j, (s, e, p) in enumerate(est):
        if j not in matched_est:
            print(
                f"  extra onset={s:7.3f} end={e:7.3f} pitch={p}"
                f" nearest_offline={near(ref, s, p)}"
            )


if __name__ == "__main__":
    main()
