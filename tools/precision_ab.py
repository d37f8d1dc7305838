"""Measured precision experiment for the model stage (VERDICT r3 #2).

The NMP forward runs every dot/conv at `lax.Precision.HIGHEST` (6 bf16 MXU
passes ~= exact float32). `HIGH` (3 passes) would double the MXU-bound
ceiling — IF it keeps parity. Parity here is not a vibe: the repo's bar is
posteriorgrams within 1e-4 of the reference checkpoint on the golden clip
AND identical decoded note events on the corpus sweep. This harness runs
both precisions on the real chip and reports:

  1. golden-clip posteriorgram max|Δ| vs the REFERENCE's own checked-in
     fixture through the full pipeline (a cross-runtime bar: the reference
     fixture was produced by TF on another machine, so even HIGHEST sits at
     ~5e-4 here; the repo's canonical 1e-4 parity is the per-window test
     against tests/goldens, which regenerates on this machine),
  2. note-event identity between the two precisions on bench workloads —
     the DECISION GATE (the repo's contract is exact event parity),
  3. device-only model-stage time for each (device_get-forced), i.e. the
     actual speedup on offer.

Measured 2026-08-19 (v5e): HIGH = 1.595x model-stage speedup
(0.248 -> 0.156 s per 20-min stream), golden deviation 2-6x worse
(e.g. note 5.5e-4 -> 2.0e-3), and 6 event diffs in 5673 on dense piano
(vocal workload identical). REJECTED as default — the pipeline keeps
Precision.HIGHEST; callers who accept ~0.1% event churn can pass
`StreamingTranscriber(precision=jax.lax.Precision.HIGH)`.
Run: python tools/precision_ab.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

GOLDEN_WAV = "/root/reference/tests/resources/vocadito_10.wav"
GOLDEN_NPZ = "/root/reference/tests/resources/vocadito_10/model_output.npz"


def model_stage_time(tr, pcm: np.ndarray, reps: int = 3) -> float:
    """Device-only model time on one 20-min stream (device_get-forced)."""
    import jax
    import jax.numpy as jnp

    from basic_pitch_tpu import pipeline

    pad_front = pipeline.OVERLAP // 2
    n_windows = max(1, -(-(len(pcm) + pad_front) // pipeline.HOP))
    n_chunks = -(-n_windows // tr.w)
    pieces = list(tr._pieces(pcm, False, n_chunks))
    piece_fn = tr._piece_fn(False)
    dev_pieces = [jax.device_put(p) for p in pieces]
    probe = jax.jit(lambda x: jnp.sum(x[-1]))
    jax.device_get(probe(dev_pieces[-1]))

    best = float("inf")
    for _ in range(reps + 1):  # first rep warms the executables
        t0 = time.time()
        outs = [piece_fn(tr.params, d) for d in dev_pieces]
        jax.device_get(probe(outs[-1]["note"]))
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    import jax

    import bench

    from basic_pitch_tpu import pipeline
    from basic_pitch_tpu.utils import audio as audio_io
    from basic_pitch_tpu.utils import flops as flops_mod

    precisions = {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
    }

    samples, sr = audio_io.read_wav(GOLDEN_WAV)
    golden_audio = audio_io.to_mono(samples)
    golden = np.load(GOLDEN_NPZ, allow_pickle=True)["arr_0"].item()

    single = bench.synth_audio(1200.0, seed=7)
    single_pcm = np.clip(np.round(single * 32768.0), -32768, 32767).astype(np.int16)
    workloads = {
        "piano_20min": (single_pcm, 22050),
        "vocal_tiled": (
            np.clip(
                np.round(bench.real_audio(120.0) * 32768.0), -32768, 32767
            ).astype(np.int16),
            22050,
        ),
    }

    report = {}
    events_by_precision = {}
    for name, prec in precisions.items():
        tr = pipeline.StreamingTranscriber(
            windows_per_chunk=192, precision=prec, decode_backend="auto",
            pcm_transport="raw",
        )
        post = tr.posteriorgrams(golden_audio, sr)
        diffs = {
            k: float(np.abs(post[k][: golden[k].shape[0]] - golden[k]).max())
            for k in ("note", "onset", "contour")
        }
        model_s = model_stage_time(tr, single_pcm)
        n_wins = -(-(len(single_pcm) + pipeline.OVERLAP // 2) // pipeline.HOP)
        n_wins = -(-n_wins // tr.w) * tr.w
        mfu = flops_mod.mfu_report(
            n_wins * flops_mod.window_forward_flops(),
            model_s,
            jax.devices()[0].device_kind,
        )
        events_by_precision[name] = {
            w: tr.transcribe(pcm, r) for w, (pcm, r) in workloads.items()
        }
        report[name] = {
            "golden_max_abs_diff": diffs,
            "golden_within_1e-4": all(d <= 1e-4 for d in diffs.values()),
            "model_stage_s_20min": round(model_s, 4),
            **mfu,
        }
        print(f"{name}: {report[name]}", file=sys.stderr)

    ident = {}
    for w in workloads:
        a = events_by_precision["highest"][w]
        b = events_by_precision["high"][w]
        same = len(a) == len(b) and all(
            x[2] == y[2] and abs(x[0] - y[0]) < 1e-6 and abs(x[1] - y[1]) < 1e-6
            for x, y in zip(sorted(a), sorted(b))
        )
        ident[w] = {"n_highest": len(a), "n_high": len(b), "identical": same}
    report["event_identity_high_vs_highest"] = ident
    report["speedup_high_over_highest"] = round(
        report["highest"]["model_stage_s_20min"]
        / max(report["high"]["model_stage_s_20min"], 1e-9),
        3,
    )
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
