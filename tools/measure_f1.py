"""Corpus-level note-F1 parity measurement: device pipeline vs reference model.

For every clip in a small mixed corpus (real vocal audio, synthetic piano,
and a rendered known-MIDI performance), this produces two transcriptions:

  reference stack : the reference TF SavedModel run on identically windowed
                    audio (`/root/reference/basic_pitch/saved_models/
                    icassp_2022/nmp`), unwrapped and decoded with this repo's
                    host decoder — which is pinned exact against the
                    reference decoder's golden events (tests/test_decode.py)
  device stack    : this framework's full device pipeline
                    (StreamingTranscriber: device CQT + model + decode)

and reports note precision/recall/F1 between them (onset+pitch criterion,
50 ms / 50 cents, and the stricter +offset criterion), plus ground-truth F1
for the rendered-MIDI clip. Writes ``tools/f1_report.json`` and prints a
markdown table for DESIGN.md/README.

Run from the repo root with TF installed: ``python tools/measure_f1.py``.
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from basic_pitch_tpu import constants, inference  # noqa: E402
from basic_pitch_tpu.decode import export  # noqa: E402
from basic_pitch_tpu.utils import audio as audio_io  # noqa: E402
from basic_pitch_tpu.utils import eval as eval_metrics  # noqa: E402
from basic_pitch_tpu.utils import midi as midi_io  # noqa: E402

SAVED_MODEL = "/root/reference/basic_pitch/saved_models/icassp_2022/nmp"
REFERENCE_WAV = "/root/reference/tests/resources/vocadito_10.wav"


def synth_audio(seconds: float, seed: int, sample_rate: int = 22050) -> np.ndarray:
    sys.path.insert(0, str(REPO_ROOT))
    import bench

    return bench.synth_audio(seconds, sample_rate, seed=seed)


def vocadito(seconds: float | None = None) -> np.ndarray:
    samples, sr = audio_io.read_wav(REFERENCE_WAV)
    mono = audio_io.resample(audio_io.to_mono(samples), sr, constants.AUDIO_SAMPLE_RATE)
    if seconds is None:
        return mono
    n = int(seconds * constants.AUDIO_SAMPLE_RATE)
    reps = -(-n // len(mono))
    return np.tile(mono, reps)[:n]


def midi_render(seconds: float = 60.0) -> tuple[np.ndarray, list]:
    """Deterministic melody+chords performance rendered with the sine synth.

    Returns (audio at 22.05 kHz, ground-truth (start, end, pitch) notes).
    """
    rng = np.random.RandomState(7)
    midi = midi_io.MidiFile(tempo=120)
    inst = midi_io.Instrument(program=0)
    truth = []
    t = 0.5
    scale = [60, 62, 64, 65, 67, 69, 71, 72]
    while t < seconds - 1.5:
        dur = float(rng.choice([0.25, 0.5, 0.75, 1.0]))
        pitch = int(rng.choice(scale)) + int(rng.choice([-12, 0, 0, 12]))
        inst.notes.append(midi_io.Note(t, t + dur, pitch, 96))
        truth.append((t, t + dur, pitch))
        if rng.rand() < 0.3:  # occasional third above
            inst.notes.append(midi_io.Note(t, t + dur, pitch + 4, 80))
            truth.append((t, t + dur, pitch + 4))
        t += dur + float(rng.choice([0.0, 0.25]))
    midi.instruments.append(inst)
    audio = midi.synthesize(constants.AUDIO_SAMPLE_RATE, amplitude=0.3)
    return audio.astype(np.float32), truth


def reference_events(tf_model, audio: np.ndarray, **decode_kwargs) -> list:
    """Reference-stack transcription: TF model on reference-style windows,
    host decode (pinned to the reference decoder by golden tests)."""
    overlap = constants.OVERLAP_LENGTH_SAMPLES
    hop = constants.WINDOW_HOP_SAMPLES
    padded = np.concatenate([np.zeros(overlap // 2, np.float32), audio])
    windows, _ = inference.window_audio_file(padded, hop)
    out = tf_model(windows[..., None])
    raw = {k: np.asarray(v) for k, v in out.items()}
    unwrapped = {
        k: inference.unwrap_output(raw[k], len(audio), constants.N_OVERLAPPING_FRAMES, hop)
        for k in raw
    }
    kwargs = dict(onset_thresh=0.5, frame_thresh=0.3, min_note_len=11)
    kwargs.update(decode_kwargs)
    _, events = export.model_output_to_notes(unwrapped, **kwargs)
    return events


def device_events(transcriber, audio: np.ndarray) -> list:
    return transcriber.transcribe(audio, constants.AUDIO_SAMPLE_RATE)


# ---------------------------------------------------------------------------
# Off-default operating points: decoder parity sweep
# (VERDICT r2 #9 — reference analogue `tests/test_inference.py:105-161`
#  at corpus scale, asserting event identity rather than F1)
# ---------------------------------------------------------------------------

SWEEP_CONFIGS = [
    {"name": "default"},
    {"name": "thresh_0.3/0.3", "onset_threshold": 0.3, "frame_threshold": 0.3},
    {"name": "thresh_0.8/0.8", "onset_threshold": 0.8, "frame_threshold": 0.8},
    {"name": "no_melodia", "melodia_trick": False},
    {"name": "freq_110_880", "min_freq": 110.0, "max_freq": 880.0},
    {"name": "min_note_30", "min_note_length": 30},
]


def reverb_poly(seconds: float = 45.0) -> np.ndarray:
    """Dense polyphony through a synthetic 0.4 s exponential reverb tail —
    smeared offsets and overlapping partials stress the greedy tracker and
    the melodia region-growing."""
    rng = np.random.RandomState(11)
    midi = midi_io.MidiFile(tempo=140)
    inst = midi_io.Instrument(program=0)
    t = 0.25
    scale = [48, 52, 55, 57, 60, 64, 67, 69, 72, 76]
    while t < seconds - 1.0:
        dur = float(rng.choice([0.25, 0.5, 0.75]))
        root = int(rng.choice(scale))
        for offset in (0, 4, 7) if rng.rand() < 0.6 else (0, 3, 7, 12):
            inst.notes.append(midi_io.Note(t, t + dur, root + offset, 90))
        t += float(rng.choice([0.125, 0.25, 0.5]))
    midi.instruments.append(inst)
    dry = midi.synthesize(constants.AUDIO_SAMPLE_RATE, amplitude=0.25)
    ir_len = int(0.4 * constants.AUDIO_SAMPLE_RATE)
    ir = rng.randn(ir_len) * np.exp(-np.arange(ir_len) / (0.08 * constants.AUDIO_SAMPLE_RATE))
    ir[0] = 3.0  # direct path dominates
    wet = np.convolve(dry, ir * 0.15)[: len(dry)]
    wet = wet / (np.abs(wet).max() + 1e-9) * 0.5
    return wet.astype(np.float32)


def low_snr(seconds: float = 45.0, snr_db: float = 10.0) -> np.ndarray:
    """Real vocals tiled under broadband noise at the given SNR."""
    rng = np.random.RandomState(13)
    clean = vocadito(seconds)
    noise = rng.randn(len(clean)).astype(np.float32)
    sig_rms = float(np.sqrt(np.mean(clean**2)))
    noise_rms = sig_rms / (10.0 ** (snr_db / 20.0))
    noisy = clean + noise * noise_rms / float(np.sqrt(np.mean(noise**2)))
    return np.clip(noisy, -1.0, 1.0).astype(np.float32)


def host_events_from_posteriorgrams(post: dict, **kwargs) -> list:
    """The pinned host decoder (exact vs the reference's golden events,
    tests/test_decode.py) applied to given posteriorgrams — mirrors the
    pipeline's overflow fallback path."""
    from basic_pitch_tpu.decode import notes as host_decode

    cfg = host_decode.DecodeConfig(
        onset_threshold=kwargs.get("onset_threshold", 0.5),
        frame_threshold=kwargs.get("frame_threshold", 0.3),
        min_note_length=kwargs.get("min_note_length", 11),
        infer_onsets=kwargs.get("infer_onsets", True),
        min_freq=kwargs.get("min_freq"),
        max_freq=kwargs.get("max_freq"),
        melodia_trick=kwargs.get("melodia_trick", True),
    )
    frame_notes = host_decode.decode_note_events(post["note"], post["onset"], cfg)
    events_f = host_decode.extract_pitch_bends(post["contour"], frame_notes)
    n_frames = post["note"].shape[0]
    times = host_decode.model_frames_to_time(n_frames)
    return [
        (float(times[s]), float(times[min(e, n_frames - 1)]), p, a, b)
        for s, e, p, a, b in events_f
    ]


def events_identical(host_ev: list, dev_ev: list, amp_tol: float = 1e-4):
    """(identical, reason): start/end/pitch/bends exact, amplitude to tol."""
    if len(host_ev) != len(dev_ev):
        return False, f"count {len(host_ev)} vs {len(dev_ev)}"
    for i, (h, d) in enumerate(zip(sorted(host_ev), sorted(dev_ev))):
        if h[0] != d[0] or h[1] != d[1] or h[2] != d[2]:
            return False, f"event {i}: {h[:3]} vs {d[:3]}"
        if abs(h[3] - d[3]) > amp_tol:
            return False, f"event {i} amplitude: {h[3]} vs {d[3]}"
        if list(h[4] or []) != list(d[4] or []):
            return False, f"event {i} bends differ"
    return True, ""


def run_sweep(transcriber, corpus) -> list:
    """Per (clip x config): fused device decode vs pinned host decoder on the
    SAME posteriorgram buffers — events must be identical.

    `return_model_outputs=True` hands back exactly the tensors the device
    decode consumed; decoding a separately-computed posteriorgram instead
    would compare different XLA programs' float noise, not the decoders.
    """
    rows = []
    for name, audio, _ in corpus:
        for cfg in SWEEP_CONFIGS:
            kwargs = {k: v for k, v in cfg.items() if k != "name"}
            ((dev_ev, post),) = transcriber.transcribe_batch(
                [(audio, constants.AUDIO_SAMPLE_RATE)],
                return_model_outputs=True,
                **kwargs,
            )
            host_ev = host_events_from_posteriorgrams(post, **kwargs)
            ok, reason = events_identical(host_ev, dev_ev)
            rows.append(
                {
                    "clip": name,
                    "config": cfg["name"],
                    "n_events": len(host_ev),
                    "identical": ok,
                    **({"mismatch": reason} if not ok else {}),
                }
            )
            status = "ok" if ok else f"MISMATCH: {reason}"
            print(
                f"  sweep [{transcriber.decode_backend:>6s}] {name:>20s} "
                f"{cfg['name']:<14s} {len(host_ev):4d} events  {status}"
            )
    return rows


def main() -> None:
    import tensorflow as tf

    from basic_pitch_tpu import pipeline

    tf_model = tf.saved_model.load(SAVED_MODEL)
    transcriber = pipeline.StreamingTranscriber(windows_per_chunk=192)

    render_audio, render_truth = midi_render(60.0)
    corpus = [
        ("vocadito_9s", vocadito(), None),
        ("vocadito_tiled_60s", vocadito(60.0), None),
        ("synth_piano_60s_a", synth_audio(60.0, seed=0), None),
        ("synth_piano_60s_b", synth_audio(60.0, seed=1), None),
        ("midi_render_60s", render_audio, render_truth),
        # stress material: where the decoders actually work for a living
        ("reverb_poly_45s", reverb_poly(45.0), None),
        ("low_snr_45s", low_snr(45.0), None),
    ]

    rows = []
    for name, audio, truth in corpus:
        ref_ev = reference_events(tf_model, audio)
        dev_ev = device_events(transcriber, audio)
        ref_notes = eval_metrics.events_to_notes(ref_ev)
        dev_notes = eval_metrics.events_to_notes(dev_ev)
        onset = eval_metrics.precision_recall_f1(ref_notes, dev_notes)
        strict = eval_metrics.precision_recall_f1(ref_notes, dev_notes, offset_ratio=0.2)
        row = {
            "clip": name,
            "n_reference": onset["n_reference"],
            "n_device": onset["n_estimated"],
            "f1_onset_pitch": round(onset["f1"], 4),
            "f1_with_offsets": round(strict["f1"], 4),
        }
        if truth is not None:
            gt_ref = eval_metrics.precision_recall_f1(truth, ref_notes)
            gt_dev = eval_metrics.precision_recall_f1(truth, dev_notes)
            row["gt_f1_reference_stack"] = round(gt_ref["f1"], 4)
            row["gt_f1_device_stack"] = round(gt_dev["f1"], 4)
        rows.append(row)
        print(row)

    print("\nDecoder parity sweep (device fused decode vs pinned host decoder):")
    # both exact decode backends, each asserted event-identical per config —
    # on CPU the Pallas kernel only runs interpreted, so hardware-only there
    import jax

    backends = {"xla": transcriber}
    if jax.devices()[0].platform != "cpu":
        backends["pallas"] = pipeline.StreamingTranscriber(
            windows_per_chunk=192, decode_backend="pallas"
        )
    sweep_rows = []
    for backend_name, tr in backends.items():
        rows_bk = run_sweep(tr, corpus)
        for r in rows_bk:
            r["backend"] = backend_name
        sweep_rows.extend(rows_bk)
    n_bad = sum(1 for r in sweep_rows if not r["identical"])

    out_path = REPO_ROOT / "tools" / "f1_report.json"
    out_path.write_text(
        json.dumps({"cross_stack_f1": rows, "decoder_parity_sweep": sweep_rows}, indent=2)
    )
    print(f"\nwrote {out_path}  (sweep mismatches: {n_bad}/{len(sweep_rows)})\n")

    print("| clip | ref notes | device notes | F1 (onset+pitch) | F1 (+offsets) |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['clip']} | {r['n_reference']} | {r['n_device']} "
            f"| {r['f1_onset_pitch']:.4f} | {r['f1_with_offsets']:.4f} |"
        )


if __name__ == "__main__":
    main()
