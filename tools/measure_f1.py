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


def reference_events(tf_model, audio: np.ndarray) -> list:
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
    _, events = export.model_output_to_notes(
        unwrapped, onset_thresh=0.5, frame_thresh=0.3, min_note_len=11
    )
    return events


def device_events(transcriber, audio: np.ndarray) -> list:
    return transcriber.transcribe(audio, constants.AUDIO_SAMPLE_RATE)


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

    out_path = REPO_ROOT / "tools" / "f1_report.json"
    out_path.write_text(json.dumps(rows, indent=2))
    print(f"\nwrote {out_path}\n")

    print("| clip | ref notes | device notes | F1 (onset+pitch) | F1 (+offsets) |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['clip']} | {r['n_reference']} | {r['n_device']} "
            f"| {r['f1_onset_pitch']:.4f} | {r['f1_with_offsets']:.4f} |"
        )


if __name__ == "__main__":
    main()
