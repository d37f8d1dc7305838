"""End-to-end training demonstration on a synthetic-but-realistic corpus.

Evidence that the full training stack TRAINS (not merely steps): builds a
corpus of rendered melodies with exact note/onset/contour annotations
through the framework's own rasterizer and TFRecord writer, trains the NMP
model from scratch on an 8-virtual-device data-parallel mesh through
`train/loop.fit` (plateau LR, checkpoints, the real ingest pipeline), and
then transcribes a held-out rendered clip with the trained weights,
scoring note F1 against ground truth.

Run: ``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu
python tools/train_demo.py [--epochs 10] [--steps 50]``
Writes ``tools/train_demo_report.json``.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import tempfile

import numpy as np

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def make_track(rng: np.random.RandomState, seconds: float):
    """(audio @22.05k, [(start, end, midi)]) — a clean rendered melody."""
    from basic_pitch_tpu.utils import midi as midi_io

    midi = midi_io.MidiFile(tempo=120)
    inst = midi_io.Instrument()
    truth = []
    t = 0.3
    scale = [52, 55, 57, 60, 62, 64, 67, 69, 72, 76]
    while t < seconds - 1.2:
        dur = float(rng.choice([0.3, 0.5, 0.8]))
        pitch = int(rng.choice(scale))
        inst.notes.append(midi_io.Note(t, t + dur, pitch, 100))
        truth.append((t, t + dur, pitch))
        t += dur + float(rng.choice([0.05, 0.2]))
    midi.instruments.append(inst)
    audio = midi.synthesize(22050, amplitude=0.5).astype(np.float32)
    return audio, truth


def write_corpus(base: pathlib.Path, n_train: int, n_val: int, seconds: float, seed: int = 0):
    from basic_pitch_tpu import constants
    from basic_pitch_tpu.data import annotations, serialization, tfrecord
    from basic_pitch_tpu.utils import audio as audio_io

    rng = np.random.RandomState(seed)
    for split, count in (("train", n_train), ("validation", n_val)):
        split_dir = base / "synthmel" / "splits" / split
        split_dir.mkdir(parents=True, exist_ok=True)
        for i in range(count):
            audio, truth = make_track(rng, seconds)
            duration = len(audio) / constants.AUDIO_SAMPLE_RATE
            time_grid = annotations.time_grid_for_duration(duration)
            intervals = np.asarray([(s, e) for s, e, _ in truth])
            pitches_hz = 440.0 * 2.0 ** ((np.asarray([p for _, _, p in truth]) - 69) / 12.0)
            n_frames = len(time_grid)
            notes_idx, notes_val = annotations.notes_to_sparse(
                intervals, pitches_hz, time_grid, constants.FREQ_BINS_NOTES
            )
            onset_idx, onset_val = annotations.notes_to_sparse(
                intervals, pitches_hz, time_grid, constants.FREQ_BINS_NOTES, onsets_only=True
            )
            contour_idx, contour_val = annotations.notes_to_sparse(
                intervals, pitches_hz, time_grid, constants.FREQ_BINS_CONTOURS
            )
            tmp_wav = split_dir / "_tmp.wav"
            audio_io.write_wav(tmp_wav, audio, constants.AUDIO_SAMPLE_RATE)
            wav_bytes = tmp_wav.read_bytes()
            tmp_wav.unlink()
            record = serialization.to_transcription_example(
                f"synthmel-{split}-{i}",
                "synthmel",
                wav_bytes,
                notes_indices=notes_idx,
                notes_values=notes_val,
                onsets_indices=onset_idx,
                onsets_values=onset_val,
                contours_indices=contour_idx,
                contours_values=contour_val,
                notes_onsets_shape=(n_frames, constants.N_FREQ_BINS_NOTES),
                contours_shape=(n_frames, constants.N_FREQ_BINS_CONTOURS),
            )
            with tfrecord.TFRecordWriter(split_dir / f"{i}.tfrecord") as writer:
                writer.write(record)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--n-devices", type=int, default=8)
    parser.add_argument("--output", default=None)
    args = parser.parse_args()

    from basic_pitch_tpu.utils import runtime

    runtime.pin_cpu_if_requested()
    import jax

    from basic_pitch_tpu import constants, inference
    from basic_pitch_tpu.data import loader
    from basic_pitch_tpu.decode import export
    from basic_pitch_tpu.parallel import mesh as mesh_lib
    from basic_pitch_tpu.train import loop as train_loop
    from basic_pitch_tpu.utils import eval as eval_metrics

    workdir = pathlib.Path(args.output or tempfile.mkdtemp(prefix="bp_train_demo_"))
    corpus = workdir / "corpus"
    print(f"workdir: {workdir}")
    write_corpus(corpus, n_train=24, n_val=4, seconds=12.0)

    train_iter, val_iter = loader.prepare_datasets(
        str(corpus),
        training_shuffle_buffer_size=100,
        batch_size=args.batch_size,
        validation_steps=4,
        datasets_to_use=["synthmel"],
        dataset_sampling_frequency=[1.0],
        seed=0,
    )

    n_dev = min(args.n_devices, len(jax.devices()))
    mesh = mesh_lib.make_mesh(jax.devices()[:n_dev]) if n_dev > 1 else None
    config = train_loop.TrainConfig(
        learning_rate=1e-3,
        epochs=args.epochs,
        steps_per_epoch=args.steps,
        validation_steps=4,
    )
    losses = []

    def record(epoch, params, train_metrics, val_metrics):
        losses.append(
            {"epoch": epoch, "train": train_metrics["loss"], "val": val_metrics["loss"]}
        )

    best = train_loop.fit(
        train_iter,
        val_iter,
        workdir / "run",
        config,
        mesh=mesh,
        seed=0,
        callbacks=(record,),
        resume=False,
    )

    # held-out evaluation: transcribe a fresh rendered clip with the trained
    # weights and score against its ground truth
    eval_rng = np.random.RandomState(12345)
    audio, truth = make_track(eval_rng, 12.0)
    model = inference.Model(best)
    overlap = constants.OVERLAP_LENGTH_SAMPLES
    hop = constants.WINDOW_HOP_SAMPLES
    padded = np.concatenate([np.zeros(overlap // 2, np.float32), audio])
    windows, _ = inference.window_audio_file(padded, hop)
    raw = model.predict(windows)
    unwrapped = {
        k: inference.unwrap_output(raw[k], len(audio), constants.N_OVERLAPPING_FRAMES, hop)
        for k in raw
    }
    scores = {}
    for onset_t, frame_t in ((0.5, 0.3), (0.3, 0.3), (0.3, 0.2)):
        _, events = export.model_output_to_notes(
            unwrapped, onset_thresh=onset_t, frame_thresh=frame_t, min_note_len=11
        )
        f1 = eval_metrics.precision_recall_f1(truth, eval_metrics.events_to_notes(events))
        scores[f"onset{onset_t}_frame{frame_t}"] = {
            "f1": round(f1["f1"], 4),
            "n_estimated": f1["n_estimated"],
        }

    report = {
        "n_devices": n_dev,
        "steps_total": args.epochs * args.steps,
        "first_epoch": losses[0] if losses else None,
        "last_epoch": losses[-1] if losses else None,
        "loss_history": losses,
        "heldout_f1": scores,
        "n_truth_notes": len(truth),
    }
    out = REPO_ROOT / "tools" / "train_demo_report.json"
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps({k: v for k, v in report.items() if k != "loss_history"}, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
