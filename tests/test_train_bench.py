"""Training benchmark harness: corpus synthesis -> ETL -> timed training ->
held-out eval (the reproducible backing for TRAIN_BENCH.json, VERDICT r2 #1)."""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))

import make_guitar_corpus as mgc  # noqa: E402
import train_bench  # noqa: E402


def test_corpus_layout_and_annotations(tmp_path):
    """The synthetic corpus matches GuitarSet's on-disk contract: mic WAVs at
    44.1 kHz, per-string note_midi + pitch_contour JAMS, non-trivial sparsity."""
    root = mgc.make_corpus(tmp_path, n_tracks=2, track_seconds=8.0)
    wavs = sorted((root / "audio_mono-mic").glob("*_mic.wav"))
    jams = sorted((root / "annotation").glob("*.jams"))
    assert len(wavs) == 2 and len(jams) == 2

    from basic_pitch_tpu.utils import audio as audio_io

    samples, sr = audio_io.read_wav(str(wavs[0]))
    assert sr == 44100
    assert len(samples) == int(8.0 * 44100)
    assert float(np.abs(samples).max()) > 0.05  # actually contains plucks

    import json

    jam = json.loads(jams[0].read_text())
    namespaces = [a["namespace"] for a in jam["annotations"]]
    assert namespaces.count("note_midi") == 6  # one per string
    assert namespaces.count("pitch_contour") == 6
    truth = mgc.truth_events(root, wavs[0].name[: -len("_mic.wav")])
    assert len(truth) > 5
    # plucked strings stay inside the instrument's range
    assert all(40 <= p <= 76 for _, _, p in truth)


def test_train_bench_pipeline_miniature(tmp_path):
    """Corpus -> real builder -> real loader -> timed steps -> stats dict,
    with the loss moving and the feed margin well-defined."""
    corpus, shards, etl = train_bench.build_corpus_and_shards(tmp_path, 10, 6.0)
    assert (shards / "guitarset" / "index.csv").exists()
    assert list((shards / "guitarset" / "splits" / "train").glob("*.tfrecord"))

    params, stats = train_bench.timed_training(
        shards, steps=6, batch_size=4, learning_rate=2e-3, warmup_steps=2
    )
    assert stats["step_time_ms_amortized"] > 0
    assert stats["step_latency_ms_synchronous"] > 0
    assert 0.0 <= stats["loader_feed_margin"] <= 1.0
    assert np.isfinite(stats["final_loss"])
    assert stats["final_loss"] < stats["first_loss"]  # it learns, even in 6 steps
    assert stats["windows_per_s"] > 0
