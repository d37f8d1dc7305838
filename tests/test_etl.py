"""ETL: dataset builders on synthetic corpora -> TFRecords -> loader.

The reference tests its builders with monkey-patched mirdata indexes and
synthetic media (`/root/reference/tests/data/conftest.py:15-50`); here each
corpus layout is fabricated directly (sine WAVs, 2-note MIDI written with
our own writer, hand-rolled jams/pv/csv/yaml annotations).
"""

import json

import numpy as np
import pytest

from basic_pitch_tpu import constants
from basic_pitch_tpu.data import annotations, pipeline, serialization, tfrecord
from basic_pitch_tpu.data.datasets import base, guitarset, ikala, maestro, medleydb_pitch, slakh
from basic_pitch_tpu.utils import audio as audio_io
from basic_pitch_tpu.utils import midi as midi_io


def _sine_wav(path, seconds=3.0, freq=220.0, sr=44100, stereo=False):
    t = np.arange(int(seconds * sr)) / sr
    y = (0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    audio_io.write_wav(path, np.stack([y, y], 1) if stereo else y, sr)


def _two_note_midi(path):
    m = midi_io.MidiFile(tempo=120)
    inst = midi_io.Instrument()
    inst.notes.append(midi_io.Note(0.25, 1.0, 60, 100))
    inst.notes.append(midi_io.Note(1.25, 2.0, 64, 90))
    m.instruments.append(inst)
    m.write(path)


# --- annotations -------------------------------------------------------------


def test_notes_to_sparse_basic():
    grid = annotations.time_grid_for_duration(2.0)
    idx, vals = annotations.notes_to_sparse(
        np.array([[0.5, 1.0]]), np.array([440.0]), grid, constants.FREQ_BINS_NOTES
    )
    frames = [i[0] for i in idx]
    bins = {i[1] for i in idx}
    assert bins == {48}  # A4 -> bin 48 (27.5 Hz * 2^(48/12) = 440)
    fps = constants.ANNOTATIONS_FPS
    assert min(frames) == int(np.ceil(0.5 * fps))
    assert max(frames) == int(np.ceil(1.0 * fps)) - 1
    assert all(v == 1.0 for v in vals)


def test_notes_to_sparse_onsets_only():
    grid = annotations.time_grid_for_duration(2.0)
    idx, _ = annotations.notes_to_sparse(
        np.array([[0.5, 1.0]]), np.array([440.0]), grid, constants.FREQ_BINS_NOTES,
        onsets_only=True,
    )
    assert len(idx) == 1


def test_f0_to_sparse_drops_unvoiced():
    grid = annotations.time_grid_for_duration(1.0)
    times = np.array([0.1, 0.2, 0.3])
    freqs = np.array([440.0, 0.0, 880.0])
    idx, vals = annotations.f0_to_sparse(times, freqs, grid, constants.FREQ_BINS_CONTOURS)
    assert len(idx) == 2
    assert {i[1] for i in idx} == {144, 180}  # 440 Hz, 880 Hz on the 3x grid


def test_hz_to_bin_out_of_range():
    bins = annotations.hz_to_bin(np.array([1.0, 27.5, 50000.0]), constants.FREQ_BINS_NOTES)
    assert bins[0] == -1 and bins[1] == 0 and bins[2] == -1


# --- pipeline skeleton -------------------------------------------------------


def test_assign_percentage_splits():
    data = pipeline.assign_percentage_splits([f"t{i}" for i in range(100)], 0.8, 0.1, seed=0)
    counts = {}
    for _, split in data:
        counts[split] = counts.get(split, 0) + 1
    assert counts["train"] == 80 and counts["validation"] == 10 and counts["test"] == 10


def test_overallocation_asserts():
    with pytest.raises(AssertionError):
        pipeline.assign_percentage_splits(["a"], 0.9, 0.2)


def test_pipeline_run_filters_and_writes(tmp_path):
    def to_examples(ids):
        return [f"example-{i}".encode() for i in ids]

    def filter_invalid(track_id):
        return "bad" if track_id == "t-bad" else None

    out_dir = pipeline.run(
        "toy",
        [("t1", "train"), ("t-bad", "train"), ("t2", "validation")],
        to_examples,
        filter_invalid,
        str(tmp_path),
        timestamped=False,
    )
    train_files = list((out_dir / "splits" / "train").glob("*.tfrecord"))
    assert len(train_files) == 1
    records = list(tfrecord.read_tfrecords(train_files[0]))
    assert records == [b"example-t1"]
    assert (out_dir / "index.csv").read_text().count("t-bad") == 0


def _toy_tracks(n=20):
    return [(f"track-{i:02d}", "train" if i % 3 else "validation") for i in range(n)]


def _toy_to_examples(ids):
    return [f"example-{i}".encode() for i in ids]


def _read_all(out_dir, split):
    records = []
    for path in sorted((out_dir / "splits" / split).glob("*.tfrecord")):
        records.extend(tfrecord.read_tfrecords(path))
    return records


def test_pipeline_tasks_are_disjoint_and_jointly_complete(tmp_path):
    """The Dataflow analogue (ref data/pipeline.py:87-99): two tasks with
    the same inputs and a shared destination produce disjoint shard sets
    whose union is exactly the single-task build."""
    input_data = _toy_tracks()

    single = pipeline.run(
        "toy", input_data, _toy_to_examples, lambda t: None,
        str(tmp_path / "single"), batch_size=3, timestamped=False,
    )
    sharded_dest = str(tmp_path / "sharded")
    outs = [
        pipeline.run(
            "toy", input_data, _toy_to_examples, lambda t: None,
            sharded_dest, batch_size=3, timestamped=False,
            num_tasks=2, task_index=task,
        )
        for task in range(2)
    ]
    assert outs[0] == outs[1]  # shared output directory
    out_dir = outs[0]
    assert pipeline.is_complete(out_dir, 2)
    assert not pipeline.is_complete(out_dir, 3)

    for split in ("train", "validation"):
        want = sorted(_read_all(single, split))
        got = sorted(_read_all(out_dir, split))
        assert got == want  # jointly complete, no duplicates (disjoint)
        # each task's shards are prefixed with its index and non-empty
        t0 = list((out_dir / "splits" / split).glob("t000-*.tfrecord"))
        t1 = list((out_dir / "splits" / split).glob("t001-*.tfrecord"))
        assert t0 and t1
    # the full index.csv is present regardless of which task wrote last
    assert len((out_dir / "index.csv").read_text().splitlines()) == len(input_data)
    # partition function is stable and total
    ids = [t for t, _ in input_data]
    assert {t for t in ids if pipeline.task_of(t, 2) == 0} | {
        t for t in ids if pipeline.task_of(t, 2) == 1
    } == set(ids)


def test_pipeline_resume_skips_completed_shards(tmp_path):
    """A killed build rerun with the same args re-converts only missing
    shards: completed ones are skipped via the manifest, and the final
    output equals an uninterrupted build's."""
    input_data = _toy_tracks(12)
    calls = []

    def counting_to_examples(ids):
        calls.append(list(ids))
        return _toy_to_examples(ids)

    class Boom(RuntimeError):
        pass

    def failing_to_examples(ids):
        if len(calls) >= 2:  # die after two shards
            raise Boom()
        return counting_to_examples(ids)

    dest = str(tmp_path / "resumable")
    with pytest.raises(Boom):
        pipeline.run(
            "toy", input_data, failing_to_examples, lambda t: None,
            dest, batch_size=3, timestamped=False,
        )
    done_before = len(calls)
    assert done_before == 2
    out_dir = pipeline.run(
        "toy", input_data, counting_to_examples, lambda t: None,
        dest, batch_size=3, timestamped=False,
    )
    # the two completed shards were not re-converted
    resumed_calls = len(calls) - done_before
    total_shards = sum(
        -(-len([1 for t, s in input_data if s == split]) // 3)
        for split in ("train", "validation")
    )
    assert resumed_calls == total_shards - done_before
    assert pipeline.is_complete(out_dir, 1)

    fresh = pipeline.run(
        "toy", input_data, _toy_to_examples, lambda t: None,
        str(tmp_path / "fresh"), batch_size=3, timestamped=False,
    )
    for split in ("train", "validation"):
        assert sorted(_read_all(out_dir, split)) == sorted(_read_all(fresh, split))


def test_pipeline_multitask_rejects_timestamped(tmp_path):
    with pytest.raises(ValueError, match="timestamped"):
        pipeline.run(
            "toy", _toy_tracks(4), _toy_to_examples, lambda t: None,
            str(tmp_path), num_tasks=2, task_index=0,
        )
    with pytest.raises(ValueError, match="out of range"):
        pipeline.run(
            "toy", _toy_tracks(4), _toy_to_examples, lambda t: None,
            str(tmp_path), num_tasks=2, task_index=2, timestamped=False,
        )


# --- builders on synthetic corpora -------------------------------------------


def _jams(path, notes, contours):
    jam = {
        "annotations": [
            {
                "namespace": "note_midi",
                "data": [
                    {"time": s, "duration": e - s, "value": midi, "confidence": None}
                    for s, e, midi in notes
                ],
            },
            {
                "namespace": "pitch_contour",
                "data": [
                    {"time": t, "duration": 0.0, "value": {"frequency": f, "index": 0, "voiced": f > 0}}
                    for t, f in contours
                ],
            },
        ]
    }
    path.write_text(json.dumps(jam))


def test_guitarset_builder(tmp_path):
    (tmp_path / "audio_mono-mic").mkdir()
    (tmp_path / "annotation").mkdir()
    _sine_wav(tmp_path / "audio_mono-mic" / "00_Rock1_mic.wav")
    _jams(
        tmp_path / "annotation" / "00_Rock1.jams",
        notes=[(0.5, 1.5, 60.0)],
        contours=[(0.5, 261.6), (0.6, 262.0), (0.7, 0.0)],
    )
    builder = guitarset.GuitarSetBuilder(str(tmp_path))
    assert builder.track_ids() == ["00_Rock1"]
    assert builder.filter_invalid("00_Rock1") is None
    records = builder.to_examples(["00_Rock1"])
    parsed = serialization.parse_transcription_example(records[0])
    assert parsed.source == "guitarset"
    assert parsed.notes.shape[1] == 88 and parsed.notes.sum() > 0
    assert parsed.onsets.sum() == 1.0
    assert parsed.contours.shape[1] == 264 and parsed.contours.sum() == 2.0


def test_maestro_builder(tmp_path):
    (tmp_path / "2020").mkdir()
    _sine_wav(tmp_path / "2020" / "perf.wav", seconds=3.0)
    _two_note_midi(tmp_path / "2020" / "perf.midi")
    index = [
        {
            "midi_filename": "2020/perf.midi",
            "audio_filename": "2020/perf.wav",
            "split": "train",
            "duration": 3.0,
        },
        {
            "midi_filename": "2020/long.midi",
            "audio_filename": "2020/long.wav",
            "split": "train",
            "duration": 1000.0,
        },
    ]
    (tmp_path / "maestro-v2.0.0.json").write_text(json.dumps(index))
    builder = maestro.MaestroBuilder(str(tmp_path))
    assert builder.filter_invalid("perf") is None
    assert builder.filter_invalid("long") == "longer than 15 minutes"
    parsed = serialization.parse_transcription_example(builder.to_examples(["perf"])[0])
    assert parsed.notes.sum() > 0 and parsed.contours.sum() > 0
    assert parsed.onsets.sum() == pytest.approx(100 / 127 + 90 / 127, abs=1e-5)  # velocity-scaled


def test_slakh_builder(tmp_path):
    import yaml

    track = tmp_path / "train" / "Track00001"
    (track / "stems").mkdir(parents=True)
    (track / "MIDI").mkdir()
    _sine_wav(track / "stems" / "S00.wav")
    _two_note_midi(track / "MIDI" / "S00.mid")
    _sine_wav(track / "stems" / "S01.wav")
    _two_note_midi(track / "MIDI" / "S01.mid")
    (track / "metadata.yaml").write_text(
        yaml.safe_dump(
            {"stems": {"S00": {"is_drum": False}, "S01": {"is_drum": True}}}
        )
    )
    builder = slakh.SlakhBuilder(str(tmp_path))
    data = dict(builder.input_data())
    assert data == {"Track00001-S00": "train", "Track00001-S01": "train"}
    assert builder.filter_invalid("Track00001-S00") is None
    assert builder.filter_invalid("Track00001-S01") == "drum stem"
    parsed = serialization.parse_transcription_example(builder.to_examples(["Track00001-S00"])[0])
    assert parsed.source == "slakh" and parsed.notes.sum() > 0


def test_ikala_builder(tmp_path):
    (tmp_path / "Wavfile").mkdir()
    (tmp_path / "PitchLabel").mkdir()
    _sine_wav(tmp_path / "Wavfile" / "10001_chorus.wav", stereo=True)
    pv = "\n".join(["0.0"] * 10 + ["69.0"] * 20 + ["0.0"] * 10)
    (tmp_path / "PitchLabel" / "10001_chorus.pv").write_text(pv)
    builder = ikala.IkalaBuilder(str(tmp_path))
    assert builder.filter_invalid("10001_chorus") is None
    splits = {s for _, s in builder.input_data(train_percent=0.9, seed=1)}
    assert splits <= {"train", "validation"}  # no test split
    parsed = serialization.parse_transcription_example(builder.to_examples(["10001_chorus"])[0])
    assert parsed.notes.shape == (0, 0)  # no pyin notes -> empty with (0,0) shape
    assert parsed.contours.sum() > 0


def test_medleydb_pitch_builder(tmp_path):
    (tmp_path / "audio").mkdir()
    (tmp_path / "pitch").mkdir()
    _sine_wav(tmp_path / "audio" / "Flute1.wav")
    (tmp_path / "pitch" / "Flute1.csv").write_text(
        "\n".join(f"{t/100:.3f},{440.0}" for t in range(50))
    )
    builder = medleydb_pitch.MedleyDBPitchBuilder(str(tmp_path))
    assert builder.filter_invalid("Flute1") is None
    parsed = serialization.parse_transcription_example(builder.to_examples(["Flute1"])[0])
    assert parsed.contours.sum() > 0


def test_built_dataset_feeds_loader(tmp_path):
    """End to end: builder -> pipeline.run -> training loader."""
    corpus = tmp_path / "corpus"
    (corpus / "audio_mono-mic").mkdir(parents=True)
    (corpus / "annotation").mkdir()
    for i in range(4):
        tid = f"0{i}_Funk1"
        _sine_wav(corpus / "audio_mono-mic" / f"{tid}_mic.wav", seconds=4.0)
        _jams(
            corpus / "annotation" / f"{tid}.jams",
            notes=[(0.2, 3.0, 57.0)],
            contours=[(t / 50, 220.0) for t in range(150)],
        )
    builder = guitarset.GuitarSetBuilder(str(corpus))
    input_data = [(tid, "train" if i < 3 else "validation") for i, tid in enumerate(builder.track_ids())]
    dest = tmp_path / "out"
    pipeline.run(
        "guitarset", input_data, builder.to_examples, builder.filter_invalid,
        str(dest), timestamped=False,
    )
    from basic_pitch_tpu.data import loader

    stream = loader.example_stream("train", str(dest), ["guitarset"], [1.0], seed=0)
    item = next(stream)
    assert item["audio"].shape == (constants.AUDIO_N_SAMPLES,)
    assert item["weights"]["note"] == 1.0
    assert item["targets"]["note"].sum() > 0


def test_slakh_split_ignores_source_prefix(tmp_path):
    """A corpus rooted under a directory named like a split (e.g.
    /data/test/slakh) must classify tracks by their IN-CORPUS split dir."""
    root = tmp_path / "test" / "slakh2100"
    for split, track in (("train", "Track00001"), ("validation", "Track00002")):
        d = root / split / track
        d.mkdir(parents=True)
        (d / "metadata.yaml").write_text("stems:\n  S00:\n    is_drum: false\n")
    builder = slakh.SlakhBuilder(str(root))
    splits = dict(builder.input_data())
    assert splits["Track00001-S00"] == "train"
    assert splits["Track00002-S00"] == "validation"


def test_ikala_split_honors_train_percent(tmp_path):
    """Reference semantics: train_percent tracks -> train, remainder ->
    validation (ikala.py:151); --validation-percent must not inflate train."""
    wav_dir = tmp_path / "Wavfile"
    wav_dir.mkdir()
    for i in range(10):
        (wav_dir / f"{10000+i}_track.wav").write_bytes(b"")
    builder = ikala.IkalaBuilder(str(tmp_path))
    data = builder.input_data(0.6, seed=0)
    counts = {}
    for _, split in data:
        counts[split] = counts.get(split, 0) + 1
    assert counts == {"train": 6, "validation": 4}


def test_prefetch_reraises_worker_errors():
    from basic_pitch_tpu.data import loader

    def bad_iter():
        yield "ok"
        raise IOError("corrupt record")

    out = loader._prefetch(bad_iter())
    assert next(out) == "ok"
    with pytest.raises(IOError, match="corrupt record"):
        next(out)
