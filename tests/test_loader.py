"""Training data loader: file ordering, windowing, weights, batching."""

import numpy as np
import pytest

from basic_pitch_tpu import constants
from basic_pitch_tpu.data import loader, serialization, tfrecord
from basic_pitch_tpu.utils import audio as audio_io


def _write_dataset(base, name, split, n_files=2, tracks_per_file=1, with_contours=True, seconds=5):
    rng = np.random.RandomState(hash(name) % 2**31)
    split_dir = base / name / "splits" / split
    split_dir.mkdir(parents=True)
    fps = constants.ANNOTATIONS_FPS
    for i in range(n_files):
        path = split_dir / f"{i}.tfrecord"
        with tfrecord.TFRecordWriter(path) as writer:
            for t in range(tracks_per_file):
                audio = (rng.randn(22050 * seconds) * 0.1).astype(np.float32)
                import io as _io

                wav_buf = _io.BytesIO()
                # write via temp file API
                tmp = split_dir / "tmp.wav"
                audio_io.write_wav(tmp, audio, 22050)
                wav_bytes = tmp.read_bytes()
                tmp.unlink()
                n_frames = fps * seconds
                notes_idx = [(f, 40) for f in range(10, n_frames, 17)]
                record = serialization.to_transcription_example(
                    f"{name}-{i}-{t}",
                    name,
                    wav_bytes,
                    notes_indices=notes_idx,
                    notes_values=[1.0] * len(notes_idx),
                    onsets_indices=notes_idx,
                    onsets_values=[1.0] * len(notes_idx),
                    contours_indices=[(f, 120) for f, _ in notes_idx] if with_contours else [],
                    contours_values=[1.0] * len(notes_idx) if with_contours else [],
                    notes_onsets_shape=(n_frames, 88),
                    contours_shape=(n_frames, 264) if with_contours else (0, 0),
                )
                writer.write(record)


@pytest.fixture()
def data_dir(tmp_path):
    for name in ("setA", "setB"):
        _write_dataset(tmp_path, name, "train")
        _write_dataset(tmp_path, name, "validation")
    return tmp_path


def test_train_file_order_weighted():
    import random

    files = {"a": ["a1", "a2", "a3"], "b": ["b1", "b2", "b3"]}
    order = list(loader.train_file_order(files, np.array([1.0, 1.0]), random.Random(0)))
    # stops when the first pool dries up; every yielded file unique
    assert len(order) == len(set(order))
    assert 3 <= len(order) <= 6


def test_validation_file_order_round_robin():
    files = {"a": ["a1", "a2"], "b": ["b1"]}
    order = list(loader.validation_file_order(files))
    assert sorted(order) == ["a1", "a2", "b1"]
    assert order[0].startswith("a") and order[1].startswith("b")


def test_example_stream_shapes(data_dir):
    stream = loader.example_stream(
        "train", str(data_dir), ["setA", "setB"], [0.5, 0.5], seed=0
    )
    item = next(stream)
    assert item["audio"].shape == (constants.AUDIO_N_SAMPLES,)
    assert item["targets"]["note"].shape == (172, 88)
    assert item["targets"]["contour"].shape == (172, 264)
    assert item["weights"]["note"] == 1.0


def test_parallel_parse_is_deterministic(data_dir):
    """parse_workers>1 must yield the identical stream for a fixed seed —
    order-preserving parallel map, rng consumed in stream order."""
    serial = loader.example_stream(
        "train", str(data_dir), ["setA", "setB"], [0.5, 0.5], seed=3
    )
    parallel = loader.example_stream(
        "train", str(data_dir), ["setA", "setB"], [0.5, 0.5], seed=3,
        parse_workers=4,
    )
    for _ in range(12):
        a, b = next(serial), next(parallel)
        np.testing.assert_array_equal(a["audio"], b["audio"])
        for head in ("onset", "note", "contour"):
            np.testing.assert_array_equal(a["targets"][head], b["targets"][head])
            assert a["weights"][head] == b["weights"][head]


def test_missing_dataset_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        next(loader.example_stream("train", str(tmp_path), ["nope"], [1.0]))


def test_weights_zero_for_missing_annotations(tmp_path):
    _write_dataset(tmp_path, "noc", "train", with_contours=False)
    stream = loader.example_stream("train", str(tmp_path), ["noc"], [1.0], seed=1)
    item = next(stream)
    assert item["weights"]["contour"] == 0.0
    assert item["weights"]["note"] == 1.0
    assert item["targets"]["contour"].shape == (172, 264)
    assert item["targets"]["contour"].sum() == 0.0


def test_prepare_datasets_batches(data_dir):
    train_iter, val_iter = loader.prepare_datasets(
        str(data_dir),
        training_shuffle_buffer_size=8,
        batch_size=4,
        validation_steps=2,
        datasets_to_use=["setA", "setB"],
        dataset_sampling_frequency=[0.5, 0.5],
        seed=0,
    )
    batch = next(train_iter)
    assert batch["audio"].shape == (4, constants.AUDIO_N_SAMPLES)
    assert batch["targets"]["onset"].shape == (4, 172, 88)
    assert batch["weights"]["onset"].shape == (4,)
    # validation cycles the same cached batches
    v1 = next(val_iter)
    v2 = next(val_iter)
    v3 = next(val_iter)
    np.testing.assert_array_equal(v1["audio"], v3["audio"])
    assert v1["audio"].shape == (4, constants.AUDIO_N_SAMPLES)


def test_pairs_mixing(data_dir):
    stream = loader.example_stream(
        "train", str(data_dir), ["setA"], [1.0], pairs=True, seed=3
    )
    items = [next(stream) for _ in range(12)]
    assert all(i["audio"].shape == (constants.AUDIO_N_SAMPLES,) for i in items)
    assert all(max(i["targets"]["note"].max(), 0) <= 1.0 for i in items)


def test_loader_host_shards_are_disjoint_and_complete(tmp_path):
    """Multi-host slicing: each host's file partition is disjoint, the union
    is the full split, and prepare_datasets yields per-host batches of
    global_batch / num_shards items."""
    for name in ("setA",):
        _write_dataset(tmp_path, name, "train", n_files=6)
        _write_dataset(tmp_path, name, "validation", n_files=2)

    full = loader._dataset_files(str(tmp_path), "setA", "train")
    shard0 = loader._dataset_files(str(tmp_path), "setA", "train", num_shards=2, shard_index=0)
    shard1 = loader._dataset_files(str(tmp_path), "setA", "train", num_shards=2, shard_index=1)
    assert set(shard0).isdisjoint(shard1)
    assert sorted(shard0 + shard1) == full
    assert shard0 and shard1  # 6 files hash across both shards

    train_iter, val_iter = loader.prepare_datasets(
        str(tmp_path), 0, batch_size=4, validation_steps=1,
        datasets_to_use=["setA"], dataset_sampling_frequency=[1.0],
        seed=0, num_shards=2, shard_index=0,
    )
    batch = next(train_iter)
    assert batch["audio"].shape[0] == 2  # local slice of the global batch 4
    val_batch = next(val_iter)
    assert val_batch["audio"].shape[0] == 4  # validation stays host-global

    with pytest.raises(ValueError, match="divide"):
        loader.prepare_datasets(
            str(tmp_path), 0, batch_size=5, validation_steps=1,
            datasets_to_use=["setA"], dataset_sampling_frequency=[1.0],
            num_shards=2, shard_index=0,
        )


def _assert_batches_equal(a, b):
    assert np.array_equal(a["audio"], b["audio"]) and a["audio"].dtype == b["audio"].dtype
    for head in ("onset", "contour", "note"):
        sa, sb = a["targets_sparse"][head], b["targets_sparse"][head]
        assert np.array_equal(sa["idx"], sb["idx"]), head
        assert np.array_equal(sa["val"], sb["val"]), head
        assert np.array_equal(a["weights"][head], b["weights"][head])


def test_coo_window_path_matches_dense_bitexact(data_dir):
    """The COO fast path (windows sliced from the track's sparse COO, no
    raster ever built) must collate bit-identically to the dense path
    (raster fill -> window slice -> np.nonzero re-sparsification)."""

    def batches(coo):
        stream = loader.example_stream(
            "train", str(data_dir), ["setA", "setB"], [0.5, 0.5], seed=3, coo=coo
        )
        it = loader._batched(stream, 16, device_targets=True)
        return [next(it) for _ in range(3)]

    for dense_b, coo_b in zip(batches(False), batches(True)):
        _assert_batches_equal(dense_b, coo_b)


def test_coo_path_missing_contours_and_validation(tmp_path):
    _write_dataset(tmp_path, "noc", "validation", with_contours=False)
    def batches(coo):
        stream = loader.example_stream(
            "validation", str(tmp_path), ["noc"], [1.0], seed=1, coo=coo
        )
        it = loader._batched(stream, 4, device_targets=True)
        return next(it)

    dense_b, coo_b = batches(False), batches(True)
    _assert_batches_equal(dense_b, coo_b)
    assert float(coo_b["weights"]["contour"][0]) == 0.0


def test_coo_dedupe_and_stored_zeros_match_dense(tmp_path):
    """Duplicate COO coords (dense scatter keeps the last write) and
    explicitly-stored zero values (np.nonzero drops them) must survive the
    COO fast path identically."""
    from basic_pitch_tpu.data import serialization as ser

    fps = constants.ANNOTATIONS_FPS
    n_frames = fps * 5
    rng = np.random.RandomState(0)
    audio = (rng.randn(22050 * 5) * 0.1).astype(np.float32)
    tmp = tmp_path / "tmp.wav"
    audio_io.write_wav(tmp, audio, 22050)
    wav_bytes = tmp.read_bytes()
    # duplicates: (50, 40) written twice (0.3 then 0.9 -> dense keeps 0.9);
    # (60, 41) written 0.5 then 0.0 -> dense holds 0.0 -> nonzero drops it;
    # (70, 42) stored as a plain zero -> dropped
    notes_idx = [(50, 40), (50, 40), (60, 41), (60, 41), (70, 42), (80, 43)]
    notes_val = [0.3, 0.9, 0.5, 0.0, 0.0, 1.0]
    record = ser.to_transcription_example(
        "dup", "toy", wav_bytes,
        notes_indices=notes_idx, notes_values=notes_val,
        onsets_indices=notes_idx, onsets_values=notes_val,
        contours_indices=[(f, 120) for f, _ in notes_idx], contours_values=notes_val,
        notes_onsets_shape=(n_frames, 88), contours_shape=(n_frames, 264),
    )
    ex = ser.parse_transcription_example(record)
    rng_d = np.random.RandomState(7)
    rng_c = np.random.RandomState(7)
    dense_items = list(loader.iter_track_windows(ex, 12, False, rng_d))
    # fresh parse: the first pass may have cached the dense rasters
    ex2 = ser.parse_transcription_example(record)
    coo_items = list(loader.iter_track_windows(ex2, 12, False, rng_c, coo=True))
    assert len(dense_items) == len(coo_items) > 0
    _assert_batches_equal(
        loader._collate_device(dense_items), loader._collate_device(coo_items)
    )
