"""Inference orchestration: windowing, unwrap, end-to-end predict.

Mirrors the reference's test strategy
(`/root/reference/tests/test_inference.py`): golden end-to-end regression,
file-output existence, parameter sweeps, and windowing unit checks.
"""

import pathlib

import numpy as np
import pytest

from basic_pitch_tpu import constants, inference

VOCADITO = pathlib.Path("/root/reference/tests/resources/vocadito_10.wav")
REF_FIXTURES = pathlib.Path("/root/reference/tests/resources/vocadito_10")

needs_clip = pytest.mark.skipif(not VOCADITO.exists(), reason="test clip unavailable")


@pytest.fixture(scope="module")
def model():
    return inference.Model()


@pytest.fixture(scope="module")
def vocadito_prediction(model):
    if not VOCADITO.exists():
        pytest.skip("test clip unavailable")
    return inference.predict(VOCADITO, model)


# --- windowing ---------------------------------------------------------------


def test_window_audio_file_counts():
    hop = constants.WINDOW_HOP_SAMPLES
    audio = np.zeros(hop * 5 + 1000, dtype=np.float32)
    windows, times = inference.window_audio_file(audio, hop)
    assert windows.shape == (6, constants.AUDIO_N_SAMPLES)
    starts = [t["start"] for t in times]
    assert starts == sorted(starts)
    assert times[0]["start"] == 0.0
    assert times[1]["start"] == pytest.approx(hop / constants.AUDIO_SAMPLE_RATE)


def test_window_audio_file_prefix_identity():
    hop = constants.WINDOW_HOP_SAMPLES
    audio = np.random.RandomState(0).randn(hop * 2).astype(np.float32)
    windows, _ = inference.window_audio_file(audio, hop)
    np.testing.assert_array_equal(windows[0], audio[: constants.AUDIO_N_SAMPLES])


@needs_clip
def test_get_audio_input_original_length():
    overlap = constants.OVERLAP_LENGTH_SAMPLES
    hop = constants.WINDOW_HOP_SAMPLES
    windows, times, original_length = inference.get_audio_input(VOCADITO, overlap, hop)
    # the reference test asserts this exact decoded length
    assert original_length == 200607
    assert windows.shape[0] == 6


def test_unwrap_output_shapes():
    out = np.random.rand(6, 172, 88).astype(np.float32)
    unwrapped = inference.unwrap_output(out, 200607, 30)
    assert unwrapped.shape == (787, 88)
    # trimmed interiors are preserved in order
    np.testing.assert_array_equal(unwrapped[:142], out[0, 15:157])
    np.testing.assert_array_equal(unwrapped[142:284], out[1, 15:157])


def test_bucket_size():
    assert inference._bucket_size(1) == 1
    assert inference._bucket_size(5) == 8
    assert inference._bucket_size(128) == 128
    assert inference._bucket_size(1000) == 128


# --- end-to-end --------------------------------------------------------------


@needs_clip
def test_predict_golden_note_events(vocadito_prediction):
    """Full pipeline (our decoder, our resampler) reproduces the reference's
    golden note events on the reference clip."""
    if not REF_FIXTURES.exists():
        pytest.skip("reference fixtures unavailable")
    _, _, events = vocadito_prediction
    golden = np.load(REF_FIXTURES / "note_events.npz", allow_pickle=True)["arr_0"]
    assert len(events) == len(golden)
    for mine, ref in zip(sorted(events), sorted(tuple(r) for r in golden)):
        assert mine[2] == ref[2]
        assert mine[0] == pytest.approx(ref[0], abs=1e-4)
        assert mine[1] == pytest.approx(ref[1], abs=1e-4)


@needs_clip
def test_predict_golden_model_output(vocadito_prediction):
    """Posteriorgrams bit-close to the reference golden (the residual diff is
    the resampler: ours vs librosa's; tolerance covers it)."""
    if not REF_FIXTURES.exists():
        pytest.skip("reference fixtures unavailable")
    model_output, _, _ = vocadito_prediction
    golden = np.load(REF_FIXTURES / "model_output.npz", allow_pickle=True)["arr_0"].item()
    for key in ("note", "onset", "contour"):
        assert model_output[key].shape == golden[key].shape
        assert float(np.abs(model_output[key] - golden[key]).max()) < 5e-3


@needs_clip
def test_predict_and_save_writes_all_artifacts(model, tmp_path):
    inference.predict_and_save(
        [VOCADITO], tmp_path, True, True, True, True, model
    )
    produced = {p.suffix for p in tmp_path.iterdir()}
    assert produced == {".mid", ".npz", ".wav", ".csv"}


def test_model_predict_empty_batch(model):
    out = model.predict(np.zeros((0, constants.AUDIO_N_SAMPLES), np.float32))
    assert out["note"].shape == (0, constants.ANNOT_N_FRAMES, constants.N_FREQ_BINS_NOTES)
    assert out["contour"].shape == (0, constants.ANNOT_N_FRAMES, constants.N_FREQ_BINS_CONTOURS)


@needs_clip
def test_predict_and_save_streaming_artifacts_match(model, tmp_path):
    """The batched streaming path writes the same artifact set, and its NPZ
    posteriorgrams (fetched from the SAME forward pass as the decode — no
    second model run) match the windowed path's."""
    stream_dir = tmp_path / "stream"
    ref_dir = tmp_path / "ref"
    stream_dir.mkdir()
    ref_dir.mkdir()
    inference.predict_and_save_streaming(
        [VOCADITO], stream_dir, True, False, True, True, model
    )
    produced = {p.suffix for p in stream_dir.iterdir()}
    assert produced == {".mid", ".npz", ".csv"}
    inference.predict_and_save([VOCADITO], ref_dir, False, False, True, False, model)
    got = np.load(next(stream_dir.glob("*.npz")), allow_pickle=True)
    want = np.load(next(ref_dir.glob("*.npz")), allow_pickle=True)
    got_d = got["basic_pitch_model_output"].item()
    want_d = want["basic_pitch_model_output"].item()
    for key in ("note", "onset", "contour"):
        assert got_d[key].shape == want_d[key].shape
        assert float(np.abs(got_d[key] - want_d[key]).max()) < 5e-3


@needs_clip
def test_output_collision_refused(model, tmp_path):
    inference.predict_and_save([VOCADITO], tmp_path, True, False, False, False, model)
    with pytest.raises(IOError):
        inference.predict_and_save([VOCADITO], tmp_path, True, False, False, False, model)


@needs_clip
@pytest.mark.parametrize("onset_threshold,frame_threshold", [(0.0, 0.0), (0.3, 0.3), (0.8, 0.8), (1.0, 1.0)])
def test_threshold_sweep(model, onset_threshold, frame_threshold):
    _, _, events = inference.predict(
        VOCADITO, model, onset_threshold=onset_threshold, frame_threshold=frame_threshold
    )
    for start, end, pitch, amplitude, _ in events:
        assert end > start
        assert 0 <= pitch <= 127
        assert 0.0 <= amplitude <= 1.0


@needs_clip
def test_minimum_note_length_respected(model):
    min_len_ms = 300.0
    _, _, events = inference.predict(VOCADITO, model, minimum_note_length=min_len_ms)
    for start, end, *_ in events:
        assert (end - start) >= min_len_ms / 1000 * 0.95


@needs_clip
def test_frequency_bounds_respected(model):
    fmin, fmax = 110.0, 880.0
    _, _, events = inference.predict(
        VOCADITO, model, minimum_frequency=fmin, maximum_frequency=fmax
    )
    from basic_pitch_tpu.decode.notes import midi_to_hz

    assert events
    for _, _, pitch, *_ in events:
        hz = midi_to_hz(pitch)
        assert fmin * 0.9 <= hz <= fmax * 1.1


def test_verify_paths(tmp_path):
    with pytest.raises(ValueError):
        inference.verify_input_path(tmp_path / "missing.wav")
    with pytest.raises(ValueError):
        inference.verify_output_dir(tmp_path / "missing_dir")
    inference.verify_output_dir(tmp_path)


def test_filename_suffix_api():
    """Reference-compatible path-resolution API (`__init__.py:74-95`)."""
    import pathlib

    import pytest as _pytest

    import basic_pitch_tpu as bp

    assert set(bp.FilenameSuffix.__members__) == {"tf", "coreml", "tflite", "onnx"}
    # .value is the part the reference API exposes for path building
    # (reference __init__.py:74-78, 91-92) — must match exactly
    assert {s.name: s.value for s in bp.FilenameSuffix} == {
        "tf": "nmp",
        "coreml": "nmp.mlpackage",
        "tflite": "nmp.tflite",
        "onnx": "nmp.onnx",
    }
    path = bp.build_icassp_2022_model_path(bp.FilenameSuffix.tf)
    assert pathlib.Path(path).exists()
    # the other suffixes resolve to a reference saved_models checkout when one
    # is locatable, else raise a pointer at Model()'s own format readers
    for suffix in (bp.FilenameSuffix.coreml, bp.FilenameSuffix.tflite, bp.FilenameSuffix.onnx):
        try:
            assert pathlib.Path(bp.build_icassp_2022_model_path(suffix)).exists()
        except FileNotFoundError as err:
            assert "Model()" in str(err)
