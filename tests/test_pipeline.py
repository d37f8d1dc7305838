"""Streaming device pipeline vs the reference-semantics inference path."""

import pathlib

import numpy as np
import pytest

from basic_pitch_tpu import constants, inference, pipeline
from basic_pitch_tpu.utils import audio as audio_io

VOCADITO = pathlib.Path("/root/reference/tests/resources/vocadito_10.wav")
needs_clip = pytest.mark.skipif(not VOCADITO.exists(), reason="test clip unavailable")


@pytest.fixture(scope="module")
def transcriber():
    # small chunks so the clip spans multiple chunks
    return pipeline.StreamingTranscriber(windows_per_chunk=4)


@pytest.fixture(scope="module")
def reference_output():
    if not VOCADITO.exists():
        pytest.skip("test clip unavailable")
    return inference.run_inference(VOCADITO, inference.Model())


@needs_clip
def test_22k_path_matches_run_inference(transcriber, reference_output):
    y, _ = audio_io.load_audio(VOCADITO, constants.AUDIO_SAMPLE_RATE)
    out = transcriber.posteriorgrams(y, constants.AUDIO_SAMPLE_RATE)
    for key, ref in reference_output.items():
        assert out[key].shape == ref.shape
        assert float(np.abs(out[key] - ref).max()) < 5e-5, key


@needs_clip
def test_44k_path_close_to_run_inference(transcriber, reference_output):
    raw, sr = audio_io.read_wav(VOCADITO)
    assert sr == 44100
    out = transcriber.posteriorgrams(audio_io.to_mono(raw), sr)
    for key, ref in reference_output.items():
        assert out[key].shape == ref.shape
        # device f32 decimation vs host f64 polyphase: small residual
        assert float(np.abs(out[key] - ref).max()) < 5e-3, key


@needs_clip
def test_transcribe_events_match_predict(transcriber):
    _, _, ref_events = inference.predict(VOCADITO, inference.Model())
    raw, sr = audio_io.read_wav(VOCADITO)
    events = transcriber.transcribe(audio_io.to_mono(raw), sr)
    assert len(events) == len(ref_events)
    matched = 0
    for a, b in zip(sorted(events), sorted(ref_events)):
        if (
            a[2] == b[2]
            and abs(a[0] - b[0]) < 0.05
            and abs(a[1] - b[1]) < 0.05
        ):
            matched += 1
    assert matched >= len(ref_events) - 1  # one borderline onset may shift


def test_synthetic_roundtrip_short():
    """A clean synthetic tone comes back as one note at the right pitch."""
    sr = constants.AUDIO_SAMPLE_RATE
    t = np.arange(int(3.0 * sr)) / sr
    midi = 60
    f0 = 440.0 * 2 ** ((midi - 69) / 12)
    y = np.zeros_like(t, dtype=np.float32)
    seg = slice(int(0.5 * sr), int(2.0 * sr))
    tt = t[seg] - 0.5
    y[seg] = (0.4 * np.exp(-1.5 * tt) * (
        np.sin(2 * np.pi * f0 * tt)
        + 0.5 * np.sin(4 * np.pi * f0 * tt)
        + 0.25 * np.sin(6 * np.pi * f0 * tt)
    )).astype(np.float32)
    tr = pipeline.StreamingTranscriber(windows_per_chunk=2)
    events = tr.transcribe(y, sr)
    assert len(events) >= 1
    best = max(events, key=lambda e: e[1] - e[0])
    assert best[2] == midi
    assert abs(best[0] - 0.5) < 0.15


def test_rejects_unknown_rate(transcriber):
    with pytest.raises(ValueError):
        transcriber.posteriorgrams(np.zeros(1000, np.float32), 48000)
