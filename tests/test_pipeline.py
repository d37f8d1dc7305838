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


@needs_clip
def test_decode_config_sweep_matches_host(transcriber):
    """Off-default operating points: the fused device decode must produce
    events identical to the pinned host decoder for every configuration —
    threshold extremes, no-melodia, frequency constraints, long min-note
    (CI-scale version of tools/measure_f1.py's corpus sweep; reference
    analogue `tests/test_inference.py:105-161`)."""
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))
    import measure_f1

    y, _ = audio_io.load_audio(VOCADITO, constants.AUDIO_SAMPLE_RATE)
    # add broadband noise so borderline activations stress the thresholds
    rng = np.random.RandomState(5)
    noisy = np.clip(y + rng.randn(len(y)).astype(np.float32) * 0.02, -1, 1)

    post = transcriber.posteriorgrams(noisy, constants.AUDIO_SAMPLE_RATE)
    checked = 0
    for cfg in measure_f1.SWEEP_CONFIGS:
        kwargs = {k: v for k, v in cfg.items() if k != "name"}
        dev_ev = transcriber.transcribe(noisy, constants.AUDIO_SAMPLE_RATE, **kwargs)
        host_ev = measure_f1.host_events_from_posteriorgrams(post, **kwargs)
        ok, reason = measure_f1.events_identical(host_ev, dev_ev)
        assert ok, f"{cfg['name']}: {reason}"
        checked += 1
        if cfg["name"] == "freq_110_880":
            assert all(110.0 <= 440.0 * 2 ** ((p - 69) / 12) <= 881.0 for _, _, p, _, _ in host_ev)
        if cfg["name"] == "no_melodia":
            assert len(host_ev) >= 1
    assert checked == len(measure_f1.SWEEP_CONFIGS)


def test_note_capacity_scales_with_bucket():
    """Decode note capacity grows with the recording's chunk bucket (1 note
    per 8 frames) so hour-scale recordings don't hit the fixed cap and pay
    the expensive overflow fallback; the caller's max_notes is a floor."""
    sr = constants.AUDIO_SAMPLE_RATE
    tr = pipeline.StreamingTranscriber(windows_per_chunk=4)
    y = np.zeros(int(40.0 * sr), np.float32)  # 25 windows at w=4 -> bucket 8
    tr.transcribe(y, sr, max_notes=16)
    # cache key: (include_bends, max_notes, infer_onsets, melodia, bucket)
    keys = list(tr._decode_cache.keys())
    assert len(keys) == 1
    _, max_notes, _, _, bucket = keys[0]
    assert bucket == 8
    assert max_notes == max(16, bucket * 4 * pipeline.FRAMES_PER_WINDOW // 8) == 568


def test_shrink_bucket():
    """Fetch bucket: pow2 from the 1024 floor, clamped to capacity."""
    b = pipeline.StreamingTranscriber._shrink_bucket
    assert b(0, 16384) == 1024
    assert b(28, 16384) == 1024
    assert b(1025, 16384) == 2048
    assert b(16931, 66048) == 32768
    assert b(60000, 66048) == 65536  # barely under capacity still shrinks
    assert b(16000, 16384) == 16384  # no rung below capacity -> full fetch
    assert b(5, 512) == 512  # tiny capacity: floor exceeds it, full fetch


@needs_clip
def test_fetch_shrinks_to_note_bucket(transcriber):
    """Collect fetches count-bucketed slices, not capacity-sized buffers:
    the vocadito clip decodes ~28 notes, so the shrink executable for the
    1024-slot floor bucket must be in the cache after a transcribe."""
    raw, sr = audio_io.read_wav(VOCADITO)
    events = transcriber.transcribe(audio_io.to_mono(raw), sr)
    assert len(events) > 0
    assert (True, 1024) in transcriber._shrink_cache


@needs_clip
def test_overflow_ticket_skips_buffer_fetch(transcriber):
    """An overflowed decode must not fetch (truncated) buffers — _assemble
    falls back to the host decoder and produces the same events."""
    import jax.numpy as jnp

    raw, sr = audio_io.read_wav(VOCADITO)
    y = audio_io.to_mono(raw)
    expected = transcriber.transcribe(y, sr)

    ticket = transcriber._dispatch(y, sr, 0.5, 0.3, 11, None, None, True, True, True, 16384)
    ticket["decoded_dev"] = ticket["decoded_dev"]._replace(overflow=jnp.bool_(True))
    ((decoded, bends, chunk_outs),) = transcriber._fetch_tickets([ticket])
    assert bool(decoded.overflow) and decoded.starts.size == 0 and bends is None
    events = transcriber._assemble(ticket, decoded, bends, chunk_outs)
    assert len(events) == len(expected)
    for a, b in zip(sorted(events), sorted(expected)):
        assert a[2] == b[2] and abs(a[0] - b[0]) < 1e-6 and abs(a[1] - b[1]) < 1e-6


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


@needs_clip
def test_chunk_size_is_semantically_transparent():
    """Events are identical across windows_per_chunk settings — chunking is
    a pure dispatch choice (docs/DESIGN.md 2e sweeps it for speed only)."""
    samples, sr = audio_io.read_wav(VOCADITO)
    y = audio_io.to_mono(samples)
    events_by_w = {
        w: sorted(pipeline.StreamingTranscriber(windows_per_chunk=w).transcribe(y, sr))
        for w in (2, 4, 8)
    }
    base = events_by_w[2]
    for w in (4, 8):
        assert len(events_by_w[w]) == len(base)
        for a, b in zip(base, events_by_w[w]):
            assert a[2] == b[2] and abs(a[0] - b[0]) < 1e-9 and abs(a[1] - b[1]) < 1e-9


@needs_clip
def test_compute_grouping_is_semantically_transparent():
    """compute_group is a pure dispatch-aggregation choice: events are
    identical whether each chunk runs alone or k chunks share one model
    program (tools/dispatch_ab.json measures the 1.24x; this pins the
    exactness contract). Odd chunk counts exercise the remainder path."""
    samples, sr = audio_io.read_wav(VOCADITO)
    y = audio_io.to_mono(samples)
    events_by_k = {
        k: sorted(
            pipeline.StreamingTranscriber(
                windows_per_chunk=2, compute_group=k
            ).transcribe(y, sr)
        )
        for k in (1, 2, 3)
    }
    base = events_by_k[1]
    assert len(base) > 0
    for k in (2, 3):
        assert len(events_by_k[k]) == len(base)
        for a, b in zip(base, events_by_k[k]):
            assert a[2] == b[2] and abs(a[0] - b[0]) < 1e-9 and abs(a[1] - b[1]) < 1e-9
