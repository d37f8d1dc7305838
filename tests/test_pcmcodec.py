"""Lossless PCM transport codec: wire format, exactness, pipeline parity.

The codec (ops/pcmcodec.py + native pack_pcm16_residual) must be BIT-EXACT:
the device-reconstructed float32 samples have to equal pcm/32768 exactly,
or transcription output would silently diverge from the raw-int16 path.
"""

import numpy as np
import pytest

from basic_pitch_tpu.ops import pcmcodec


def _signals():
    rng = np.random.RandomState(7)
    sine = (np.sin(np.arange(60000) * 0.07) * 18000).astype(np.int16)
    return {
        "random": (rng.randn(50000) * 4000).clip(-32768, 32767).astype(np.int16),
        "extremes": np.tile(np.array([-32768, 32767, 0, -1], np.int16), 300),
        "silence": np.zeros(4096, np.int16),
        "sine": sine,
        "mixed": np.concatenate([np.zeros(1000, np.int16), sine[:3000],
                                 (rng.randn(2000) * 30000).clip(-32768, 32767).astype(np.int16)]),
        "tiny": np.array([5], np.int16),
        "exact_blocks": (rng.randn(256 * 3) * 900).astype(np.int16),
    }


@pytest.mark.parametrize("name", list(_signals()))
def test_roundtrip_bit_exact(name):
    pcm = _signals()[name]
    out = np.asarray(pcmcodec.encode_decode(pcm))
    np.testing.assert_array_equal(out, pcm.astype(np.float32) / 32768.0)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_numpy_and_native_packers_agree(order):
    if not pcmcodec.available():
        pytest.skip("native packer unavailable")
    for name, pcm in _signals().items():
        padded = np.pad(pcm, (0, (-len(pcm)) % pcmcodec.BLOCK))
        w_n, t_n, c_n, i_n, h_n = pcmcodec._native_pack(
            np.ascontiguousarray(padded), order
        )
        w_p, t_p, c_p, i_p, h_p = pcmcodec.pack_numpy(padded, order)
        assert t_n == t_p, name
        np.testing.assert_array_equal(w_n[:t_n], w_p[:t_p], err_msg=name)
        np.testing.assert_array_equal(c_n, c_p, err_msg=name)
        np.testing.assert_array_equal(i_n, i_p, err_msg=name)
        np.testing.assert_array_equal(h_n, h_p, err_msg=name)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_roundtrip_bit_exact_forced_order(order):
    for name, pcm in _signals().items():
        out = np.asarray(pcmcodec.decode_to_device(pcmcodec.pack(pcm, order)))
        np.testing.assert_array_equal(
            out, pcm.astype(np.float32) / 32768.0, err_msg=f"{name} order={order}"
        )


def test_order_choosers_agree():
    if not pcmcodec.available():
        pytest.skip("native packer unavailable")
    for name, pcm in _signals().items():
        padded = np.ascontiguousarray(np.pad(pcm, (0, (-len(pcm)) % pcmcodec.BLOCK)))
        assert pcmcodec._native_choose_order(padded) == pcmcodec.choose_order_numpy(
            padded
        ), name


def test_short_sparse_piece_does_not_expand():
    """Regression: the sparse-group merge must not cascade an all-sparse
    short piece to the widest ladder width — a 0.5 s quiet clip has to
    pack SMALLER than raw int16, not 19 bits/sample."""
    t = np.arange(12000) / 22050.0
    pcm = (np.sin(2 * np.pi * 220.0 * t) * 500).astype(np.int16)  # ~quiet tone
    packed = pcmcodec.pack(pcm)
    assert packed.packed_bytes < pcm.nbytes, (packed.packed_bytes, pcm.nbytes)
    out = np.asarray(pcmcodec.decode_to_device(packed))
    np.testing.assert_array_equal(out, pcm.astype(np.float32) / 32768.0)


def test_pack_rejects_bad_order():
    with pytest.raises(ValueError, match="order"):
        pcmcodec.pack(np.zeros(512, np.int16), order=4)


def test_numpy_fallback_roundtrip(monkeypatch):
    monkeypatch.setattr(pcmcodec, "_native_pack", lambda pcm, order: None)
    monkeypatch.setattr(pcmcodec, "_native_choose_order", lambda pcm: None)
    pcm = _signals()["mixed"]
    out = np.asarray(pcmcodec.encode_decode(pcm))
    np.testing.assert_array_equal(out, pcm.astype(np.float32) / 32768.0)


def test_compresses_real_music():
    import pathlib

    clip = pathlib.Path("/root/reference/tests/resources/vocadito_10.wav")
    if not clip.exists():
        pytest.skip("reference clip not present")
    from basic_pitch_tpu.utils import audio as audio_io

    samples, sr = audio_io.read_wav(str(clip))
    pcm = np.clip(np.round(audio_io.to_mono(samples) * 32768.0), -32768, 32767).astype(np.int16)
    packed = pcmcodec.pack(pcm)
    assert packed.packed_bytes < 0.85 * pcm.nbytes  # ~1.4x on real vocals
    out = np.asarray(pcmcodec.decode_to_device(packed, len(pcm)))
    np.testing.assert_array_equal(out, pcm.astype(np.float32) / 32768.0)


def test_pipeline_codec_path_matches_raw_44k(monkeypatch):
    """44.1 kHz int16 input: codec-packed pieces must decode to the exact
    samples the on-device decimator would have seen from raw transport."""
    from basic_pitch_tpu import constants, pipeline

    rng = np.random.RandomState(11)
    sr = 2 * constants.AUDIO_SAMPLE_RATE
    n = int(3.2 * sr)
    t = np.arange(n) / sr
    y = (0.5 * np.sin(2 * np.pi * 196.0 * t) * (t < 1.5)).astype(np.float32)
    y += rng.randn(n).astype(np.float32) * 0.002
    pcm = np.clip(np.round(y * 32768.0), -32768, 32767).astype(np.int16)

    tr = pipeline.StreamingTranscriber(windows_per_chunk=8)
    monkeypatch.setattr(pcmcodec, "available", lambda: False)
    ev_raw = tr.transcribe(pcm, sr)
    monkeypatch.undo()
    if not pcmcodec.available():
        pytest.skip("native packer unavailable")
    ev_codec = tr.transcribe(pcm, sr)
    assert ev_codec == ev_raw
    assert len(ev_raw) >= 1


def test_pipeline_codec_path_matches_raw_int16_path(monkeypatch):
    """transcribe() must yield identical events with the codec on and off."""
    from basic_pitch_tpu import constants, pipeline

    rng = np.random.RandomState(3)
    n = int(4.5 * constants.AUDIO_SAMPLE_RATE)
    t = np.arange(n) / constants.AUDIO_SAMPLE_RATE
    y = np.zeros(n, np.float32)
    for f0, s in ((220.0, 0.0), (330.0, 1.5), (262.0, 3.0)):
        seg = (t >= s) & (t < s + 1.2)
        y[seg] += 0.4 * np.sin(2 * np.pi * f0 * t[seg])
    y += rng.randn(n).astype(np.float32) * 0.003
    pcm = np.clip(np.round(y * 32768.0), -32768, 32767).astype(np.int16)

    tr = pipeline.StreamingTranscriber(windows_per_chunk=8)
    monkeypatch.setattr(pcmcodec, "available", lambda: False)
    ev_raw = tr.transcribe(pcm, constants.AUDIO_SAMPLE_RATE)
    monkeypatch.undo()
    if not pcmcodec.available():
        pytest.skip("native packer unavailable")
    ev_codec = tr.transcribe(pcm, constants.AUDIO_SAMPLE_RATE)
    assert ev_codec == ev_raw
    assert len(ev_raw) >= 3
