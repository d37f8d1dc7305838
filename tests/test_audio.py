"""Host audio I/O: WAV codec round trips, mixdown, resampling."""

import numpy as np
import pytest

from basic_pitch_tpu.utils import audio as audio_io


def test_wav_roundtrip_pcm16(tmp_path):
    rng = np.random.RandomState(0)
    x = (rng.rand(1000, 2).astype(np.float32) - 0.5) * 0.9
    path = tmp_path / "t.wav"
    audio_io.write_wav(path, x, 8000)
    y, sr = audio_io.read_wav(path)
    assert sr == 8000
    assert y.shape == (1000, 2)
    np.testing.assert_allclose(y, x, atol=0.51 / 32768)


def test_read_24bit(tmp_path):
    import struct

    x = np.array([0.0, 0.5, -0.5, 0.999], dtype=np.float64)
    pcm = np.round(x * (1 << 23)).astype(np.int64)
    payload = b"".join(struct.pack("<i", int(v))[:3] for v in pcm)
    path = tmp_path / "t24.wav"
    with open(path, "wb") as fh:
        fh.write(b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE")
        fh.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 44100, 44100 * 3, 3, 24))
        fh.write(b"data" + struct.pack("<I", len(payload)) + payload)
    y, sr = audio_io.read_wav(path)
    np.testing.assert_allclose(y[:, 0], x, atol=2e-7)


def test_read_float32(tmp_path):
    import struct

    x = np.array([0.25, -0.75, 1.25], dtype=np.float32)  # float wavs can exceed 1
    payload = x.tobytes()
    path = tmp_path / "f32.wav"
    with open(path, "wb") as fh:
        fh.write(b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE")
        fh.write(b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 22050, 22050 * 4, 4, 32))
        fh.write(b"data" + struct.pack("<I", len(payload)) + payload)
    y, _ = audio_io.read_wav(path)
    np.testing.assert_allclose(y[:, 0], x)


def test_to_mono():
    x = np.stack([np.ones(10), np.zeros(10)], axis=1).astype(np.float32)
    m = audio_io.to_mono(x)
    np.testing.assert_allclose(m, 0.5)


def test_resample_preserves_tone():
    """A 1 kHz tone resampled 44100 -> 22050 keeps frequency and amplitude."""
    sr_in, sr_out = 44100, 22050
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    y = audio_io.resample(x, sr_in, sr_out)
    assert len(y) == sr_out
    # measure via FFT peak
    spec = np.abs(np.fft.rfft(y[1000:21000] * np.hanning(20000)))
    peak_hz = spec.argmax() * sr_out / 20000
    assert abs(peak_hz - 1000) < 2
    assert 0.95 < np.abs(y[2000:-2000]).max() < 1.01


def test_resample_identity():
    x = np.random.RandomState(0).randn(500).astype(np.float32)
    np.testing.assert_array_equal(audio_io.resample(x, 22050, 22050), x)


def test_resample_unity_gain_all_ratios():
    """Regression: scipy multiplies an array window by `up` itself; passing
    taps*up double-applied the interpolation gain (48k->22.05k came out
    147x too loud)."""
    for sr_in, sr_out in [(48000, 22050), (32000, 22050), (22050, 44100), (16000, 22050)]:
        t = np.arange(sr_in) / sr_in
        x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
        y = audio_io.resample(x, sr_in, sr_out)
        assert 0.9 < np.abs(y).max() < 1.1, (sr_in, sr_out, np.abs(y).max())


def test_resample_length_convention():
    # ceil(n * out/in), the convention the reference's loader follows
    x = np.zeros(200607 * 2 + 1, dtype=np.float32)
    y = audio_io.resample(x, 44100, 22050)
    assert len(y) == int(np.ceil(len(x) / 2))


def test_bad_wav_raises(tmp_path):
    path = tmp_path / "bad.wav"
    path.write_bytes(b"not a wav file at all")
    with pytest.raises(audio_io.WavFormatError):
        audio_io.read_wav(path)


def test_load_audio_non_wav_clear_error_without_ffmpeg(tmp_path, monkeypatch):
    fake = tmp_path / "song.mp3"
    fake.write_bytes(b"\xff\xfb\x90\x00" + b"\x00" * 64)  # mp3-ish header
    monkeypatch.setattr(audio_io.shutil, "which", lambda name: None)
    with pytest.raises(audio_io.WavFormatError, match="ffmpeg"):
        audio_io.load_audio(fake, 22050)


def test_load_audio_unsupported_wav_codec_falls_back(tmp_path, monkeypatch):
    """A RIFF/WAVE container with a codec the native reader can't parse
    (mu-law, ADPCM...) must route to the ffmpeg fallback, not abort —
    the reference's librosa/audioread path decodes such WAVs fine."""
    import struct

    # minimal mu-law (format tag 7) WAV: valid RIFF structure, codec we skip
    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
    data = b"\x7f" * 64
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    path = tmp_path / "ulaw.wav"
    path.write_bytes(b"RIFF" + struct.pack("<I", len(body)) + body)

    called = {}

    def fake_ffmpeg(p):
        called["path"] = p
        return np.zeros(100, dtype=np.float32), 8000

    monkeypatch.setattr(audio_io, "decode_with_ffmpeg", fake_ffmpeg)
    y, sr = audio_io.load_audio(path, 22050)
    assert called["path"] == path
    assert sr == 22050


@pytest.mark.skipif(not audio_io.ffmpeg_available(), reason="ffmpeg not installed")
def test_load_audio_flac_via_ffmpeg(tmp_path):
    sr = 22050
    t = np.arange(sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    wav = tmp_path / "tone.wav"
    audio_io.write_wav(wav, tone, sr)
    flac = tmp_path / "tone.flac"
    import subprocess

    subprocess.run(
        ["ffmpeg", "-y", "-loglevel", "error", "-i", str(wav), str(flac)], check=True
    )
    y, out_sr = audio_io.load_audio(flac, sr)
    assert out_sr == sr
    assert abs(len(y) - len(tone)) <= 2
    # flac is lossless: same tone back
    n = min(len(y), len(tone))
    assert np.max(np.abs(y[:n] - tone[:n])) < 1e-3


def test_stereo_pcm24_wav_full_predict(tmp_path):
    """A stereo 24-bit WAV at 48 kHz exercises the 24-bit decoder, channel
    mixdown, AND the non-standard-rate resampler through the full predict
    path (the reference accepts such files via librosa)."""
    import struct

    import jax

    jax.config.update("jax_platforms", "cpu")
    from basic_pitch_tpu import inference

    sr = 48000
    t = np.arange(int(1.5 * sr)) / sr
    left = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    right = 0.5 * np.sin(2 * np.pi * 440.0 * t + 0.2)
    stereo = np.stack([left, right], axis=1)
    pcm = np.clip(np.round(stereo * (1 << 23)), -(1 << 23), (1 << 23) - 1).astype(np.int32)
    payload = b"".join(
        struct.pack("<i", v)[:3] for v in pcm.reshape(-1)
    )
    path = tmp_path / "stereo24.wav"
    n_channels, bits = 2, 24
    byte_rate = sr * n_channels * bits // 8
    block_align = n_channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, n_channels, sr, byte_rate, block_align, bits)
    with open(path, "wb") as fh:
        fh.write(b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE")
        fh.write(b"fmt " + struct.pack("<I", len(fmt)) + fmt)
        fh.write(b"data" + struct.pack("<I", len(payload)) + payload)

    # decoder-level check: mono mixdown of a coherent stereo tone
    y, got_sr = audio_io.load_audio(path, 22050)
    assert got_sr == 22050
    assert 0.3 < np.abs(y).max() < 0.7  # in-range, not silent, no gain bug

    out, midi, events = inference.predict(str(path))
    assert len(events) >= 1
    assert all(abs(e[2] - 69) <= 1 for e in events)  # A4 ± quantization
