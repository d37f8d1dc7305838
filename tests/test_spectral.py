"""Spectral utility ops (`ops/spectral.py`): STFT conventions + dB scaling.

Oracle is a naive frame-loop STFT written independently here, so the
vectorized gather + rfft path is pinned against plain definitional code
(reference semantics: `/root/reference/basic_pitch/layers/signal.py`).
"""

import numpy as np

from basic_pitch_tpu.ops import spectral


def _naive_stft(x, fft_length, hop_length, window, center, pad_mode="reflect"):
    if center:
        x = np.pad(x, (fft_length // 2, fft_length // 2), mode=pad_mode)
    n_frames = 1 + (len(x) - fft_length) // hop_length
    out = np.empty((n_frames, fft_length // 2 + 1), np.complex64)
    for i in range(n_frames):
        frame = x[i * hop_length : i * hop_length + fft_length] * window
        out[i] = np.fft.rfft(frame, n=fft_length)
    return out


def test_stft_matches_naive_loop():
    rng = np.random.RandomState(0)
    x = rng.randn(4096).astype(np.float32)
    fft_length, hop = 512, 128
    window = spectral._hann_periodic(fft_length)
    got = np.asarray(spectral.stft(x[None], fft_length, hop))
    want = _naive_stft(x, fft_length, hop, window, center=True)
    assert got.shape == (1, want.shape[0], want.shape[1])
    np.testing.assert_allclose(got[0], want, atol=2e-3)


def test_stft_short_window_centered_in_frame():
    """window_length < fft_length zero-pads the window centrally — the
    reference's librosa-matching trick (`signal.py:65-88`)."""
    rng = np.random.RandomState(1)
    x = rng.randn(2048).astype(np.float32)
    fft_length, window_length, hop = 512, 256, 128
    win = spectral._hann_periodic(window_length)
    lpad = (fft_length - window_length) // 2
    padded_win = np.pad(win, (lpad, fft_length - window_length - lpad))
    got = np.asarray(spectral.stft(x[None], fft_length, hop, window_length))
    want = _naive_stft(x, fft_length, hop, padded_win, center=True)
    np.testing.assert_allclose(got[0], want, atol=2e-3)


def test_stft_pure_tone_peak_bin():
    sr, fft_length = 22050, 2048
    f0 = 10 * sr / fft_length  # exactly bin 10
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    mag = np.abs(np.asarray(spectral.stft(x[None], fft_length)))
    assert int(mag[0].mean(axis=0).argmax()) == 10


def test_spectrogram_is_power_of_magnitude():
    rng = np.random.RandomState(2)
    x = rng.randn(2048).astype(np.float32)
    s = np.asarray(spectral.stft(x[None], 512))
    p = np.asarray(spectral.spectrogram(x[None], power=2.0, fft_length=512))
    np.testing.assert_allclose(p, np.abs(s) ** 2, rtol=1e-4, atol=1e-4)


def test_normalized_log_matches_reference_formula():
    rng = np.random.RandomState(3)
    mag = (rng.rand(2, 40, 30) * 2).astype(np.float32)
    got = np.asarray(spectral.normalized_log(mag))
    power = mag.astype(np.float64) ** 2
    log_power = 10.0 * np.log10(power + 1e-10)
    mn = log_power.min(axis=(1, 2), keepdims=True)
    off = log_power - mn
    mx = off.max(axis=(1, 2), keepdims=True)
    want = np.where(mx > 0, off / mx, 0.0)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert got.min() >= 0.0 and got.max() <= 1.0


def test_normalized_log_all_zero_input():
    z = np.zeros((1, 8, 8), np.float32)
    out = np.asarray(spectral.normalized_log(z))
    assert np.all(out == 0.0)
