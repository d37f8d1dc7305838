"""Spectral utility ops: dB normalization and librosa-compatible STFT.

JAX counterparts of the reference's utility layers
(`/root/reference/basic_pitch/layers/signal.py`, `layers/math.py`), written
as pure functions. Everything here is shape-static and jit/vmap-friendly.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def log_base_b(x: jnp.ndarray, base: float) -> jnp.ndarray:
    """log_b(x) computed as a ratio of natural logs (`layers/math.py:21`)."""
    return jnp.log(x) / jnp.log(jnp.asarray(base, dtype=x.dtype))


def normalized_log(magnitude: jnp.ndarray) -> jnp.ndarray:
    """Rescale a magnitude spectrogram to per-example dB in [0, 1].

    magnitude -> power -> 10*log10(power + 1e-10), then shift each example by
    its min and divide by its max (0 where the max is 0). Matches
    `NormalizedLog` (`layers/signal.py:154-185`).

    Args:
        magnitude: (batch, time, freq).

    Returns:
        (batch, time, freq) in [0, 1].
    """
    power = jnp.square(magnitude)
    log_power = 10.0 * log_base_b(power + 1e-10, 10.0)

    log_power_min = jnp.min(log_power, axis=(1, 2), keepdims=True)
    offset = log_power - log_power_min
    offset_max = jnp.max(offset, axis=(1, 2), keepdims=True)
    return jnp.where(offset_max > 0.0, offset / offset_max, 0.0)


def _hann_periodic(n: int, dtype=np.float32) -> np.ndarray:
    """Periodic (DFT-even) Hann window — shared with the CQT kernel builder
    (`ops/cqt.py`), which needs it at float64."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(dtype)


def stft(
    signal: jnp.ndarray,
    fft_length: int = 2048,
    hop_length: Optional[int] = None,
    window_length: Optional[int] = None,
    window_fn: Callable[[int], np.ndarray] = _hann_periodic,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """Librosa-compatible centered STFT.

    When window_length < fft_length, the window is zero-padded so it is
    centered within the FFT frame — the same trick the reference uses to
    match librosa (`layers/signal.py:65-88`).

    Args:
        signal: (batch, n_samples) real.

    Returns:
        (batch, n_frames, fft_length // 2 + 1) complex64.
    """
    window_length = window_length or fft_length
    hop_length = hop_length or window_length // 4

    window = np.asarray(window_fn(window_length), dtype=np.float32)
    if window_length < fft_length:
        lpad = (fft_length - window_length) // 2
        window = np.pad(window, (lpad, fft_length - window_length - lpad))

    if center:
        signal = jnp.pad(
            signal, ((0, 0), (fft_length // 2, fft_length // 2)), mode=pad_mode
        )

    n_frames = 1 + (signal.shape[-1] - fft_length) // hop_length
    idx = np.arange(fft_length)[None, :] + hop_length * np.arange(n_frames)[:, None]
    frames = signal[:, idx]  # (batch, n_frames, fft_length)
    return jnp.fft.rfft(frames * jnp.asarray(window), n=fft_length, axis=-1)


def spectrogram(
    signal: jnp.ndarray, power: float = 2.0, **stft_kwargs: object
) -> jnp.ndarray:
    """|STFT|**power (`layers/signal.py:116-151`)."""
    return jnp.abs(stft(signal, **stft_kwargs)) ** power
