"""On-device sample-rate conversion.

The hot ingestion path ships raw decoded audio to the device and converts it
to the model rate there, so the host never touches per-sample DSP. The
decimator is the same block-Toeplitz matmul trick as the CQT's octave
cascade (`basic_pitch_tpu.ops.cqt`): one (512, 128) matrix applied to
half-overlapping 512-sample segments — pure MXU work.

Semantics match ``scipy.signal.resample_poly(x, 1, 2, window=taps)`` with the
framework's Kaiser prototype (`basic_pitch_tpu.utils.audio.resample`): zero
phase (group delay compensated), ceil(n/2) output length.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BLOCK = 128
KAISER_BETA = 14.77
N_TAPS = 257  # odd, symmetric, centered


@functools.lru_cache(maxsize=None)
def decimate2_taps() -> np.ndarray:
    """257-tap Kaiser-windowed halfband lowpass (cutoff at the new Nyquist)."""
    from scipy.signal import firwin

    return firwin(N_TAPS, 0.5, window=("kaiser", KAISER_BETA)).astype(np.float64)


@functools.lru_cache(maxsize=None)
def _decimate2_matrix() -> np.ndarray:
    """(512, 128) block matrix: y[128 i + t] = sum_j h[j] z[256 i + 2 t + j]
    with z = x padded by (N_TAPS-1)//2 = 128 zeros on the left. Built by the
    shared `cqt.stride2_toeplitz_matrix` (same construction as the CQT's
    octave cascade)."""
    from basic_pitch_tpu.ops import cqt

    return cqt.stride2_toeplitz_matrix(decimate2_taps(), _BLOCK)


def decimate2_output_length(n: int) -> int:
    """resample_poly's output-length convention: ceil(n / 2)."""
    return -(-n // 2)


def decimate2(
    x: jnp.ndarray,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
    halo: bool = False,
    n_out: int = None,
) -> jnp.ndarray:
    """Anti-aliased decimation by two of (batch, n) or (n,) audio.

    Without ``halo``, returns float32 audio of length ceil(n / 2) at half the
    input rate, phase-aligned with the input (output sample k corresponds to
    input sample 2k).

    With ``halo=True``, the input is treated as already carrying the filter's
    128-sample left context: output sample t is sum_j h[j] x[2t + j]. Used by
    the chunked streaming pipeline, where the host hands each chunk its halo
    so chunk boundaries are seamless. ``n_out`` then sets the output length.
    """
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    batch, length = x.shape
    if halo:
        assert n_out is not None, "halo mode requires explicit n_out"
        pad_left = 0
    else:
        n_out = decimate2_output_length(length) if n_out is None else n_out
        pad_left = (N_TAPS - 1) // 2  # 128
    from basic_pitch_tpu.ops import cqt

    n_blocks = -(-n_out // _BLOCK)
    z_len = 2 * _BLOCK * (n_blocks + 1)
    z = jnp.pad(x, ((0, 0), (pad_left, max(0, z_len - pad_left - length))))[:, :z_len]
    y = cqt.stride2_blocked_matmul(
        z, jnp.asarray(_decimate2_matrix()), n_blocks, precision
    )[:, :n_out]
    return y[0] if squeeze else y
