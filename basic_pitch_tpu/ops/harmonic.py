"""Harmonic stacking: align harmonics of a CQT as channels.

For each harmonic h, the CQT is shifted along the frequency axis by
round(bins_per_octave * log2(h)) bins so that the h-th harmonic of every
fundamental lands on that fundamental's bin, then the shifted copies are
stacked as channels and cropped to the output bin count. Semantics match the
reference layer (`/root/reference/basic_pitch/nn.py:28-88`), but here the
shifts are precomputed and the whole stack is a single static-slice + pad —
no per-call control flow, fully fusible by XLA.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

SEMITONES_PER_OCTAVE = 12


def harmonic_shifts(bins_per_semitone: int, harmonics: Sequence[float]) -> Tuple[int, ...]:
    """Frequency-bin shift per harmonic: round(B * log2(h)), B bins/octave."""
    bins_per_octave = SEMITONES_PER_OCTAVE * bins_per_semitone
    # np.round matches tf.math.round (banker's rounding at exact halves)
    return tuple(int(np.round(bins_per_octave * np.log2(h))) for h in harmonics)


def harmonic_stack(
    x: jnp.ndarray,
    bins_per_semitone: int,
    harmonics: Sequence[float],
    n_output_freqs: int,
) -> jnp.ndarray:
    """Stack harmonically shifted copies of a spectrogram as channels.

    Args:
        x: (batch, n_times, n_freqs, 1); n_freqs should comfortably exceed
            n_output_freqs so upper-harmonic information is retained.

    Returns:
        (batch, n_times, n_output_freqs, len(harmonics)).
    """
    if x.ndim != 4:
        raise ValueError(f"expected rank-4 input (b, t, f, 1), got shape {x.shape}")
    n_freqs = x.shape[2]
    channels = []
    for shift in harmonic_shifts(bins_per_semitone, harmonics):
        if shift == 0:
            shifted = x
        elif shift > 0:
            shifted = jnp.pad(x[:, :, shift:, :], ((0, 0), (0, 0), (0, shift), (0, 0)))
        else:
            shifted = jnp.pad(x[:, :, :shift, :], ((0, 0), (0, 0), (-shift, 0), (0, 0)))
        channels.append(shifted)
    stacked = jnp.concatenate(channels, axis=-1)
    return stacked[:, :, :n_output_freqs, :]
