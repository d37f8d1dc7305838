"""Harmonic stacking: shifts, shapes, fractional harmonics.

Mirrors the reference's layer tests (`/root/reference/tests/test_nn.py`).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from basic_pitch_tpu.ops.harmonic import harmonic_shifts, harmonic_stack


def test_shift_values():
    # 3 bins/semitone -> 36 bins/octave
    assert harmonic_shifts(3, [0.5]) == (-36,)
    assert harmonic_shifts(3, [1]) == (0,)
    assert harmonic_shifts(3, [2]) == (36,)
    assert harmonic_shifts(3, [3]) == (57,)  # round(36 * log2(3))
    assert harmonic_shifts(3, [0.5, 1, 2, 3, 4, 5, 6, 7]) == (-36, 0, 36, 57, 72, 84, 93, 101)


def test_output_shape():
    x = jnp.zeros((2, 172, 309, 1))
    out = harmonic_stack(x, 3, [0.5, 1, 2, 3, 4, 5, 6, 7], 264)
    assert out.shape == (2, 172, 264, 8)


def test_fractional_harmonic_shifts_down():
    """Harmonic 0.5 shifts content UP by 36 bins (reads from lower bins)."""
    x = np.zeros((1, 4, 100, 1), np.float32)
    x[0, :, 40, 0] = 1.0
    out = np.asarray(harmonic_stack(jnp.asarray(x), 3, [0.5, 1, 2], 80))
    assert out[0, 0, 40, 1] == 1.0  # h=1: unshifted
    assert out[0, 0, 76, 0] == 1.0  # h=0.5: bin 40 appears at 40 + 36
    assert out[0, 0, 4, 2] == 1.0  # h=2: bin 40 appears at 40 - 36


def test_crop_to_output_freqs():
    x = jnp.ones((1, 3, 100, 1))
    out = harmonic_stack(x, 1, [1], 60)
    assert out.shape == (1, 3, 60, 1)


def test_zero_padding_beyond_source():
    x = jnp.ones((1, 2, 50, 1))
    out = np.asarray(harmonic_stack(x, 1, [2], 50))  # shift 12 bins down
    assert out[0, 0, 37, 0] == 1.0
    assert np.all(out[0, 0, 38:, 0] == 0.0)  # shifted-past-source is zero


def test_rank_check():
    with pytest.raises(ValueError):
        harmonic_stack(jnp.zeros((3, 100, 1)), 1, [1], 50)
