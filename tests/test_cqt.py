"""CQT front-end: geometry, decimation arithmetic, and golden parity."""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basic_pitch_tpu import constants
from basic_pitch_tpu.ops import cqt as cqt_ops

GOLDENS = pathlib.Path(__file__).parent / "goldens"


@pytest.fixture(scope="module")
def kernels():
    return cqt_ops.build_cqt_kernels()


def test_geometry(kernels):
    assert kernels.n_octaves == 9
    assert kernels.n_fft == 256
    assert kernels.n_filters == 36
    assert kernels.n_bins == 309
    assert kernels.top_octave_kernels.shape == (72, 256)
    assert kernels.lowpass.shape == (256,)
    assert kernels.length_norm.shape == (309,)


def test_frame_count():
    assert cqt_ops.cqt_frame_count(constants.AUDIO_N_SAMPLES, constants.FFT_HOP) == 172


def test_decimated_length_matches_valid_conv():
    # decimated_length must equal the padded VALID conv arithmetic:
    # floor((L + 2*127 - 256) / 2) + 1
    for length in [43844, 21922, 10961, 5480, 2740, 1370, 685, 342, 171, 1000, 999]:
        expected = (length + 2 * 127 - 256) // 2 + 1
        assert cqt_ops.decimated_length(length) == expected


def test_decimation_cascade_lengths(kernels):
    length = constants.AUDIO_N_SAMPLES
    for _ in range(kernels.n_octaves - 1):
        length = cqt_ops.decimated_length(length)
    assert length == 171  # all nine octaves emit exactly 172 frames


def test_decimate_matches_direct_fir(kernels):
    """Block-matmul decimation == naive padded stride-2 FIR."""
    rng = np.random.RandomState(1)
    x = rng.randn(2, 1000).astype(np.float32)
    lowpass = kernels.lowpass.astype(np.float64)
    z = np.pad(x.astype(np.float64), ((0, 0), (127, 127)))
    n_out = cqt_ops.decimated_length(1000)
    naive = np.stack(
        [[z[b, 2 * n : 2 * n + 256] @ lowpass for n in range(n_out)] for b in range(2)]
    )
    dec = jnp.asarray(cqt_ops._decimation_matrix(lowpass))
    mine = cqt_ops._decimate_by_2(jnp.asarray(x), dec, jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(mine), naive, atol=2e-6)


def test_cqt_matches_reference_golden(kernels):
    """Bit-closeness to the reference TF CQT on checked-in golden audio."""
    golden = np.load(GOLDENS / "random_windows.npz")
    mag = jax.jit(lambda a: cqt_ops.cqt_magnitude(kernels, a))(jnp.asarray(golden["audio"]))
    np.testing.assert_allclose(np.asarray(mag), golden["cqt"], atol=2e-6, rtol=0)


def test_unsupported_geometry_raises():
    with pytest.raises(ValueError):
        # hop not divisible by 2**(n_octaves-1)
        cqt_ops.build_cqt_kernels(hop_length=100, n_bins=309)
