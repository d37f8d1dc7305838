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


# ---------------------------------------------------------------------------
# Early-downsample geometries: independent numpy/scipy oracle
# ---------------------------------------------------------------------------


def _oracle_cqt2010v2(audio, sr, hop, fmin, n_bins, bpo):
    """Direct (unblocked, float64) implementation of the CQT2010v2 algorithm
    including its early-downsample path (`nnaudio.py:84-139,623-661`): naive
    strided FIRs via scipy, explicit frame/dot per octave. Serves as the
    oracle for the block-Toeplitz matmul formulation."""
    import scipy.signal

    q = 1.0 / (2.0 ** (1.0 / bpo) - 1.0)
    n_filters = min(bpo, n_bins)
    n_oct = int(np.ceil(n_bins / bpo))
    fmin_t = fmin * 2.0 ** (n_oct - 1)
    rem = n_bins % bpo
    fmax_t = fmin_t * 2.0 ** (((bpo if rem == 0 else rem) - 1) / bpo)
    fmin_t = fmax_t / 2.0 ** (1.0 - 1.0 / bpo)

    cutoff = fmax_t * (1 + 0.5 * 1.5 / q)
    c1 = max(0, int(np.ceil(np.log2(0.85 * (sr // 2) / cutoff)) - 1) - 1)
    c2 = max(0, int(np.ceil(np.log2(hop))) - n_oct + 1)
    factor = 2 ** min(c1, c2)

    def fir(band_center):
        tb = 0.001
        return scipy.signal.firwin2(
            256,
            [0.0, band_center / (1 + tb), band_center * (1 + tb), 1.0],
            [1.0, 1.0, 0.0, 0.0],
        )

    def decim(x, taps, n):
        z = np.pad(x, (127, 127))
        n_out = (len(x) - 2) // n + 1
        return np.array([z[n * i : n * i + 256] @ taps for i in range(n_out)])

    audio = audio.astype(np.float64)
    if factor > 1:
        audio = decim(audio, fir(1.0 / factor), factor)
        sr = sr / factor
        hop //= factor

    n_fft = int(2 ** np.ceil(np.log2(np.ceil(q * sr / fmin_t))))
    freqs_t = fmin_t * 2.0 ** (np.arange(n_filters) / bpo)
    kern = np.zeros((n_filters, n_fft), complex)
    for k, f in enumerate(freqs_t):
        length = int(np.ceil(q * sr / f))
        start = int(np.ceil(n_fft / 2.0 - length / 2.0)) - (length % 2)
        idx = np.arange(length) - (length + 1) // 2
        win = scipy.signal.get_window("hann", length, fftbins=True)
        s = win * np.exp(1j * 2.0 * np.pi * f * idx / sr) / length
        kern[k, start : start + length] = s / np.abs(s).sum()

    n_frames = len(audio) // hop + 1

    def octave(x, h):
        xx = np.pad(x, (n_fft // 2, n_fft // 2), mode="reflect")
        frames = np.stack([xx[h * i : h * i + n_fft] for i in range(n_frames)])
        return frames @ kern.T  # (n_frames, n_filters) complex

    half = fir(0.5)
    outs = []
    x, h = audio, hop
    for o in range(n_oct):
        if o > 0:
            h //= 2
            x = decim(x, half, 2)
        outs.append(octave(x, h))
    full = np.concatenate(outs[::-1], axis=1)[:, -n_bins:]

    freqs_all = fmin * 2.0 ** (np.arange(n_bins) / bpo)
    lengths = np.ceil(q * sr / freqs_all)
    return np.abs(full) * factor * np.sqrt(lengths)[None, :]


@pytest.mark.parametrize(
    "sr,hop,fmin,n_bins,bpo,expected_factor",
    [
        (22050, 512, 32.70, 48, 24, 32),  # two octaves far below Nyquist
        (16000, 512, 27.5, 72, 36, 16),  # the VERDICT's example geometry
    ],
)
def test_early_downsample_geometry_matches_oracle(sr, hop, fmin, n_bins, bpo, expected_factor):
    """Geometries that need the early-downsample chain build and match a
    direct scipy/numpy implementation of the same algorithm."""
    kernels = cqt_ops.build_cqt_kernels(
        sr=sr, hop_length=hop, fmin=fmin, n_bins=n_bins, bins_per_octave=bpo
    )
    assert kernels.downsample_factor == expected_factor
    assert kernels.early_lowpass is not None

    rng = np.random.RandomState(7)
    audio = rng.randn(8192).astype(np.float32) * 0.2
    mine = jax.jit(lambda a: cqt_ops.cqt_magnitude(kernels, a))(jnp.asarray(audio[None]))
    oracle = _oracle_cqt2010v2(audio, sr, hop, fmin, n_bins, bpo)
    assert np.asarray(mine).shape == (1,) + oracle.shape
    np.testing.assert_allclose(np.asarray(mine)[0], oracle, atol=5e-6, rtol=0)


def test_nmp_geometry_has_no_early_downsample(kernels):
    # the NMP operating point must keep bypassing the pre-decimation
    assert kernels.downsample_factor == 1
    assert kernels.early_lowpass is None
