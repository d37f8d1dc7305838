"""Constant-Q transform front-end, TPU-native.

Implements the multi-rate CQT algorithm (Schoerkhuber & Klapuri 2010 /
Brown & Puckette 1992): complex analysis kernels are built for the top octave
only, and each lower octave is obtained by lowpass-filtering and decimating
the signal by two, halving the frame hop each time. All filterbanks are
precomputed with numpy at build time; the transform itself is a pure jittable
JAX function — a chain of strided 1-D convolutions that XLA maps onto the MXU.

Numerical behavior matches the reference TF port of nnAudio's ``CQT2010v2``
(`/root/reference/basic_pitch/layers/nnaudio.py:390-669`) at the NMP
operating point (sr=22050, hop=256, fmin=27.5 Hz, 309 bins, 36 bins/octave):
reflection padding of n_fft//2 per octave, symmetric (torch-style) padding in
the decimation FIR, L1-normalized Hann kernels, and the librosa-compatible
sqrt(kernel length) renormalization. Early downsampling is a no-op at this
operating point (downsample_count == 0) and is therefore validated against
and omitted from the compute graph.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_LOWPASS_KERNEL_LENGTH = 256
DEFAULT_LOWPASS_TRANSITION_BANDWIDTH = 0.001
HANN_WINDOW_BANDWIDTH = 1.5


def design_lowpass_fir(
    band_center: float = 0.5,
    kernel_length: int = DEFAULT_LOWPASS_KERNEL_LENGTH,
    transition_bandwidth: float = DEFAULT_LOWPASS_TRANSITION_BANDWIDTH,
) -> np.ndarray:
    """Anti-aliasing FIR for decimation-by-two, via frequency sampling.

    Unity gain up to band_center/(1+tb), zero above band_center*(1+tb),
    linear transition between — the same spec the reference hands to
    scipy.signal.firwin2 (`nnaudio.py:45-76`).
    """
    import scipy.signal

    passband_max = band_center / (1 + transition_bandwidth)
    stopband_min = band_center * (1 + transition_bandwidth)
    freqs = [0.0, passband_max, stopband_min, 1.0]
    gains = [1.0, 1.0, 0.0, 0.0]
    return scipy.signal.firwin2(kernel_length, freqs, gains).astype(np.float64)


def _hann_periodic(n: int) -> np.ndarray:
    """Periodic (DFT-even) Hann window of length n (float64 for kernel math)."""
    from basic_pitch_tpu.ops import spectral

    return spectral._hann_periodic(n, np.float64)


def make_cqt_analysis_kernels(
    q: float,
    fs: float,
    fmin: float,
    n_bins: int,
    bins_per_octave: int,
) -> Tuple[np.ndarray, int, np.ndarray, np.ndarray]:
    """Time-domain complex CQT kernels, centered in a power-of-two support.

    Each bin k gets an L1-normalized windowed complex exponential of length
    ceil(q*fs/f_k), zero-padded into ``fft_len`` samples. Matches the kernel
    construction of the 1992 algorithm as used by the reference
    (`nnaudio.py:158-213`).

    Returns:
        (kernels complex128 (n_bins, fft_len), fft_len, lengths, freqs)
    """
    fft_len = int(2 ** np.ceil(np.log2(np.ceil(q * fs / fmin))))
    freqs = fmin * 2.0 ** (np.arange(n_bins) / float(bins_per_octave))
    lengths = np.ceil(q * fs / freqs)

    kernels = np.zeros((n_bins, fft_len), dtype=np.complex128)
    for k, freq in enumerate(freqs):
        length = int(np.ceil(q * fs / freq))
        # center the kernel; odd lengths sit one sample left of center
        start = int(np.ceil(fft_len / 2.0 - length / 2.0)) - (length % 2)
        # support indices [-ceil(l/2), floor(l/2)), i.e. arange(l) - ceil(l/2)
        n_idx = np.arange(length) - (length + 1) // 2
        sig = _hann_periodic(length) * np.exp(1j * 2.0 * np.pi * freq * n_idx / fs) / length
        sig = sig / np.abs(sig).sum()  # L1 basis norm, librosa-style
        kernels[k, start : start + length] = sig
    return kernels, fft_len, lengths, freqs


@dataclasses.dataclass(frozen=True)
class CQTKernels:
    """Build-time constants for the multi-rate CQT (all host numpy)."""

    sr: int
    hop_length: int
    fmin: float
    n_bins: int
    bins_per_octave: int
    n_octaves: int
    n_fft: int
    # stacked (real; imag) top-octave kernels, shape (2*n_filters, n_fft)
    top_octave_kernels: np.ndarray
    lowpass: np.ndarray  # (kernel_length,)
    length_norm: np.ndarray  # sqrt(ceil(Q*sr/f)) per output bin, (n_bins,)
    n_filters: int

    @property
    def q(self) -> float:
        return 1.0 / (2.0 ** (1.0 / self.bins_per_octave) - 1.0)


def build_cqt_kernels(
    sr: int = 22050,
    hop_length: int = 256,
    fmin: float = 27.5,
    n_bins: int = 309,
    bins_per_octave: int = 36,
    filter_scale: float = 1.0,
) -> CQTKernels:
    """Precompute every filterbank the jitted CQT needs.

    Mirrors the build-time math of the reference layer (`nnaudio.py:506-604`):
    top-octave frequency placement including the remainder-bin adjustment,
    and the early-downsample decision (asserted to be a no-op here).
    """
    q = float(filter_scale) / (2.0 ** (1.0 / bins_per_octave) - 1.0)
    n_filters = min(bins_per_octave, n_bins)
    n_octaves = int(np.ceil(float(n_bins) / bins_per_octave))

    fmin_t = fmin * 2.0 ** (n_octaves - 1)
    remainder = n_bins % bins_per_octave
    if remainder == 0:
        fmax_t = fmin_t * 2.0 ** ((bins_per_octave - 1) / bins_per_octave)
    else:
        fmax_t = fmin_t * 2.0 ** ((remainder - 1) / bins_per_octave)
    fmin_t = fmax_t / 2.0 ** (1.0 - 1.0 / bins_per_octave)
    if fmax_t > sr / 2:
        raise ValueError(f"top CQT bin {fmax_t:.1f} Hz exceeds Nyquist; reduce n_bins")

    # Early-downsample decision (librosa heuristic, `nnaudio.py:84-139`).
    # At the NMP operating point this resolves to zero pre-decimations; the
    # graph below assumes that, so enforce it.
    filter_cutoff = fmax_t * (1 + 0.5 * HANN_WINDOW_BANDWIDTH / q)
    nyquist = sr // 2
    count1 = max(0, int(np.ceil(np.log2(0.85 * nyquist / filter_cutoff)) - 1) - 1)
    count2 = max(0, int(np.ceil(np.log2(hop_length))) - n_octaves + 1)
    if min(count1, count2) != 0:
        raise NotImplementedError(
            "early downsampling required for this CQT geometry; "
            "only geometries with downsample_count == 0 are supported"
        )

    if hop_length % (2 ** (n_octaves - 1)) != 0:
        raise ValueError(
            f"hop_length ({hop_length}) must be divisible by 2**(n_octaves-1) "
            f"({2 ** (n_octaves - 1)}) for the multi-rate cascade"
        )

    basis, n_fft, _, _ = make_cqt_analysis_kernels(q, sr, fmin_t, n_filters, bins_per_octave)

    freqs_all = fmin * 2.0 ** (np.arange(n_bins) / float(bins_per_octave))
    lengths_all = np.ceil(q * sr / freqs_all)

    top = np.concatenate([basis.real, basis.imag], axis=0).astype(np.float32)

    return CQTKernels(
        sr=sr,
        hop_length=hop_length,
        fmin=fmin,
        n_bins=n_bins,
        bins_per_octave=bins_per_octave,
        n_octaves=n_octaves,
        n_fft=n_fft,
        top_octave_kernels=top,
        lowpass=design_lowpass_fir().astype(np.float32),
        length_norm=np.sqrt(lengths_all).astype(np.float32),
        n_filters=n_filters,
    )


# ---------------------------------------------------------------------------
# Matmul-first compute path.
#
# TPU design note: every step below is a static slice/reshape feeding a
# dot_general, never a conv primitive. On TPU, XLA's convolution lowering
# (space-to-batch et al.) was measured to cost ~1e-3 absolute error through
# the 8-stage decimation cascade even at Precision.HIGHEST, while dots honor
# the requested precision exactly. Casting the FIRs as small dense matmuls
# keeps the whole CQT bit-close to the float32 reference AND maps it onto the
# MXU, which is also the fast path.
# ---------------------------------------------------------------------------

_DEC_BLOCK = 128  # output samples per decimation block (= MXU tile edge)


def stride2_toeplitz_matrix(taps: np.ndarray, block: int = _DEC_BLOCK) -> np.ndarray:
    """Block-Toeplitz matrix turning a stride-2 FIR into one matmul.

    With z the left-padded signal, y[n] = sum_k h[k] z[2n+k]. Splitting y
    into blocks of `block` and z into blocks of 2*block, output block i
    depends only on z blocks (i, i+1):

        y[block i + t] = sum_o  seg_i[o] * W[o, t],
        seg_i = z[2 block i : 2 block i + 4 block],
        W[o, t] = h[o - 2 t]  for 0 <= o - 2 t < len(h)

    Shared by the CQT octave cascade (256 taps) and the on-device 44.1->22.05
    decimator (`ops/resample.py`, 257 taps). Returns (4*block, block).
    """
    k = taps.shape[0]
    assert k <= 2 * block + 2, "taps must fit the two-block segment span"
    w = np.zeros((4 * block, block), dtype=np.float64)
    offsets = np.arange(4 * block)[:, None] - 2 * np.arange(block)[None, :]
    valid = (offsets >= 0) & (offsets < k)
    w[valid] = taps[offsets[valid]]
    return w.astype(np.float32)


def stride2_blocked_matmul(z: jnp.ndarray, w: jnp.ndarray, n_blocks: int, precision):
    """Apply a `stride2_toeplitz_matrix` to a prepared (batch, 2*block*(n_blocks+1))
    signal; returns (batch, n_blocks*block) outputs (caller slices to n_out)."""
    batch = z.shape[0]
    block = w.shape[1]
    zb = z.reshape(batch, n_blocks + 1, 2 * block)
    segs = jnp.concatenate([zb[:, :-1], zb[:, 1:]], axis=-1)  # (b, n_blocks, 4*block)
    y = jnp.dot(segs, w, precision=precision, preferred_element_type=jnp.float32)
    return y.reshape(batch, n_blocks * block)


def _decimation_matrix(lowpass: np.ndarray) -> np.ndarray:
    """The CQT cascade's (512, 128) stride-2 matrix (256-tap FIR)."""
    assert lowpass.shape[0] == 2 * _DEC_BLOCK, "decimation matrix assumes 256-tap FIR"
    return stride2_toeplitz_matrix(lowpass, _DEC_BLOCK)


def decimated_length(length: int) -> int:
    """Output length of the symmetric-padded stride-2 FIR: floor(L/2) (even L)
    or (L-1)/2 (odd L) — matches the reference's VALID conv arithmetic."""
    return (length - 2) // 2 + 1


def _decimate_by_2(x: jnp.ndarray, dec_matrix: jnp.ndarray, precision) -> jnp.ndarray:
    """Anti-aliased decimation by two as a single block matmul.

    Semantics match the reference's torch-style symmetric zero padding +
    stride-2 VALID conv (`nnaudio.py:265-284`).

    Args:
        x: (batch, length) signal.
        dec_matrix: (512, 128) from `_decimation_matrix`.

    Returns:
        (batch, decimated_length(length)).
    """
    batch, length = x.shape
    n_out = decimated_length(length)
    n_blocks = -(-n_out // _DEC_BLOCK)
    pad_left = _DEC_BLOCK - 1  # (256 - 1) // 2 = 127
    z_len = 2 * _DEC_BLOCK * (n_blocks + 1)
    z = jnp.pad(x, ((0, 0), (pad_left, z_len - pad_left - length)))
    return stride2_blocked_matmul(z, dec_matrix, n_blocks, precision)[:, :n_out]


def _octave_cqt(
    x: jnp.ndarray, kernel_matrix: jnp.ndarray, n_fft: int, hop: int, n_frames: int, precision
) -> jnp.ndarray:
    """Complex CQT of one octave: reflect-pad, frame, and one matmul.

    Args:
        x: (batch, length) signal at this octave's rate.
        kernel_matrix: (n_fft, 2 * n_filters) — real kernels then imag.

    Returns:
        (batch, n_filters, n_frames, 2) with imag negated (analysis
        convention), matching `get_cqt_complex` (`nnaudio.py:216-256`).
    """
    x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    idx = hop * np.arange(n_frames)[:, None] + np.arange(n_fft)[None, :]
    frames = x[:, idx]  # (b, n_frames, n_fft) — static gather
    both = jnp.dot(frames, kernel_matrix, precision=precision, preferred_element_type=jnp.float32)
    n_filters = kernel_matrix.shape[1] // 2
    real = jnp.transpose(both[..., :n_filters], (0, 2, 1))
    imag = -jnp.transpose(both[..., n_filters:], (0, 2, 1))
    return jnp.stack([real, imag], axis=-1)


def cqt_frame_count(n_samples: int, hop_length: int) -> int:
    """Frames produced for a centered CQT over n_samples: floor(L/hop) + 1."""
    return n_samples // hop_length + 1


def cqt_magnitude(
    kernels: CQTKernels,
    audio: jnp.ndarray,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Jittable magnitude CQT.

    Args:
        kernels: build-time constants from `build_cqt_kernels`.
        audio: (batch, n_samples) float32 at `kernels.sr`.

    Returns:
        (batch, n_frames, n_bins) float32 magnitudes, low bin first —
        the same layout the reference produces (`nnaudio.py:623-661`).
    """
    kernel_matrix = jnp.asarray(kernels.top_octave_kernels.T)  # (n_fft, 72)
    dec_matrix = jnp.asarray(_decimation_matrix(kernels.lowpass.astype(np.float64)))
    n_frames = cqt_frame_count(audio.shape[-1], kernels.hop_length)

    octaves = []  # index 0 = top octave
    hop = kernels.hop_length
    x_down = audio
    for octave in range(kernels.n_octaves):
        if octave > 0:
            hop //= 2
            x_down = _decimate_by_2(x_down, dec_matrix, precision)
        octaves.append(
            _octave_cqt(x_down, kernel_matrix, kernels.n_fft, hop, n_frames, precision)
        )

    # low octave first, then crop to the requested bin count from the top
    full = jnp.concatenate(octaves[::-1], axis=1)
    full = full[:, -kernels.n_bins :]

    full = full * jnp.asarray(kernels.length_norm)[None, :, None, None]
    mag = jnp.sqrt(jnp.sum(jnp.square(full), axis=-1))
    return jnp.transpose(mag, (0, 2, 1))
