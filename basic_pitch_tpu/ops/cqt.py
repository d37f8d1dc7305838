"""Constant-Q transform front-end, TPU-native.

Implements the multi-rate CQT algorithm (Schoerkhuber & Klapuri 2010 /
Brown & Puckette 1992): complex analysis kernels are built for the top octave
only, and each lower octave is obtained by lowpass-filtering and decimating
the signal by two, halving the frame hop each time. All filterbanks are
precomputed with numpy at build time; the transform itself is a pure jittable
JAX function — a chain of strided 1-D convolutions that XLA maps onto the MXU.

Numerical behavior matches the reference TF port of nnAudio's ``CQT2010v2``
(`/root/reference/basic_pitch/layers/nnaudio.py:390-669`): reflection padding
of n_fft//2 per octave, symmetric (torch-style) padding in the decimation FIR,
L1-normalized Hann kernels, and the librosa-compatible sqrt(kernel length)
renormalization. Geometries whose top filter sits far below Nyquist take the
early-downsample path (`nnaudio.py:84-139`): a single stride-2^k anti-alias
FIR pre-decimates the signal, the kernel bank is built at the reduced rate,
and the final CQT is rescaled by the downsample factor — here expressed as
one more block-Toeplitz matmul (the same machinery as the per-octave
decimators), so the whole transform stays a chain of MXU dots. At the NMP
operating point (sr=22050, hop=256, fmin=27.5 Hz, 309 bins, 36 bins/octave)
the early-downsample count resolves to zero and the chain is skipped.

Trainable filterbanks (`nnaudio.py:602-604`): `cqt_magnitude` accepts an
optional kernel-matrix override so the top-octave bank can live in the model
parameter pytree and receive gradients (see `models/nmp.py` `trainable_cqt`).
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
    """Build-time constants for the multi-rate CQT (all host numpy).

    ``sr``/``hop_length`` are the *input* geometry; when ``downsample_factor``
    > 1 the kernel bank and cascade operate at ``sr / downsample_factor`` with
    hop ``hop_length // downsample_factor`` (the reference reassigns
    sample_rate/hop_length in-place, `nnaudio.py:563-571`).
    """

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
    length_norm: np.ndarray  # sqrt(ceil(Q*kernel_sr/f)) per output bin, (n_bins,)
    n_filters: int
    downsample_factor: int = 1
    early_lowpass: "np.ndarray | None" = None  # (kernel_length,), stride=factor

    @property
    def q(self) -> float:
        return 1.0 / (2.0 ** (1.0 / self.bins_per_octave) - 1.0)

    @property
    def kernel_sr(self) -> float:
        """Rate the kernel bank was designed at (input rate / early factor)."""
        return self.sr / float(self.downsample_factor)

    @property
    def cascade_hop(self) -> int:
        """Top-octave frame hop at the (possibly pre-decimated) cascade rate."""
        return self.hop_length // self.downsample_factor


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

    # Early-downsample decision (librosa heuristic, `nnaudio.py:84-139`):
    # when the top filter's cutoff sits well below Nyquist AND the hop has
    # twos to spare past the octave cascade, pre-decimate by 2^count once
    # and build the kernel bank at the reduced rate.
    filter_cutoff = fmax_t * (1 + 0.5 * HANN_WINDOW_BANDWIDTH / q)
    nyquist = sr // 2
    count1 = max(0, int(np.ceil(np.log2(0.85 * nyquist / filter_cutoff)) - 1) - 1)
    count2 = max(0, int(np.ceil(np.log2(hop_length))) - n_octaves + 1)
    downsample_factor = 2 ** min(count1, count2)

    if hop_length % downsample_factor != 0:
        raise ValueError(
            f"hop_length ({hop_length}) must be divisible by the early-"
            f"downsample factor ({downsample_factor}) for this geometry"
        )
    cascade_hop = hop_length // downsample_factor
    if cascade_hop % (2 ** (n_octaves - 1)) != 0:
        raise ValueError(
            f"cascade hop ({cascade_hop}) must be divisible by 2**(n_octaves-1) "
            f"({2 ** (n_octaves - 1)}) for the multi-rate cascade"
        )

    kernel_sr = sr / float(downsample_factor)
    early_lowpass = None
    if downsample_factor > 1:
        early_lowpass = design_lowpass_fir(
            band_center=1.0 / downsample_factor
        ).astype(np.float32)

    basis, n_fft, _, _ = make_cqt_analysis_kernels(q, kernel_sr, fmin_t, n_filters, bins_per_octave)

    freqs_all = fmin * 2.0 ** (np.arange(n_bins) / float(bins_per_octave))
    lengths_all = np.ceil(q * kernel_sr / freqs_all)

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
        downsample_factor=downsample_factor,
        early_lowpass=early_lowpass,
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


def strided_toeplitz_matrix(taps: np.ndarray, stride: int, block: int = _DEC_BLOCK) -> np.ndarray:
    """Block-Toeplitz matrix turning a stride-``stride`` FIR into one matmul.

    With z the left-padded signal, y[n] = sum_k h[k] z[stride*n + k].
    Splitting y into blocks of `block` and z into blocks of stride*block,
    output block i depends only on z blocks (i, i+1):

        y[block i + t] = sum_o  seg_i[o] * W[o, t],
        seg_i = z[stride block i : stride block i + 2 stride block],
        W[o, t] = h[o - stride t]  for 0 <= o - stride t < len(h)

    Shared by the CQT octave cascade (stride 2, 256 taps), the CQT early
    pre-decimator (stride 2^k), and the on-device 44.1->22.05 decimator
    (`ops/resample.py`, 257 taps). Returns (2*stride*block, block).
    """
    k = taps.shape[0]
    assert k <= stride * block + stride, "taps must fit the two-block segment span"
    w = np.zeros((2 * stride * block, block), dtype=np.float64)
    offsets = np.arange(2 * stride * block)[:, None] - stride * np.arange(block)[None, :]
    valid = (offsets >= 0) & (offsets < k)
    w[valid] = taps[offsets[valid]]
    return w.astype(np.float32)


def stride2_toeplitz_matrix(taps: np.ndarray, block: int = _DEC_BLOCK) -> np.ndarray:
    """The stride-2 case of `strided_toeplitz_matrix` — (4*block, block)."""
    return strided_toeplitz_matrix(taps, 2, block)


def strided_blocked_matmul(
    z: jnp.ndarray, w: jnp.ndarray, stride: int, n_blocks: int, precision: "jax.lax.Precision | str"
) -> jnp.ndarray:
    """Apply a `strided_toeplitz_matrix` to a prepared
    (batch, stride*block*(n_blocks+1)) signal; returns (batch, n_blocks*block)
    outputs (caller slices to n_out)."""
    batch = z.shape[0]
    block = w.shape[1]
    zb = z.reshape(batch, n_blocks + 1, stride * block)
    segs = jnp.concatenate([zb[:, :-1], zb[:, 1:]], axis=-1)  # (b, n_blocks, 2*stride*block)
    y = jnp.dot(segs, w, precision=precision, preferred_element_type=jnp.float32)
    return y.reshape(batch, n_blocks * block)


def stride2_blocked_matmul(
    z: jnp.ndarray, w: jnp.ndarray, n_blocks: int, precision: "jax.lax.Precision | str"
) -> jnp.ndarray:
    """The stride-2 case of `strided_blocked_matmul`."""
    return strided_blocked_matmul(z, w, 2, n_blocks, precision)


def _decimation_matrix(lowpass: np.ndarray) -> np.ndarray:
    """The CQT cascade's (512, 128) stride-2 matrix (256-tap FIR)."""
    assert lowpass.shape[0] == 2 * _DEC_BLOCK, "decimation matrix assumes 256-tap FIR"
    return stride2_toeplitz_matrix(lowpass, _DEC_BLOCK)


def decimated_length(length: int, stride: int = 2) -> int:
    """Output length of the symmetric-padded 256-tap stride-``stride`` FIR:
    floor((L-2)/stride) + 1 — matches the reference's (K-1)//2 pad + VALID
    conv arithmetic (`nnaudio.py:269-280`)."""
    return (length - 2) // stride + 1


def _decimate_by_n(x: jnp.ndarray, taps: np.ndarray, stride: int, precision) -> jnp.ndarray:
    """Anti-aliased decimation by ``stride`` as a single block matmul.

    Semantics match the reference's torch-style symmetric zero padding +
    stride-n VALID conv (`nnaudio.py:259-284`); used for the early
    pre-decimation (stride 2^k, `nnaudio.py:629-630`).
    """
    batch, length = x.shape
    n_out = decimated_length(length, stride)
    n_blocks = -(-n_out // _DEC_BLOCK)
    pad_left = (taps.shape[0] - 1) // 2
    z_len = stride * _DEC_BLOCK * (n_blocks + 1)
    z = jnp.pad(x, ((0, 0), (pad_left, z_len - pad_left - length)))
    w = jnp.asarray(strided_toeplitz_matrix(taps.astype(np.float64), stride))
    return strided_blocked_matmul(z, w, stride, n_blocks, precision)[:, :n_out]


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
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
    kernel_matrix: "jnp.ndarray | None" = None,
) -> jnp.ndarray:
    """Jittable magnitude CQT.

    Args:
        kernels: build-time constants from `build_cqt_kernels`.
        audio: (batch, n_samples) float32 at `kernels.sr`.
        kernel_matrix: optional (n_fft, 2*n_filters) override of the
            top-octave bank (real columns then imag) — pass the entry from a
            parameter pytree to make the filterbank trainable, the analogue
            of the reference's `trainable=True` (`nnaudio.py:602-604`).

    Returns:
        (batch, n_frames, n_bins) float32 magnitudes, low bin first —
        the same layout the reference produces (`nnaudio.py:623-661`).
    """
    if kernel_matrix is None:
        kernel_matrix = jnp.asarray(kernels.top_octave_kernels.T)  # (n_fft, 2*n_filters)
    dec_matrix = jnp.asarray(_decimation_matrix(kernels.lowpass.astype(np.float64)))

    factor = kernels.downsample_factor
    if factor > 1:
        # early downsample: one stride-2^k anti-alias matmul, then the
        # cascade runs at the reduced rate/hop (`nnaudio.py:626-630`)
        audio = _decimate_by_n(audio, kernels.early_lowpass, factor, precision)
    n_frames = cqt_frame_count(audio.shape[-1], kernels.cascade_hop)

    octaves = []  # index 0 = top octave
    hop = kernels.cascade_hop
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

    # rescale by the early factor to match the 1992 magnitudes, then the
    # librosa-compatible length norm (`nnaudio.py:646-650`)
    norm = kernels.length_norm * np.float32(factor)
    full = full * jnp.asarray(norm)[None, :, None, None]
    mag = jnp.sqrt(jnp.sum(jnp.square(full), axis=-1))
    return jnp.transpose(mag, (0, 2, 1))
