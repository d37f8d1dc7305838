"""NMP ("Notes, Multipitch, Onsets") transcription network, TPU-native.

The model family from the ICASSP 2022 paper *A Lightweight Instrument-Agnostic
Model for Polyphonic Note Transcription and Multipitch Estimation*: a
harmonically-stacked CQT front-end feeding three small convolutional heads
that emit per-frame posteriorgrams for pitch contours (264 bins), note frames
(88 bins), and note onsets (88 bins).

Architecture parity with the reference graph builder
(`/root/reference/basic_pitch/models.py:193-322`), re-expressed as a pure
function over an explicit parameter pytree:

    audio (b, 43844) -> CQT (b, 172, 309) -> NormalizedLog -> BatchNorm
      -> HarmonicStack([0.5, 1..7], crop 264) -> (b, 172, 264, 8)
      contour head: Conv(8, 3x39) -> BN -> ReLU -> Conv(1, 5x5, sigmoid)
      note head:    Conv(32, 7x7, stride (1,3)) -> ReLU -> Conv(1, 7x3, sigmoid)
      onset head:   Conv(32, 5x5, stride (1,3)) -> BN -> ReLU
                    -> concat(note_pre) -> Conv(1, 3x3, sigmoid)

The whole forward pass is one jittable graph: a long audio tensor can be
windowed, stacked, and run as a single large batch on device, which is where
the TPU throughput comes from (the reference runs one window per predict call,
`inference.py:308-310`).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from basic_pitch_tpu import constants
from basic_pitch_tpu.ops import cqt as cqt_ops
from basic_pitch_tpu.ops.harmonic import harmonic_stack
from basic_pitch_tpu.ops.spectral import normalized_log

Params = Dict[str, Any]

BN_EPSILON = 1e-3  # Keras BatchNormalization default


def identity_bn_stats(width: int) -> "Dict[str, Any]":
    """BatchNorm parameter dict that is exactly the identity under
    `_batch_norm`: rsqrt(var + eps) == 1 when var = 1 - eps. Used by the
    serialized-model importers for formats that fold BN into the convs."""
    import numpy as np

    return {
        "gamma": np.ones(width, np.float32),
        "beta": np.zeros(width, np.float32),
        "mean": np.zeros(width, np.float32),
        "var": np.full(width, 1.0 - BN_EPSILON, np.float32),
    }
BN_MOMENTUM = 0.99

# maximum CQT semitone count representable below Nyquist
MAX_N_SEMITONES = int(
    np.floor(12.0 * np.log2(0.5 * constants.AUDIO_SAMPLE_RATE / constants.ANNOTATIONS_BASE_FREQUENCY))
)


def n_semitones_for_harmonics(n_harmonics: int) -> int:
    """Extra semitones of CQT needed so the top harmonic is still visible."""
    return min(
        int(np.ceil(12.0 * np.log2(n_harmonics)) + constants.ANNOTATIONS_N_SEMITONES),
        MAX_N_SEMITONES,
    )


def default_harmonics(n_harmonics: int) -> Tuple[float, ...]:
    if n_harmonics > 1:
        return (0.5,) + tuple(float(h) for h in range(1, n_harmonics))
    return (1.0,)


@functools.lru_cache(maxsize=8)
def cqt_kernels_for(n_harmonics: int) -> cqt_ops.CQTKernels:
    return cqt_ops.build_cqt_kernels(
        sr=constants.AUDIO_SAMPLE_RATE,
        hop_length=constants.FFT_HOP,
        fmin=constants.ANNOTATIONS_BASE_FREQUENCY,
        n_bins=n_semitones_for_harmonics(n_harmonics) * constants.CONTOURS_BINS_PER_SEMITONE,
        bins_per_octave=12 * constants.CONTOURS_BINS_PER_SEMITONE,
    )


def _conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    strides: Tuple[int, int] = (1, 1),
    precision=None,
) -> jnp.ndarray:
    """SAME-padded NHWC conv2d (+bias). Weight layout HWIO, as serialized."""
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=strides,
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )
    return y + b


# HBM guard for the im2col lowering: patches tensors above this element
# count would pressure the v5e's 16 GiB (the contour_conv's k=936 patches
# at 192-window chunks would be 32.6 GiB); such convs fall back to the
# plain lowering instead of OOMing the chunk pipeline.
_IM2COL_MAX_PATCH_ELEMS = 800_000_000


def _conv2d_im2col(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    strides: Tuple[int, int] = (1, 1),
    precision=None,
) -> jnp.ndarray:
    """SAME conv2d expressed as im2col patches -> one dot_general.

    The layout experiment of VERDICT r4 #2: the six head convs have tiny
    channel counts (8/32 vs the MXU's 128 lanes), so this reformulation
    hands XLA a single (B*H*W, kh*kw*cin) x (kh*kw*cin, cout) matmul
    instead of a convolution, letting the compiler pick matmul tiling.
    Same math as `_conv2d` (identical contraction terms; reduction order
    may differ in the last bits). Convs whose materialized patches would
    exceed `_IM2COL_MAX_PATCH_ELEMS` (the big stride-1 heads at production
    chunk sizes) fall back to the plain lowering — im2col materializes
    k-times the activation and cannot afford k=936 at (192, 172, 264).
    """
    kh, kw, cin, cout = w.shape
    bsz, h, wdt, _ = x.shape
    ho = -(-h // strides[0])
    wo = -(-wdt // strides[1])
    if bsz * ho * wo * (kh * kw * cin) > _IM2COL_MAX_PATCH_ELEMS:
        return _conv2d(x, w, b, strides, precision)
    patches = jax.lax.conv_general_dilated_patches(
        x,
        (kh, kw),
        strides,
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (..., cin*kh*kw) with channel-major ordering (cin slowest)
    bsz, ho, wo, k = patches.shape
    wmat = jnp.transpose(w, (2, 0, 1, 3)).reshape(kh * kw * cin, cout)
    y = jax.lax.dot_general(
        patches.reshape(bsz * ho * wo, k),
        wmat,
        (((1,), (0,)), ((), ())),
        precision=precision,
    )
    return y.reshape(bsz, ho, wo, cout) + b


def _conv2d_toeplitz(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    strides: Tuple[int, int] = (1, 1),
    precision=None,
    fb: Optional[int] = None,
) -> jnp.ndarray:
    """SAME conv2d as a frequency-blocked block-Toeplitz matmul.

    The CQT's matmul-first pattern (ops/cqt.py) applied to a head conv:
    a block of `fb` frequency bins moves from the matmul M dimension into
    N, so the MXU sees (B*T*nblocks, kh*(fb+kw-1)*cin) x (..., fb*cout) —
    contraction and output dims are MXU-scale instead of cout=8 wasting
    120 of 128 lanes. Costs (fb+kw-1)/kw more FLOPs (the band's zeros are
    multiplied): fb trades lane fill against zero-FLOP inflation — full-F
    (fb=264) inflates 7.7x, fb=24 only 1.6x at N=192. The sweep lives in
    tools/layout_ab.py. Stride-1 only (the strided head convs shrink N by
    the stride, making the inflation unprofitable — DESIGN §2d).
    """
    assert strides == (1, 1), "toeplitz path is stride-1 only"
    kh, kw, cin, cout = w.shape
    bsz, t, f, _ = x.shape
    if fb is None or fb >= f:
        fb = f
    assert f % fb == 0, f"block size {fb} must divide the frequency axis {f}"
    nb = f // fb
    pt0 = (kh - 1) // 2
    pf0 = (kw - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pt0, kh - 1 - pt0), (pf0, kw - 1 - pf0), (0, 0)))
    fslab = fb + kw - 1
    cols = fslab * cin
    # banded per-block weight: row fo of the block holds w at columns
    # [fo*cin, fo*cin + kw*cin) — translation-invariant, so ONE wmat serves
    # every block. Built with the pad+reshape Toeplitz trick: flatten
    # (fb, cols+cin) rows so each successive row lands cin columns later,
    # then trim; row fb-1 ends exactly at cols.
    blocks = w.reshape(kh, kw * cin, cout)
    wrows = jnp.zeros((kh, fb, cols + cin, cout), x.dtype)
    wrows = wrows.at[:, :, : kw * cin, :].set(blocks[:, None, :, :])
    wmat = wrows.reshape(kh, fb * (cols + cin), cout)[:, : fb * cols, :]
    wmat = wmat.reshape(kh, fb, cols, cout)
    # (kh, cols, fb, cout) -> (kh*cols, fb*cout)
    wmat = jnp.transpose(wmat, (0, 2, 1, 3)).reshape(kh * cols, fb * cout)
    # Input rows: kh time taps and the nb overlapping frequency slabs
    # (halo kw-1), assembled ONLY through rank-3 tensors whose minor dim is
    # the K axis — a (B,T,nb,kh,fslab,cin) stack would put cin=8 minormost
    # and TPU tiling would pad it 8->128 (a measured 16x HBM blow-up).
    xf = xp.reshape(bsz, t + kh - 1, (f + kw - 1) * cin)
    rows = jnp.concatenate(
        [
            jnp.concatenate(
                [xf[:, dt : dt + t, j * fb * cin : j * fb * cin + cols] for dt in range(kh)],
                axis=-1,
            )
            for j in range(nb)
        ],
        axis=1,
    )  # (B, nb*T, kh*cols), block-major
    y = jax.lax.dot_general(
        rows.reshape(bsz * nb * t, kh * cols),
        wmat,
        (((1,), (0,)), ((), ())),
        precision=precision,
    )
    y = y.reshape(bsz, nb, t, fb, cout)
    y = jnp.transpose(y, (0, 2, 1, 3, 4)).reshape(bsz, t, f, cout)
    return y + b


def _resolve_conv_impl(conv_impl: str):
    """conv_impl -> (generic head conv fn, contour_conv fn).

    "conv"          — lax.conv_general_dilated everywhere (baseline).
    "im2col"        — patches + dot_general for every head conv whose
                      patches fit `_IM2COL_MAX_PATCH_ELEMS` (the strided
                      note/onset convs at production chunks); the rest
                      fall back to the plain lowering.
    "toeplitz[:fb]" — frequency-blocked Toeplitz matmul for the dominant
                      contour_conv (70% of head FLOPs, stride 1), plain
                      conv for the rest. Optional `:fb` sets the frequency
                      block size (divisor of 264; default 24, the measured
                      sweet spot of the inflation/lane-fill trade).
    "mxu[:fb]"      — both: Toeplitz contour_conv + im2col elsewhere.
    """
    name, _, arg = conv_impl.partition(":")
    if arg and name not in ("toeplitz", "mxu"):
        raise ValueError(f"conv_impl {name!r} takes no :arg (got {conv_impl!r})")
    if name == "conv":
        return _conv2d, _conv2d
    if name == "im2col":
        return _conv2d_im2col, _conv2d_im2col
    if name in ("toeplitz", "mxu"):
        fb = int(arg) if arg else 24
        toe = functools.partial(_conv2d_toeplitz, fb=fb)
        return (_conv2d_im2col if name == "mxu" else _conv2d), toe
    raise ValueError(f"conv_impl must be conv|im2col|toeplitz[:fb]|mxu[:fb], got {conv_impl!r}")


def _batch_norm(
    x: jnp.ndarray,
    bn: Params,
    train: bool,
) -> Tuple[jnp.ndarray, Optional[Tuple[jnp.ndarray, jnp.ndarray]]]:
    """Channel-last batch norm. Returns (y, batch_stats or None).

    In train mode, normalizes with batch statistics and returns them so the
    training loop can update the moving averages; in eval mode uses the
    stored moving statistics.
    """
    if train:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        stats = (mean, var)
    else:
        mean, var = bn["mean"], bn["var"]
        stats = None
    inv = jax.lax.rsqrt(var + BN_EPSILON)
    y = (x - mean) * inv * bn["gamma"] + bn["beta"]
    return y, stats


class ModelConfig:
    """Static hyperparameters of an NMP model instance."""

    def __init__(
        self,
        n_harmonics: int = 8,
        n_filters_contour: int = 8,
        n_filters_notes: int = 32,
        n_filters_onsets: int = 32,
        no_contours: bool = False,
        trainable_cqt: bool = False,
    ):
        self.n_harmonics = n_harmonics
        self.n_filters_contour = n_filters_contour
        self.n_filters_notes = n_filters_notes
        self.n_filters_onsets = n_filters_onsets
        self.no_contours = no_contours
        # learn the CQT filterbank alongside the convs — the analogue of the
        # reference CQT layer's `trainable=True` (`nnaudio.py:602-604`); the
        # bank lives in params["cqt_kernels"] and is L1-renormalized per
        # optimizer step by `apply_unit_norm_constraint`
        self.trainable_cqt = trainable_cqt
        self.harmonics = default_harmonics(n_harmonics)

    def __repr__(self) -> str:
        return (
            f"ModelConfig(n_harmonics={self.n_harmonics}, "
            f"contour={self.n_filters_contour}, notes={self.n_filters_notes}, "
            f"onsets={self.n_filters_onsets}, no_contours={self.no_contours}, "
            f"trainable_cqt={self.trainable_cqt})"
        )


DEFAULT_CONFIG = ModelConfig()


def frontend(
    params: Params,
    audio: jnp.ndarray,
    config: ModelConfig = DEFAULT_CONFIG,
    train: bool = False,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Audio -> harmonically stacked, normalized CQT.

    Args:
        audio: (batch, AUDIO_N_SAMPLES) float32.

    Returns:
        ((b, n_frames, 264, n_harmonics) stack, dict of train-mode BN stats)
    """
    kernels = cqt_kernels_for(config.n_harmonics)
    mag = cqt_ops.cqt_magnitude(
        kernels, audio, precision=precision, kernel_matrix=params.get("cqt_kernels")
    )
    x = normalized_log(mag)[..., None]  # (b, t, f, 1)
    x, bn_stats = _batch_norm(x, params["bn_cqt"], train)
    stacked = harmonic_stack(
        x,
        constants.CONTOURS_BINS_PER_SEMITONE,
        config.harmonics,
        constants.N_FREQ_BINS_CONTOURS,
    )
    return stacked, {"bn_cqt": bn_stats}


def forward(
    params: Params,
    audio: jnp.ndarray,
    config: ModelConfig = DEFAULT_CONFIG,
    train: bool = False,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
    head_precision: "jax.lax.Precision | None" = None,
    conv_impl: str = "conv",
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, Any]]:
    """Full NMP forward pass.

    Args:
        params: parameter pytree (see `basic_pitch_tpu.models.params`).
        audio: (batch, AUDIO_N_SAMPLES) float32 at 22050 Hz.
        train: batch-norm mode; when True the second return value carries the
            per-layer batch statistics for moving-average updates.
        precision: MXU precision for the CQT front-end (and the heads unless
            overridden). The CQT is the numerically fragile stage — its
            output goes through a log — so it stays at HIGHEST by default.
        head_precision: optional separate precision for the six head convs,
            which carry ~60% of the model's device time at well-conditioned
            post-BN activations (measured, tools/precision_ab.json). None
            means "same as precision".
        conv_impl: head-conv lowering — "conv" (lax conv), "im2col"
            (patches + dot_general), or "toeplitz" (block-Toeplitz matmul
            for the contour conv); measured in tools/layout_ab.py.

    Returns:
        ({"onset": (b,t,88), "contour": (b,t,264), "note": (b,t,88)}, bn_stats)
    """
    x, bn_stats = frontend(params, audio, config, train, precision)
    stats: Dict[str, Any] = dict(bn_stats)
    hp = precision if head_precision is None else head_precision
    conv, conv_contour = _resolve_conv_impl(conv_impl)

    # --- contour head ---
    c = conv_contour(x, params["contour_conv"]["w"], params["contour_conv"]["b"], precision=hp)
    c, stats["bn_contour"] = _batch_norm(c, params["bn_contour"], train)
    c = jax.nn.relu(c)

    if not config.no_contours:
        c = conv(c, params["contour_out"]["w"], params["contour_out"]["b"], precision=hp)
        c = jax.nn.sigmoid(c)
        contour = c.reshape(c.shape[0], c.shape[1], -1)  # (b, t, 264)
        note_in = contour[..., None]  # reduced contours feed the note head
    else:
        contour = c.reshape(c.shape[0], c.shape[1], -1)
        note_in = c

    # --- note head ---
    n = conv(
        note_in, params["note_conv"]["w"], params["note_conv"]["b"], strides=(1, 3), precision=hp
    )
    n = jax.nn.relu(n)
    n_pre = jax.nn.sigmoid(
        conv(n, params["note_out"]["w"], params["note_out"]["b"], precision=hp)
    )  # (b, t, 88, 1)
    note = n_pre.reshape(n_pre.shape[0], n_pre.shape[1], -1)

    # --- onset head ---
    o = conv(
        x, params["onset_conv"]["w"], params["onset_conv"]["b"], strides=(1, 3), precision=hp
    )
    o, stats["bn_onset"] = _batch_norm(o, params["bn_onset"], train)
    o = jax.nn.relu(o)
    o = jnp.concatenate([n_pre, o], axis=-1)  # note-pre first, then onset stack
    o = jax.nn.sigmoid(
        conv(o, params["onset_out"]["w"], params["onset_out"]["b"], precision=hp)
    )
    onset = o.reshape(o.shape[0], o.shape[1], -1)

    return {"onset": onset, "contour": contour, "note": note}, stats


def predict_fn(
    params: Params,
    audio: jnp.ndarray,
    config: ModelConfig = DEFAULT_CONFIG,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
    head_precision: "jax.lax.Precision | None" = None,
    conv_impl: str = "conv",
) -> Dict[str, jnp.ndarray]:
    """Inference-only forward (no BN stats)."""
    out, _ = forward(
        params, audio, config, train=False, precision=precision,
        head_precision=head_precision, conv_impl=conv_impl,
    )
    return out


# ---------------------------------------------------------------------------
# initialization (for training from scratch)
# ---------------------------------------------------------------------------


def _variance_scaling_uniform(key, shape):
    """VarianceScaling(scale=2, fan_avg, uniform) — `models.py:149`."""
    receptive = int(np.prod(shape[:-2]))
    fan_in = shape[-2] * receptive
    fan_out = shape[-1] * receptive
    scale = 2.0 / ((fan_in + fan_out) / 2.0)
    limit = float(np.sqrt(3.0 * scale))
    return jax.random.uniform(key, shape, minval=-limit, maxval=limit, dtype=jnp.float32)


def _bn_init(n: int) -> Params:
    return {
        "gamma": jnp.ones((n,), jnp.float32),
        "beta": jnp.zeros((n,), jnp.float32),
        "mean": jnp.zeros((n,), jnp.float32),
        "var": jnp.ones((n,), jnp.float32),
    }


def _conv_init(key, h, w, cin, cout) -> Params:
    return {
        "w": _variance_scaling_uniform(key, (h, w, cin, cout)),
        "b": jnp.zeros((cout,), jnp.float32),
    }


def init_params(key: jax.Array, config: ModelConfig = DEFAULT_CONFIG) -> Params:
    """Fresh parameter pytree with the reference's initialization scheme."""
    keys = jax.random.split(key, 6)
    nh = len(config.harmonics)
    note_in_ch = 1 if not config.no_contours else config.n_filters_contour
    extra: Params = {}
    if config.trainable_cqt:
        # initialize the learnable filterbank at the analytic CQT kernels,
        # like the reference's Variable wrapping (`nnaudio.py:602-604`)
        extra["cqt_kernels"] = jnp.asarray(
            cqt_kernels_for(config.n_harmonics).top_octave_kernels.T
        )
    return extra | {
        "bn_cqt": _bn_init(1),
        "contour_conv": _conv_init(keys[0], 3, 39, nh, config.n_filters_contour),
        "bn_contour": _bn_init(config.n_filters_contour),
        "contour_out": _conv_init(keys[1], 5, 5, config.n_filters_contour, 1),
        "note_conv": _conv_init(keys[2], 7, 7, note_in_ch, config.n_filters_notes),
        "note_out": _conv_init(keys[3], 7, 3, config.n_filters_notes, 1),
        "onset_conv": _conv_init(keys[4], 5, 5, nh, config.n_filters_onsets),
        "bn_onset": _bn_init(config.n_filters_onsets),
        "onset_out": _conv_init(keys[5], 3, 3, config.n_filters_onsets + 1, 1),
    }


def apply_unit_norm_constraint(params: Params) -> Params:
    """L2-normalize every conv kernel over (h, w, in) — `models.py:153`.

    The reference applies a UnitNorm kernel constraint after each optimizer
    step; call this from the training loop.
    """

    def norm_conv(p: Params) -> Params:
        w = p["w"]
        denom = jnp.sqrt(jnp.sum(jnp.square(w), axis=(0, 1, 2), keepdims=True))
        return {"w": w / jnp.maximum(denom, 1e-12), "b": p["b"]}

    out = dict(params)
    for name in ("contour_conv", "contour_out", "note_conv", "note_out", "onset_conv", "onset_out"):
        out[name] = norm_conv(params[name])
    if "cqt_kernels" in params:
        # trainable filterbank: keep each bin's complex kernel L1-normalized,
        # the invariant the analytic bank is built with (`make_cqt_analysis_
        # kernels` L1 basis norm) — applied per step like the conv constraint
        km = params["cqt_kernels"]  # (n_fft, 2*n_filters): real cols then imag
        n_filters = km.shape[1] // 2
        mag = jnp.sqrt(jnp.square(km[:, :n_filters]) + jnp.square(km[:, n_filters:]))
        l1 = jnp.maximum(jnp.sum(mag, axis=0, keepdims=True), 1e-12)  # (1, n_filters)
        out["cqt_kernels"] = km / jnp.concatenate([l1, l1], axis=1)
    return out
