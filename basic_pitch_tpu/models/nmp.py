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


def identity_bn_stats(width: int):
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
    precision=jax.lax.Precision.HIGHEST,
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
    precision=jax.lax.Precision.HIGHEST,
    head_precision=None,
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

    Returns:
        ({"onset": (b,t,88), "contour": (b,t,264), "note": (b,t,88)}, bn_stats)
    """
    x, bn_stats = frontend(params, audio, config, train, precision)
    stats: Dict[str, Any] = dict(bn_stats)
    hp = precision if head_precision is None else head_precision

    # --- contour head ---
    c = _conv2d(x, params["contour_conv"]["w"], params["contour_conv"]["b"], precision=hp)
    c, stats["bn_contour"] = _batch_norm(c, params["bn_contour"], train)
    c = jax.nn.relu(c)

    if not config.no_contours:
        c = _conv2d(c, params["contour_out"]["w"], params["contour_out"]["b"], precision=hp)
        c = jax.nn.sigmoid(c)
        contour = c.reshape(c.shape[0], c.shape[1], -1)  # (b, t, 264)
        note_in = contour[..., None]  # reduced contours feed the note head
    else:
        contour = c.reshape(c.shape[0], c.shape[1], -1)
        note_in = c

    # --- note head ---
    n = _conv2d(
        note_in, params["note_conv"]["w"], params["note_conv"]["b"], strides=(1, 3), precision=hp
    )
    n = jax.nn.relu(n)
    n_pre = jax.nn.sigmoid(
        _conv2d(n, params["note_out"]["w"], params["note_out"]["b"], precision=hp)
    )  # (b, t, 88, 1)
    note = n_pre.reshape(n_pre.shape[0], n_pre.shape[1], -1)

    # --- onset head ---
    o = _conv2d(
        x, params["onset_conv"]["w"], params["onset_conv"]["b"], strides=(1, 3), precision=hp
    )
    o, stats["bn_onset"] = _batch_norm(o, params["bn_onset"], train)
    o = jax.nn.relu(o)
    o = jnp.concatenate([n_pre, o], axis=-1)  # note-pre first, then onset stack
    o = jax.nn.sigmoid(
        _conv2d(o, params["onset_out"]["w"], params["onset_out"]["b"], precision=hp)
    )
    onset = o.reshape(o.shape[0], o.shape[1], -1)

    return {"onset": onset, "contour": contour, "note": note}, stats


def predict_fn(
    params: Params,
    audio: jnp.ndarray,
    config: ModelConfig = DEFAULT_CONFIG,
    precision=jax.lax.Precision.HIGHEST,
    head_precision=None,
) -> Dict[str, jnp.ndarray]:
    """Inference-only forward (no BN stats)."""
    out, _ = forward(
        params, audio, config, train=False, precision=precision,
        head_precision=head_precision,
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
