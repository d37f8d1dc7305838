"""Training losses for the NMP model.

Smoothed binary cross-entropy per head, with an optional class-balanced
variant for the sparse onset head. Semantics match the reference
(`/root/reference/basic_pitch/models.py:55-146`): Keras
``binary_crossentropy(label_smoothing=s)`` smooths targets toward 0.5 and
averages over the frequency axis; head losses are combined with per-example
presence weights supplied by the data pipeline.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

DEFAULT_LABEL_SMOOTHING = 0.2
DEFAULT_POSITIVE_WEIGHT = 0.5
_EPS = 1e-7  # Keras clips probabilities to [eps, 1-eps]


def _bce_elementwise(y_true: jnp.ndarray, y_pred: jnp.ndarray, label_smoothing: float) -> jnp.ndarray:
    y_true = y_true * (1.0 - label_smoothing) + 0.5 * label_smoothing
    p = jnp.clip(y_pred, _EPS, 1.0 - _EPS)
    return -(y_true * jnp.log(p) + (1.0 - y_true) * jnp.log1p(-p))


def transcription_loss(
    y_true: jnp.ndarray, y_pred: jnp.ndarray, label_smoothing: float = DEFAULT_LABEL_SMOOTHING
) -> jnp.ndarray:
    """Smoothed BCE, averaged over the trailing (frequency) axis —
    keras.binary_crossentropy semantics (`models.py:55`). Returns (..., time)."""
    return jnp.mean(_bce_elementwise(y_true, y_pred, label_smoothing), axis=-1)


def weighted_transcription_loss(
    y_true: jnp.ndarray,
    y_pred: jnp.ndarray,
    label_smoothing: float = DEFAULT_LABEL_SMOOTHING,
    positive_weight: float = DEFAULT_POSITIVE_WEIGHT,
) -> jnp.ndarray:
    """Class-balanced BCE: the means over exactly-zero and nonzero target
    cells are combined with weight `positive_weight` (`models.py:71-97`).
    Returns a scalar."""
    elementwise = _bce_elementwise(y_true, y_pred, label_smoothing)
    negative_mask = (y_true == 0).astype(elementwise.dtype)
    positive_mask = 1.0 - negative_mask
    n_neg = jnp.maximum(jnp.sum(negative_mask), 1.0)
    n_pos = jnp.maximum(jnp.sum(positive_mask), 1.0)
    bce_negative = jnp.sum(elementwise * negative_mask) / n_neg
    bce_positive = jnp.sum(elementwise * positive_mask) / n_pos
    return (1.0 - positive_weight) * bce_negative + positive_weight * bce_positive


def total_loss(
    outputs: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    sample_weights: Optional[Dict[str, jnp.ndarray]] = None,
    label_smoothing: float = DEFAULT_LABEL_SMOOTHING,
    weighted_onset: bool = False,
    positive_weight: float = DEFAULT_POSITIVE_WEIGHT,
    no_contours: bool = False,
) -> tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Combined loss over the contour/note/onset heads.

    Per-head per-example losses are scaled by that example's presence weight
    (0 when the dataset lacks that annotation type) and averaged, matching
    the reference training setup (`train.py:150-154` + the weight triple from
    `tf_example_deserialization.py:522-588`).

    With ``no_contours`` the contour head is excluded: in that mode the model's
    "contour" output is a relu'd hidden activation, not a sigmoid posteriorgram,
    so BCE against contour targets is meaningless. This realizes the intent of
    the reference's ``loss_no_contour`` branch (`train.py:144-147`, present only
    as commented-out code — the reference never shipped a working no-contours
    training loss).

    Returns:
        (scalar total, dict of per-head scalars).
    """
    heads = ("note", "onset") if no_contours else ("contour", "note", "onset")
    per_head = {}
    for head in heads:
        y_true, y_pred = targets[head], outputs[head]
        if head == "onset" and weighted_onset:
            # NOTE deliberate parity quirk: the reference's weighted loss
            # pools ALL cells across the batch (boolean_mask flattens it,
            # models.py:71-97), so weight-0 examples still contribute to the
            # pooled means and Keras' sample-weight application degenerates
            # to scalar * mean(weights). Reproduced exactly; masking weight-0
            # examples out would diverge from reference training behavior.
            head_loss = weighted_transcription_loss(
                y_true, y_pred, label_smoothing, positive_weight
            )
            if sample_weights is not None:
                head_loss = head_loss * jnp.mean(sample_weights[head])
        else:
            per_example = jnp.mean(
                transcription_loss(y_true, y_pred, label_smoothing), axis=-1
            )  # (batch,)
            if sample_weights is not None:
                per_example = per_example * sample_weights[head]
            head_loss = jnp.mean(per_example)
        per_head[head] = head_loss
    total = sum(per_head.values())
    return total, per_head
