"""NMP model: shapes, golden parity with the reference checkpoint, init."""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basic_pitch_tpu import constants
from basic_pitch_tpu.models import nmp

GOLDENS = pathlib.Path(__file__).parent / "goldens"


def test_output_shapes(nmp_params):
    audio = jnp.zeros((3, constants.AUDIO_N_SAMPLES), jnp.float32)
    out = nmp.predict_fn(nmp_params, audio)
    assert out["note"].shape == (3, 172, 88)
    assert out["onset"].shape == (3, 172, 88)
    assert out["contour"].shape == (3, 172, 264)


def test_matches_reference_golden(nmp_params):
    """Posteriorgram parity with the reference TF model at 1e-4 (the same
    tolerance the reference's own golden test uses,
    `/root/reference/tests/test_inference.py:66-76`)."""
    golden = np.load(GOLDENS / "random_windows.npz")
    out = jax.jit(nmp.predict_fn)(nmp_params, jnp.asarray(golden["audio"]))
    for head in ("note", "onset", "contour"):
        np.testing.assert_allclose(
            np.asarray(out[head]), golden[head], atol=1e-4, rtol=0, err_msg=head
        )


def test_vocadito_windows_golden(nmp_params):
    """Parity on real audio decoded+resampled by our own pipeline."""
    golden = np.load(GOLDENS / "vocadito_windows.npz")
    from tools.make_goldens import REFERENCE_WAV, window_audio
    from basic_pitch_tpu.utils import audio as audio_io

    if not pathlib.Path(REFERENCE_WAV).exists():
        pytest.skip("reference test clip unavailable")
    y, _ = audio_io.load_audio(REFERENCE_WAV, constants.AUDIO_SAMPLE_RATE)
    assert len(y) == int(golden["original_length"])
    windows = jnp.asarray(window_audio(y))
    out = jax.jit(nmp.predict_fn)(nmp_params, windows)
    for head in ("note", "onset", "contour"):
        np.testing.assert_allclose(
            np.asarray(out[head]), golden[head], atol=1e-4, rtol=0, err_msg=head
        )


def test_init_and_forward_train_mode():
    params = nmp.init_params(jax.random.PRNGKey(0))
    audio = jnp.asarray(np.random.RandomState(0).randn(2, constants.AUDIO_N_SAMPLES).astype(np.float32))
    out, stats = nmp.forward(params, audio, train=True)
    assert out["note"].shape == (2, 172, 88)
    assert stats["bn_cqt"] is not None and stats["bn_onset"] is not None
    # unit-norm constraint really normalizes
    constrained = nmp.apply_unit_norm_constraint(params)
    w = constrained["contour_conv"]["w"]
    norms = jnp.sqrt(jnp.sum(w**2, axis=(0, 1, 2)))
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-5)


def test_no_contours_config():
    config = nmp.ModelConfig(no_contours=True)
    params = nmp.init_params(jax.random.PRNGKey(1), config)
    audio = jnp.zeros((1, constants.AUDIO_N_SAMPLES), jnp.float32)
    out = nmp.predict_fn(params, audio, config)
    assert out["note"].shape == (1, 172, 88)
    assert out["onset"].shape == (1, 172, 88)


def test_head_precision_plumbing(nmp_params):
    """head_precision=None must be byte-identical to the single-precision
    path (the default), and an explicit head_precision must only perturb the
    posteriorgrams within float tolerance — the CQT front-end keeps the main
    precision, so outputs stay close even with bf16 heads."""
    rng = np.random.default_rng(11)
    audio = jnp.asarray(
        rng.standard_normal((2, constants.AUDIO_N_SAMPLES)).astype(np.float32) * 0.1
    )
    base = nmp.predict_fn(nmp_params, audio, precision=jax.lax.Precision.HIGHEST)
    same = nmp.predict_fn(
        nmp_params, audio,
        precision=jax.lax.Precision.HIGHEST, head_precision=None,
    )
    mixed = nmp.predict_fn(
        nmp_params, audio,
        precision=jax.lax.Precision.HIGHEST,
        head_precision=jax.lax.Precision.DEFAULT,
    )
    for head in ("note", "onset", "contour"):
        np.testing.assert_array_equal(np.asarray(base[head]), np.asarray(same[head]))
        # sigmoid outputs in [0,1]: bf16 heads stay within ~1e-2 of fp32
        np.testing.assert_allclose(
            np.asarray(base[head]), np.asarray(mixed[head]), atol=2e-2, rtol=0,
            err_msg=head,
        )
