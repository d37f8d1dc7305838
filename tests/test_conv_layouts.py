"""Head-conv lowering equivalence: conv vs im2col vs blocked-Toeplitz.

The layout experiment (VERDICT r4 #2, tools/layout_ab.py) reformulates the
tiny-channel head convs as MXU-shaped matmuls; these tests pin that every
lowering computes the SAME convolution. Integer-valued inputs make fp32
arithmetic exact, so any nonzero difference is an indexing bug, not
reduction-order noise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basic_pitch_tpu.models import nmp

# the six head-conv geometries (kh, kw, cin, cout, strides, freq)
GEOMETRIES = [
    ("contour_conv", 3, 39, 8, 8, (1, 1), 264),
    ("contour_out", 5, 5, 8, 1, (1, 1), 264),
    ("note_conv", 7, 7, 1, 32, (1, 3), 264),
    ("note_out", 7, 3, 32, 1, (1, 1), 88),
    ("onset_conv", 5, 5, 8, 32, (1, 3), 264),
    ("onset_out", 3, 3, 33, 1, (1, 1), 88),
]


def _int_case(kh, kw, cin, cout, f, t=20, b=2, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.integers(-3, 4, (b, t, f, cin)), jnp.float32)
    w = jnp.asarray(rng.integers(-3, 4, (kh, kw, cin, cout)), jnp.float32)
    bias = jnp.asarray(rng.integers(-3, 4, (cout,)), jnp.float32)
    return x, w, bias


@pytest.mark.parametrize("name,kh,kw,cin,cout,st,f", GEOMETRIES)
def test_im2col_exact(name, kh, kw, cin, cout, st, f):
    x, w, bias = _int_case(kh, kw, cin, cout, f)
    ref = nmp._conv2d(x, w, bias, st, jax.lax.Precision.HIGHEST)
    got = nmp._conv2d_im2col(x, w, bias, st, jax.lax.Precision.HIGHEST)
    assert ref.shape == got.shape
    assert float(jnp.abs(ref - got).max()) == 0.0


@pytest.mark.parametrize("name,kh,kw,cin,cout,st,f", [g for g in GEOMETRIES if g[5] == (1, 1)])
@pytest.mark.parametrize("fb", [None, 24, 44, 88])
def test_toeplitz_exact(name, kh, kw, cin, cout, st, f, fb):
    if fb is not None and f % fb:
        pytest.skip(f"{fb} does not divide {f}")
    x, w, bias = _int_case(kh, kw, cin, cout, f)
    ref = nmp._conv2d(x, w, bias, st, jax.lax.Precision.HIGHEST)
    got = nmp._conv2d_toeplitz(x, w, bias, st, jax.lax.Precision.HIGHEST, fb=fb)
    assert ref.shape == got.shape
    assert float(jnp.abs(ref - got).max()) == 0.0


def test_im2col_big_conv_falls_back_not_oom():
    """Convs whose patches would exceed the HBM guard run the plain path —
    the guard exists because contour_conv patches at production chunks are
    32.6 GiB (the round-4 crash)."""
    kh, kw, cin, cout, f = 3, 39, 8, 8, 264
    x, w, bias = _int_case(kh, kw, cin, cout, f, t=4)
    big = nmp._IM2COL_MAX_PATCH_ELEMS
    try:
        nmp._IM2COL_MAX_PATCH_ELEMS = 1  # force every conv over the guard
        got = nmp._conv2d_im2col(x, w, bias, (1, 1), jax.lax.Precision.HIGHEST)
    finally:
        nmp._IM2COL_MAX_PATCH_ELEMS = big
    ref = nmp._conv2d(x, w, bias, (1, 1), jax.lax.Precision.HIGHEST)
    assert float(jnp.abs(ref - got).max()) == 0.0


@pytest.mark.parametrize("impl", ["conv", "im2col", "toeplitz:88", "toeplitz:24", "mxu:24"])
def test_forward_conv_impl_close(impl):
    """Full forward under each lowering stays within float-noise of the
    baseline posteriorgrams (event-level identity is gated on real TPU by
    tools/layout_ab.py)."""
    rng = np.random.default_rng(7)
    key = jax.random.PRNGKey(0)
    params = nmp.init_params(key)
    audio = jnp.asarray(rng.standard_normal((1, 43844)) * 0.1, jnp.float32)
    base = nmp.predict_fn(params, audio, conv_impl="conv")
    out = nmp.predict_fn(params, audio, conv_impl=impl)
    for k in ("note", "onset", "contour"):
        assert float(jnp.abs(base[k] - out[k]).max()) < 2e-5, (impl, k)


def test_conv_impl_validation():
    with pytest.raises(ValueError):
        nmp._resolve_conv_impl("nope")
    with pytest.raises(ValueError):
        nmp._resolve_conv_impl("conv:8")
    with pytest.raises(AssertionError):
        # non-divisor block size fails loudly at trace time
        x, w, bias = _int_case(3, 39, 8, 8, 264, t=4)
        nmp._conv2d_toeplitz(x, w, bias, (1, 1), None, fb=23)
