"""utils/flops.py — the MFU denominator must stay exact arithmetic."""

import numpy as np

from basic_pitch_tpu import constants
from basic_pitch_tpu.utils import flops


def test_heads_flops_matches_hand_count():
    # contour_conv alone: 2 * (172*264*8 outputs) * (3*39*8 macs)
    hand_contour = 2 * (172 * 264 * 8) * (3 * 39 * 8)
    total = flops.heads_forward_flops()
    assert total > hand_contour
    # the full hand tally of all seven convs (stride-3 SAME width = 88)
    t, f, f3 = 172, 264, 88
    hand = (
        2 * t * f * 8 * (3 * 39 * 8)
        + 2 * t * f * 1 * (5 * 5 * 8)
        + 2 * t * f3 * 32 * (7 * 7 * 1)
        + 2 * t * f3 * 1 * (7 * 3 * 32)
        + 2 * t * f3 * 32 * (5 * 5 * 8)
        + 2 * t * f3 * 1 * (3 * 3 * 33)
    )
    assert total == hand


def test_cqt_flops_scale_with_length():
    short = flops.cqt_forward_flops(n_samples=constants.AUDIO_N_SAMPLES)
    # decimation work scales with samples; kernel matmuls with frames
    assert short > 0
    double = flops.cqt_forward_flops(n_samples=2 * constants.AUDIO_N_SAMPLES)
    assert 1.5 * short < double < 2.5 * short


def test_train_step_is_three_forwards():
    assert flops.train_step_flops_per_window() == 3 * flops.window_forward_flops()


def test_mfu_report_math():
    # 1 TFLOP in 1 s on a v5e: 1/197 of bf16 peak, 6/197 of HIGHEST peak
    r = flops.mfu_report(1e12, 1.0, "TPU v5 lite0")
    assert abs(r["achieved_tflops"] - 1.0) < 1e-6
    np.testing.assert_allclose(r["mfu_pct_vs_bf16_peak"], 100.0 / 197.0, atol=0.01)
    np.testing.assert_allclose(
        r["mfu_pct_vs_fp32_highest_peak"], 600.0 / 197.0, atol=0.01
    )


def test_unknown_device_omits_mfu():
    r = flops.mfu_report(1e12, 1.0, "CPU x86_64")
    assert "mfu_pct_vs_bf16_peak" not in r
    assert flops.peak_tflops("CPU x86_64") is None
