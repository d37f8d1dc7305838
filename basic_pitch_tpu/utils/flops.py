"""Analytic FLOP accounting for the NMP pipeline — the MFU denominator.

Every shape in the model is static, so the FLOPs of one forward window are
exact build-time arithmetic: the CQT is a chain of dense matmuls
(`ops/cqt.py` — per-octave kernel matmul + stride-2 decimation matmuls) and
the three heads are seven SAME-padded convs (`models/nmp.py`). Elementwise
work (BN, sigmoid, harmonic stack, normalized-log) is O(activations) and is
deliberately excluded, per standard MFU practice — matmul/conv FLOPs are the
MXU-occupying work.

Used by `bench.py` (inference MFU) and `tools/train_bench.py` (train-step
MFU). The reference publishes no utilization numbers at all (SURVEY.md §6);
this module is what lets the bench say how far from the roofline the chip is
running rather than only reporting wall-clock xRT.
"""

from __future__ import annotations

from typing import Dict

from basic_pitch_tpu import constants

# Peak matmul throughput per chip, by `jax.devices()[0].device_kind`.
# bf16 figures are the published per-chip numbers; Precision.HIGHEST runs
# fp32-accurate matmuls as 6 bf16 MXU passes, so its effective peak is
# bf16_peak / 6 (the number the fp32 pipeline should be judged against).
_BF16_PEAK_TFLOPS: Dict[str, float] = {
    "TPU v5 lite": 197.0,  # v5e
    "TPU v5": 459.0,  # v5p
    "TPU v4": 275.0,
    "TPU v6 lite": 918.0,  # v6e / Trillium
}
_HIGHEST_PRECISION_PASSES = 6


def _dec_matmul_flops(n_out: int, stride: int = 2, block: int = 128) -> int:
    """FLOPs of one `strided_blocked_matmul` producing n_out samples.

    Each 128-sample output block is a (2*stride*block, block) dot against a
    two-block input segment (`ops/cqt.py:strided_toeplitz_matrix`).
    """
    n_blocks = -(-n_out // block)
    return 2 * n_blocks * (2 * stride * block) * block


def cqt_forward_flops(n_samples: int = constants.AUDIO_N_SAMPLES, n_harmonics: int = 8) -> int:
    """Exact matmul FLOPs of `ops.cqt.cqt_magnitude` on one (1, n_samples) window."""
    from basic_pitch_tpu.models import nmp
    from basic_pitch_tpu.ops import cqt as cqt_ops

    kernels = nmp.cqt_kernels_for(n_harmonics)
    total = 0
    length = n_samples
    if kernels.downsample_factor > 1:
        n_out = cqt_ops.decimated_length(length, kernels.downsample_factor)
        total += _dec_matmul_flops(n_out, kernels.downsample_factor)
        length = n_out
    n_frames = cqt_ops.cqt_frame_count(length, kernels.cascade_hop)
    for octave in range(kernels.n_octaves):
        if octave > 0:
            length = cqt_ops.decimated_length(length)
            total += _dec_matmul_flops(length)
        # (n_frames, n_fft) x (n_fft, 2*n_filters) per octave
        total += 2 * n_frames * kernels.n_fft * 2 * kernels.n_filters
    return total


def _conv_flops(out_h: int, out_w: int, cout: int, kh: int, kw: int, cin: int) -> int:
    return 2 * out_h * out_w * cout * kh * kw * cin


def heads_forward_flops(n_harmonics: int = 8) -> int:
    """Exact conv FLOPs of the three NMP heads on one window (`models/nmp.py`)."""
    t = constants.ANNOT_N_FRAMES  # 172
    f = constants.N_FREQ_BINS_CONTOURS  # 264
    f3 = -(-f // 3)  # stride-3 SAME output width: 88
    nh = n_harmonics
    total = 0
    total += _conv_flops(t, f, 8, 3, 39, nh)  # contour_conv
    total += _conv_flops(t, f, 1, 5, 5, 8)  # contour_out
    total += _conv_flops(t, f3, 32, 7, 7, 1)  # note_conv (stride (1,3))
    total += _conv_flops(t, f3, 1, 7, 3, 32)  # note_out
    total += _conv_flops(t, f3, 32, 5, 5, nh)  # onset_conv (stride (1,3))
    total += _conv_flops(t, f3, 1, 3, 3, 32 + 1)  # onset_out
    return total


def window_forward_flops(n_harmonics: int = 8) -> int:
    """Matmul+conv FLOPs of one forward pass over one 43844-sample window."""
    return cqt_forward_flops(n_harmonics=n_harmonics) + heads_forward_flops(n_harmonics)


def train_step_flops_per_window(n_harmonics: int = 8) -> int:
    """Forward + backward: dgrad and wgrad each cost one forward's FLOPs."""
    return 3 * window_forward_flops(n_harmonics)


def peak_tflops(device_kind: str, precision: str = "highest") -> "float | None":
    """Per-chip peak for the given matmul precision ('bf16' or 'highest').

    Returns None when the device kind has no table entry (CPU backend etc.)
    so callers can omit MFU rather than report it against a wrong peak.
    """
    bf16 = None
    for prefix in sorted(_BF16_PEAK_TFLOPS, key=len, reverse=True):
        if device_kind.startswith(prefix):
            bf16 = _BF16_PEAK_TFLOPS[prefix]
            break
    if bf16 is None:
        return None
    if precision == "bf16":
        return bf16
    return bf16 / _HIGHEST_PRECISION_PASSES


def mfu_report(total_flops: float, device_s: float, device_kind: str) -> Dict[str, float]:
    """Measured FLOP rate + MFU vs both the bf16 and fp32-HIGHEST peaks."""
    achieved_tflops = total_flops / max(device_s, 1e-9) / 1e12
    out = {"achieved_tflops": round(achieved_tflops, 3)}
    bf16 = peak_tflops(device_kind, "bf16")
    if bf16 is not None:
        out["mfu_pct_vs_bf16_peak"] = round(100.0 * achieved_tflops / bf16, 2)
        out["mfu_pct_vs_fp32_highest_peak"] = round(
            100.0 * achieved_tflops / (bf16 / _HIGHEST_PRECISION_PASSES), 2
        )
    return out


def _self_check() -> None:  # pragma: no cover - debugging aid
    fwd = window_forward_flops()
    print(f"cqt:   {cqt_forward_flops()/1e6:.1f} MFLOP/window")
    print(f"heads: {heads_forward_flops()/1e6:.1f} MFLOP/window")
    print(f"fwd:   {fwd/1e9:.3f} GFLOP/window")
    print(f"train: {train_step_flops_per_window()/1e9:.3f} GFLOP/window")


if __name__ == "__main__":  # pragma: no cover
    _self_check()
