"""Pallas decode kernel: parity with the XLA decoder (interpret mode).

The kernel's scan math is formula-identical to `decode/device.py`; these
tests pin (start, end, pitch) exactly and amplitudes to the same 2e-6
tolerance the XLA-vs-host-oracle contract uses (test_device_decode.py).
On real TPU hardware the same assertions were verified at bench scale
(54528 frames, 2797 notes) — see DESIGN.md §4d.
"""

import numpy as np
import pytest

import jax

from basic_pitch_tpu.decode import device as device_decode
from basic_pitch_tpu.decode import pallas_kernel


def _compare(frames, onsets, melodia, max_notes=2048, onset_t=0.5, frame_t=0.3, min_len=5):
    ref = jax.jit(
        lambda f, o: device_decode.decode(
            f, o, onset_t, frame_t, min_len, None, True, melodia,
            max_notes=max_notes, max_melodia_iters=4 * max_notes,
        )
    )(frames, onsets)
    out = pallas_kernel.decode_pallas(
        frames, onsets, onset_t, frame_t, min_len, melodia_trick=melodia,
        max_notes=max_notes, max_melodia_iters=4 * max_notes, interpret=True,
    )
    n1, n2 = int(ref.n_notes), int(out.n_notes)
    assert n1 == n2, (n1, n2)
    assert bool(ref.overflow) == bool(out.overflow)
    for field in ("starts", "ends", "pitches"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, field)[:n1]),
            np.asarray(getattr(out, field)[:n1]),
            err_msg=field,
        )
    np.testing.assert_allclose(
        np.asarray(ref.amplitudes[:n1]), np.asarray(out.amplitudes[:n1]), atol=2e-6
    )
    return n1


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_parity_with_melodia(seed):
    rng = np.random.RandomState(seed)
    frames = (rng.rand(300, 88) ** 3).astype(np.float32)
    onsets = (rng.rand(300, 88) ** 5).astype(np.float32)
    n = _compare(frames, onsets, melodia=True)
    assert n > 100  # meaningfully exercised


def test_onset_stage_only():
    rng = np.random.RandomState(3)
    frames = (rng.rand(300, 88) ** 3).astype(np.float32)
    onsets = (rng.rand(300, 88) ** 5).astype(np.float32)
    _compare(frames, onsets, melodia=False)


def test_multi_slab_timeline():
    """Timelines longer than SLAB exercise the carried slab-loop scans."""
    rng = np.random.RandomState(7)
    frames = (rng.rand(1500, 88) ** 3).astype(np.float32)
    onsets = (rng.rand(1500, 88) ** 5).astype(np.float32)
    _compare(frames, onsets, melodia=True)


def test_dense_low_thresholds():
    rng = np.random.RandomState(8)
    frames = (rng.rand(300, 88) ** 2).astype(np.float32)
    onsets = (rng.rand(300, 88) ** 4).astype(np.float32)
    _compare(frames, onsets, melodia=True, onset_t=0.3, frame_t=0.15)


def test_candidate_capacity_scales_with_frames():
    """Onset CANDIDATES exceeding max_notes must not flag overflow when the
    kept notes fit — the candidate list scales with T exactly like
    device.decode's (the long-recording fix), not with the note buffer."""
    T, max_notes = 6400, 2048
    frames = np.zeros((T, 88), np.float32)
    onsets = np.zeros((T, 88), np.float32)
    # ~3200 one-frame onset peaks whose notes are all too short to keep
    rng = np.random.RandomState(11)
    for t in range(2, T - 2, 2):
        f = rng.randint(0, 88)
        onsets[t, f] = 0.9  # strict local max in time (neighbours stay 0)
    ref = jax.jit(
        lambda f, o: device_decode.decode(
            f, o, 0.5, 0.3, 5, None, True, False, max_notes=max_notes
        )
    )(frames, onsets)
    out = pallas_kernel.decode_pallas(
        frames, onsets, 0.5, 0.3, 5, melodia_trick=False,
        max_notes=max_notes, interpret=True,
    )
    assert not bool(ref.overflow)
    assert not bool(out.overflow)
    assert int(ref.n_notes) == int(out.n_notes) == 0


def test_max_notes_not_lane_multiple():
    """A max_notes that is not a multiple of 128 must work (the kernel's
    aligned block stores run on an internally rounded-up buffer)."""
    rng = np.random.RandomState(12)
    frames = (rng.rand(300, 88) ** 3).astype(np.float32)
    onsets = (rng.rand(300, 88) ** 5).astype(np.float32)
    n = _compare(frames, onsets, melodia=True, max_notes=1000)
    assert n > 100


def test_long_sustained_notes_cross_slabs():
    """A note sustained across several slabs drives the scan-state carry."""
    frames = np.zeros((2100, 88), np.float32)
    onsets = np.zeros((2100, 88), np.float32)
    frames[10:2050, 40] = 0.9  # ~2040-frame note spanning two 1024-slabs
    onsets[9, 40] = 0.2
    onsets[10, 40] = 0.9
    onsets[11, 40] = 0.2
    n = _compare(frames, onsets, melodia=True)
    assert n >= 1


def test_backend_selection_cpu_semantics():
    """resolve(): explicit backends pass through; auto on the CPU backend
    picks xla without racing the interpreter; bad names raise."""
    import pytest

    from basic_pitch_tpu.decode import select

    assert select.resolve("xla") == "xla"
    assert select.resolve("pallas") == "pallas"
    result = select.probe(force=True)
    if result["platform"] == "cpu":
        assert result["backend"] == "xla"
        assert result["pallas_us_per_note"] is None
        assert "interpret" in result["note"]
    assert select.resolve("auto") == result["backend"]
    with pytest.raises(ValueError):
        select.resolve("gpu")
