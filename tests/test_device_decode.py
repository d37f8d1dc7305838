"""On-device decoder vs the host (numpy) oracle: fuzz + golden parity."""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basic_pitch_tpu.decode import device as dev
from basic_pitch_tpu.decode import notes as host

REF_FIXTURES = pathlib.Path("/root/reference/tests/resources/vocadito_10")


def _host_events(frames, onsets, config):
    return host.decode_note_events(frames.copy(), onsets.copy(), config)


def _device_events(frames, onsets, config, max_notes=512, max_iters=4096):
    decoded = jax.jit(
        dev.decode,
        static_argnames=("infer_onsets", "melodia_trick", "max_notes", "max_melodia_iters"),
    )(
        jnp.asarray(frames),
        jnp.asarray(onsets),
        config.onset_threshold,
        config.frame_threshold,
        config.min_note_length,
        infer_onsets=config.infer_onsets,
        melodia_trick=config.melodia_trick,
        energy_tol=config.energy_tolerance,
        max_notes=max_notes,
        max_melodia_iters=max_iters,
    )
    assert not bool(decoded.overflow)
    return [
        (s, e, p, a)
        for s, e, p, a, _ in dev.notes_to_events(decoded, None)
    ]


def _random_posteriorgrams(rng, n_frames, density=0.05):
    """Sparse blobby activations that exercise note structure."""
    frames = rng.rand(n_frames, 88).astype(np.float64) * 0.2
    onsets = rng.rand(n_frames, 88).astype(np.float64) * 0.2
    for _ in range(int(n_frames * 88 * density / 20)):
        t = rng.randint(0, n_frames - 5)
        f = rng.randint(0, 88)
        dur = rng.randint(3, min(40, n_frames - t))
        frames[t : t + dur, f] += 0.4 + 0.5 * rng.rand()
        onsets[t, f] += 0.5 + 0.5 * rng.rand()
    return np.clip(frames, 0, 1), np.clip(onsets, 0, 1)


def _assert_same(host_ev, device_ev):
    assert len(host_ev) == len(device_ev), (len(host_ev), len(device_ev), host_ev[:5], device_ev[:5])
    for h, d in zip(host_ev, device_ev):
        assert h[:3] == d[:3], (h, d)
        assert h[3] == pytest.approx(d[3], abs=2e-6), (h, d)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_matches_host_oracle(seed):
    rng = np.random.RandomState(seed)
    n_frames = rng.choice([40, 90, 173, 300])
    frames, onsets = _random_posteriorgrams(rng, n_frames)
    config = host.DecodeConfig(
        onset_threshold=rng.choice([0.3, 0.5]),
        frame_threshold=rng.choice([0.15, 0.3]),
        min_note_length=int(rng.choice([3, 5, 11])),
        melodia_trick=bool(seed % 2),
    )
    _assert_same(_host_events(frames, onsets, config), _device_events(frames, onsets, config))


def test_dense_energy_melodia():
    """Energy everywhere — stresses the melodia loop's zeroing/claiming."""
    rng = np.random.RandomState(99)
    frames = (0.35 + 0.3 * rng.rand(120, 88)).astype(np.float64)
    onsets = np.zeros_like(frames)
    config = host.DecodeConfig(min_note_length=5)
    _assert_same(
        _host_events(frames, onsets, config),
        _device_events(frames, onsets, config, max_notes=4096, max_iters=16384),
    )


def test_melodia_iterations_scale_with_length_not_note_count():
    """Regression: melodia pays one iteration per residual scrap, kept or
    not — dense short-scrap material needs far more iterations than final
    notes (measured ~45/audio-second on real vocals). The pipeline's cap is
    2*max_notes + 2*T; with a cap tied to note count alone this material
    spuriously overflowed into the (slow) host fallback."""
    rng = np.random.RandomState(5)
    n_frames, max_notes = 600, 16
    frames = np.zeros((n_frames, 88), np.float64)
    # ~300 isolated single-frame scraps: each costs one melodia iteration,
    # none survives the min-length filter
    for _ in range(300):
        t, f = rng.randint(1, n_frames - 1), rng.randint(1, 87)
        frames[t, f] = 0.5 + 0.4 * rng.rand()
    # plus a handful of real notes
    for i in range(5):
        t0 = 30 + 100 * i
        frames[t0 : t0 + 20, 40 + i] = 0.9
    onsets = np.zeros_like(frames)
    config = host.DecodeConfig(min_note_length=11)
    host_events = _host_events(frames, onsets, config)
    got = _device_events(
        frames, onsets, config,
        max_notes=max_notes,
        max_iters=2 * max_notes + 2 * n_frames,  # the pipeline's formula
    )
    _assert_same(host_events, got)
    assert len(host_events) >= 5


def test_edges_and_short_notes():
    rng = np.random.RandomState(7)
    frames = np.zeros((50, 88))
    onsets = np.zeros((50, 88))
    # note at very start and very end, too-short blips, neighbors
    frames[0:20, 10] = 0.9
    onsets[1, 10] = 0.9
    frames[35:50, 11] = 0.8
    onsets[36, 11] = 0.8
    frames[25:28, 40] = 0.9  # too short
    onsets[26, 40] = 0.9
    config = host.DecodeConfig(min_note_length=5)
    _assert_same(_host_events(frames, onsets, config), _device_events(frames, onsets, config))


def test_onset_rescale_tie_is_exact():
    """The rescale maps the frame-diff peak EXACTLY onto max(onsets); on TPU
    an x/x reciprocal-division could land 1 ulp off 1.0, breaking the tie
    with an adjacent predicted-onset max and shifting peak-picking by a
    frame (found on vocadito, round 3). The ratio is pinned to 1 at the
    peak; this pins the invariant and the host/device agreement around it."""
    n_frames, f = 40, 35
    frames = np.zeros((n_frames, 88), np.float32)
    onsets = np.zeros((n_frames, 88), np.float32)
    # energy ramp whose biggest jump is at t=15; predicted-onset max at t=16
    frames[10:30, f] = np.linspace(0.1, 0.95, 20, dtype=np.float32)
    frames[15, f] = 0.9  # largest frame-to-frame jump lands at t=15
    onsets[16, f] = 0.946964264  # the adjacent tie partner
    onsets[20, f] = 0.3

    # invariant: after preprocessing, scaled[argmax(frame_diff)] == max(onsets)
    pframes, ponsets = dev.preprocess(
        jnp.asarray(frames), jnp.asarray(onsets), None, infer_onsets=True
    )
    diffs = []
    for lag in (1, 2):
        padded = np.concatenate([np.zeros((lag, 88), np.float32), frames])
        diffs.append(padded[lag:] - padded[:-lag])
    fd = np.maximum(np.minimum(diffs[0], diffs[1]), 0.0)
    fd[:2] = 0
    t_peak = np.unravel_index(np.argmax(fd), fd.shape)
    assert float(np.asarray(ponsets)[t_peak]) == float(onsets.max())

    config = host.DecodeConfig(
        onset_threshold=0.5, frame_threshold=0.3, min_note_length=5,
        infer_onsets=True, melodia_trick=True,
    )
    _assert_same(
        _host_events(frames.astype(np.float64), onsets.astype(np.float64), config),
        _device_events(frames, onsets, config),
    )


@pytest.mark.skipif(not REF_FIXTURES.exists(), reason="reference fixtures unavailable")
def test_reference_golden_parity():
    mo = np.load(REF_FIXTURES / "model_output.npz", allow_pickle=True)["arr_0"].item()
    config = host.DecodeConfig()
    host_ev = _host_events(mo["note"], mo["onset"], config)
    device_ev = _device_events(mo["note"], mo["onset"], config)
    _assert_same(host_ev, device_ev)


@pytest.mark.skipif(not REF_FIXTURES.exists(), reason="reference fixtures unavailable")
def test_bend_matrix_matches_host():
    mo = np.load(REF_FIXTURES / "model_output.npz", allow_pickle=True)["arr_0"].item()
    config = host.DecodeConfig()
    frame_notes = host.decode_note_events(mo["note"].copy(), mo["onset"].copy(), config)
    host_bends = host.extract_pitch_bends(mo["contour"], frame_notes)
    bends = np.asarray(jax.jit(dev.bend_matrix)(jnp.asarray(mo["contour"])))
    for start, end, pitch, _, expected in host_bends:
        got = list(bends[start:end, pitch - host.MIDI_PITCH_OFFSET].astype(np.int64))
        assert got == list(expected), (start, end, pitch)


def test_freq_mask():
    frames = np.zeros((60, 88))
    onsets = np.zeros((60, 88))
    for f in (5, 40, 80):
        frames[10:40, f] = 0.9
        onsets[10, f] = 0.9
    mask = np.zeros(88, np.float32)
    mask[20:60] = 1.0
    decoded = jax.jit(dev.decode, static_argnames=("max_notes", "max_melodia_iters"))(
        jnp.asarray(frames), jnp.asarray(onsets), 0.5, 0.3, 5,
        freq_mask=jnp.asarray(mask), max_notes=64, max_melodia_iters=64,
    )
    events = dev.notes_to_events(decoded, None)
    assert len(events) == 1 and events[0][2] == 40 + host.MIDI_PITCH_OFFSET


@pytest.mark.parametrize("seed", range(4))
def test_padded_valid_frames_equivalence(seed):
    """Decoding a zero-padded matrix with valid_frames == T must equal
    decoding the unpadded matrix."""
    rng = np.random.RandomState(100 + seed)
    n_frames = int(rng.choice([50, 97, 173]))
    frames, onsets = _random_posteriorgrams(rng, n_frames)
    config = host.DecodeConfig(min_note_length=5)
    pad = 64
    fp = np.pad(frames, ((0, pad), (0, 0)))
    op = np.pad(onsets, ((0, pad), (0, 0)))
    decoded = jax.jit(
        dev.decode, static_argnames=("max_notes", "max_melodia_iters")
    )(
        jnp.asarray(fp), jnp.asarray(op),
        config.onset_threshold, config.frame_threshold, config.min_note_length,
        valid_frames=n_frames, max_notes=512, max_melodia_iters=4096,
    )
    device_ev = [(s, e, p, a) for s, e, p, a, _ in dev.notes_to_events(decoded, None)]
    _assert_same(_host_events(frames, onsets, config), device_ev)


@pytest.mark.parametrize("seed", range(2))
def test_garbage_beyond_valid_frames_ignored(seed):
    """valid_frames must silence the padded tail for BOTH stages: the
    melodia seed search scans the whole residual matrix, so above-threshold
    garbage past t_end (real model output from zero-padded audio — the
    bucketing use case) previously produced spurious notes."""
    rng = np.random.RandomState(400 + seed)
    n_frames = int(rng.choice([60, 120]))
    frames, onsets = _random_posteriorgrams(rng, n_frames)
    config = host.DecodeConfig(min_note_length=5)
    pad = 64
    fp = np.pad(frames, ((0, pad), (0, 0)))
    op = np.pad(onsets, ((0, pad), (0, 0)))
    fp[n_frames:] = 0.95  # dense above-threshold garbage in the tail
    op[n_frames:] = 0.9
    decoded = jax.jit(
        dev.decode, static_argnames=("max_notes", "max_melodia_iters")
    )(
        jnp.asarray(fp), jnp.asarray(op),
        config.onset_threshold, config.frame_threshold, config.min_note_length,
        valid_frames=n_frames, max_notes=512, max_melodia_iters=4096,
    )
    device_ev = [(s, e, p, a) for s, e, p, a, _ in dev.notes_to_events(decoded, None)]
    _assert_same(_host_events(frames, onsets, config), device_ev)


@pytest.mark.parametrize("seed", range(4))
def test_windowed_mode_matches_host_oracle(seed):
    """T > SCAN_WINDOW activates windowed scans; results must still match."""
    rng = np.random.RandomState(200 + seed)
    n_frames = dev.SCAN_WINDOW + int(rng.choice([50, 1000, 4000]))
    frames, onsets = _random_posteriorgrams(rng, n_frames, density=0.01)
    config = host.DecodeConfig(min_note_length=5)
    _assert_same(
        _host_events(frames, onsets, config),
        _device_events(frames, onsets, config, max_notes=4096, max_iters=16384),
    )


def test_windowed_long_note_fallback():
    """A sustained note longer than SCAN_WINDOW must take the exact
    full-length fallback path in both stages."""
    n_frames = 3 * dev.SCAN_WINDOW
    frames = np.zeros((n_frames, 88))
    onsets = np.zeros((n_frames, 88))
    long = dev.SCAN_WINDOW + 1234
    frames[100 : 100 + long, 30] = 0.9  # onset-anchored long note
    onsets[100, 30] = 0.9
    frames[6000 : 6000 + long, 60] = 0.8  # melodia long note (no onset)
    config = host.DecodeConfig(min_note_length=5)
    _assert_same(
        _host_events(frames, onsets, config),
        _device_events(frames, onsets, config, max_notes=64, max_iters=4096),
    )


def test_windowed_garbage_beyond_valid_frames_ignored():
    """Same valid_frames guard, windowed regime (T > SCAN_WINDOW)."""
    rng = np.random.RandomState(500)
    n_frames = dev.SCAN_WINDOW + 300
    frames, onsets = _random_posteriorgrams(rng, n_frames, density=0.01)
    config = host.DecodeConfig(min_note_length=5)
    pad = 200
    fp = np.pad(frames, ((0, pad), (0, 0)))
    op = np.pad(onsets, ((0, pad), (0, 0)))
    fp[n_frames:] = 0.95
    op[n_frames:] = 0.9
    decoded = jax.jit(
        dev.decode, static_argnames=("max_notes", "max_melodia_iters")
    )(
        jnp.asarray(fp), jnp.asarray(op),
        config.onset_threshold, config.frame_threshold, config.min_note_length,
        valid_frames=n_frames, max_notes=2048, max_melodia_iters=8192,
    )
    device_ev = [(s, e, p, a) for s, e, p, a, _ in dev.notes_to_events(decoded, None)]
    _assert_same(_host_events(frames, onsets, config), device_ev)


def test_windowed_padded_equivalence():
    rng = np.random.RandomState(300)
    n_frames = dev.SCAN_WINDOW + 500
    frames, onsets = _random_posteriorgrams(rng, n_frames, density=0.01)
    config = host.DecodeConfig(min_note_length=5)
    fp = np.pad(frames, ((0, 777), (0, 0)))
    op = np.pad(onsets, ((0, 777), (0, 0)))
    decoded = jax.jit(
        dev.decode, static_argnames=("max_notes", "max_melodia_iters")
    )(
        jnp.asarray(fp), jnp.asarray(op),
        config.onset_threshold, config.frame_threshold, config.min_note_length,
        valid_frames=n_frames, max_notes=2048, max_melodia_iters=8192,
    )
    device_ev = [(s, e, p, a) for s, e, p, a, _ in dev.notes_to_events(decoded, None)]
    _assert_same(_host_events(frames, onsets, config), device_ev)
