"""Note decoding: golden parity with the reference fixtures + unit behavior."""

import pathlib

import numpy as np
import pytest

from basic_pitch_tpu.decode import export, notes

REF_FIXTURES = pathlib.Path("/root/reference/tests/resources/vocadito_10")

needs_ref = pytest.mark.skipif(
    not REF_FIXTURES.exists(), reason="reference golden fixtures unavailable"
)


@needs_ref
def test_decode_matches_reference_note_events():
    """Running our decoder on the reference's golden posteriorgrams must
    reproduce its golden note events exactly — times, pitches, amplitudes,
    and pitch bends."""
    model_output = np.load(REF_FIXTURES / "model_output.npz", allow_pickle=True)["arr_0"].item()
    golden = np.load(REF_FIXTURES / "note_events.npz", allow_pickle=True)["arr_0"]

    _, events = export.model_output_to_notes(
        model_output, onset_thresh=0.5, frame_thresh=0.3, min_note_len=11
    )
    assert len(events) == len(golden)
    for mine, ref in zip(sorted(events), sorted(tuple(r) for r in golden)):
        assert mine[2] == ref[2]
        assert abs(mine[0] - ref[0]) < 1e-6 and abs(mine[1] - ref[1]) < 1e-6
        assert abs(mine[3] - ref[3]) < 1e-5
        ref_bends = ref[4] if isinstance(ref[4], (list, np.ndarray)) else None
        if ref_bends is None:
            assert mine[4] is None
        else:
            assert list(mine[4]) == list(ref_bends)


def test_local_maxima():
    x = np.array([[0.0], [1.0], [0.5], [0.7], [0.2]])
    mask = notes.local_maxima_along_time(x)
    assert mask[:, 0].tolist() == [False, True, False, True, False]


def test_infer_onsets_rescales_to_onset_max():
    onsets = np.zeros((10, 3))
    onsets[4, 1] = 0.8
    frames = np.zeros((10, 3))
    frames[5:, 2] = 1.0  # a sharp jump at t=5
    merged = notes.infer_onsets_from_frames(onsets, frames)
    assert merged[4, 1] == 0.8
    assert merged[5, 2] == pytest.approx(0.8)  # rescaled to onset max
    assert merged.min() >= 0


def test_constrain_frequency():
    onsets = np.ones((5, 88))
    frames = np.ones((5, 88))
    o, f = notes.constrain_frequency(onsets, frames, max_freq=440.0, min_freq=110.0)
    # 110 Hz = A2 = midi 45 -> idx 24; 440 Hz = A4 = midi 69 -> idx 48
    assert o[:, :24].sum() == 0 and f[:, :24].sum() == 0
    assert o[:, 48:].sum() == 0 and f[:, 48:].sum() == 0
    assert o[:, 24:48].all()


def test_simple_note_decoding():
    """A sustained high-energy band with a clear onset becomes one note."""
    n_t = 100
    frames = np.zeros((n_t, 88), dtype=np.float64)
    onsets = np.zeros_like(frames)
    frames[20:60, 40] = 0.9
    onsets[20, 40] = 0.9
    onsets[19, 40] = 0.1  # make t=20 a strict local max
    onsets[21, 40] = 0.1
    config = notes.DecodeConfig(melodia_trick=False)
    events = notes.decode_note_events(frames, onsets, config)
    assert len(events) == 1
    start, end, pitch, amp = events[0]
    assert start == 20 and pitch == 40 + notes.MIDI_PITCH_OFFSET
    assert 55 <= end <= 61
    assert amp == pytest.approx(0.9, rel=0.1)


def test_melodia_trick_finds_onsetless_notes():
    frames = np.zeros((100, 88))
    frames[30:70, 50] = 0.8  # no onset at all
    onsets = np.zeros_like(frames)
    no_melodia = notes.decode_note_events(frames, onsets, notes.DecodeConfig(melodia_trick=False))
    with_melodia = notes.decode_note_events(frames, onsets, notes.DecodeConfig(melodia_trick=True))
    assert len(no_melodia) == 0
    assert len(with_melodia) == 1
    assert with_melodia[0][2] == 50 + notes.MIDI_PITCH_OFFSET


def test_min_note_length_filters():
    frames = np.zeros((100, 88))
    frames[10:18, 30] = 0.9  # 8 frames, below default min length 11
    onsets = np.zeros_like(frames)
    onsets[10, 30] = 0.9
    events = notes.decode_note_events(frames, onsets, notes.DecodeConfig())
    assert events == []


def test_drop_overlapping_pitch_bends():
    """Truth table mirroring the reference unit test
    (`/root/reference/tests/test_note_creation.py:21-50`)."""
    bends = [1, 2, 3]
    no_overlap = [(0.0, 1.0, 60, 0.5, bends), (1.0, 2.0, 62, 0.5, bends)]
    out = export.drop_overlapping_pitch_bends(list(no_overlap))
    assert all(e[4] == bends for e in out)

    overlap = [(0.0, 1.5, 60, 0.5, bends), (1.0, 2.0, 62, 0.5, bends)]
    out = export.drop_overlapping_pitch_bends(list(overlap))
    assert all(e[4] is None for e in out)

    mixed = [(0.0, 1.5, 60, 0.5, bends), (1.0, 2.0, 62, 0.5, bends), (3.0, 4.0, 64, 0.5, bends)]
    out = export.drop_overlapping_pitch_bends(list(mixed))
    assert out[0][4] is None and out[1][4] is None and out[2][4] == bends


def test_model_frames_to_time_window_correction():
    times = notes.model_frames_to_time(400)
    # monotonically increasing
    assert np.all(np.diff(times) > 0)
    # one full window later, the cumulative correction has been applied once
    expected_offset = (256 / 22050) * (172 - 43844 / 256) + notes.MAGIC_ALIGNMENT_OFFSET
    assert times[172] == pytest.approx(172 * 256 / 22050 - expected_offset)


def test_drop_overlapping_pitch_bends_tied_tuples():
    # two events tying on (start, end, pitch, amplitude) with list/None bend
    # payloads: a bare sorted() would raise TypeError comparing list with None
    tied = [(0.0, 1.0, 60, 0.5, [1, 2]), (0.0, 1.0, 60, 0.5, None)]
    out = export.drop_overlapping_pitch_bends(list(tied))
    assert len(out) == 2
    assert all(e[4] is None for e in out)  # they overlap each other


def test_zero_velocity_notes_dropped():
    # reference (pretty_midi) writes round(127*amp)=0 as note-on velocity 0,
    # which SMF players treat as note-off; we drop the note to match rendered
    # output
    events = [(0.0, 1.0, 60, 0.003, None), (1.0, 2.0, 62, 0.5, None)]
    midi = export.note_events_to_midi(events)
    all_notes = [n for inst in midi.instruments for n in inst.notes]
    assert len(all_notes) == 1
    assert all_notes[0].pitch == 62


def test_reference_named_aliases():
    """Code ported from the reference calls these exact names; they must
    produce the same events as the canonically named functions."""
    import numpy as np

    from basic_pitch_tpu.decode import notes as notes_mod
    from basic_pitch_tpu import inference

    rng = np.random.RandomState(5)
    frames = (rng.rand(120, 88) ** 3).astype(np.float32)
    onsets = (rng.rand(120, 88) ** 5).astype(np.float32)
    ref_sig = notes_mod.output_to_notes_polyphonic(
        frames, onsets, 0.5, 0.3, 5, True, None, None
    )
    canonical = notes_mod.decode_note_events(
        frames, onsets, notes_mod.DecodeConfig(min_note_length=5)
    )
    assert ref_sig == canonical
    assert len(canonical) > 0

    onsets2 = notes_mod.get_infered_onsets(onsets, frames)
    np.testing.assert_array_equal(
        onsets2, notes_mod.infer_onsets_from_frames(onsets, frames)
    )

    contours = (rng.rand(120, 264) ** 2).astype(np.float32)
    assert notes_mod.get_pitch_bends(contours, canonical) == notes_mod.extract_pitch_bends(
        contours, canonical
    )
    assert inference.DEFAULT_MINIMUM_MIDI_TEMPO == inference.DEFAULT_MIDI_TEMPO
