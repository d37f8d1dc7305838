"""MIDI writer: SMF structure, VLQ encoding, synthesis."""

import struct

import numpy as np
import pytest

from basic_pitch_tpu.utils import midi as midi_io
from basic_pitch_tpu.utils.midi import _vlq


def test_vlq_encoding():
    assert _vlq(0) == b"\x00"
    assert _vlq(0x7F) == b"\x7f"
    assert _vlq(0x80) == b"\x81\x00"
    assert _vlq(0x3FFF) == b"\xff\x7f"
    assert _vlq(0x4000) == b"\x81\x80\x00"
    with pytest.raises(ValueError):
        _vlq(-1)


def _parse_smf(data: bytes):
    assert data[:4] == b"MThd"
    length, fmt, n_tracks, resolution = struct.unpack(">IHHH", data[4:14])
    assert length == 6
    tracks = []
    pos = 14
    for _ in range(n_tracks):
        assert data[pos : pos + 4] == b"MTrk"
        (tlen,) = struct.unpack(">I", data[pos + 4 : pos + 8])
        tracks.append(data[pos + 8 : pos + 8 + tlen])
        pos += 8 + tlen
    assert pos == len(data)
    return fmt, resolution, tracks


def test_write_structure(tmp_path):
    midi = midi_io.MidiFile(tempo=120)
    inst = midi_io.Instrument(program=4)
    inst.notes.append(midi_io.Note(start=0.0, end=0.5, pitch=60, velocity=100))
    inst.notes.append(midi_io.Note(start=0.5, end=1.0, pitch=64, velocity=90))
    inst.pitch_bends.append(midi_io.PitchBend(time=0.1, value=1000))
    midi.instruments.append(inst)

    path = tmp_path / "out.mid"
    midi.write(path)
    fmt, resolution, tracks = _parse_smf(path.read_bytes())
    assert fmt == 1
    assert resolution == midi_io.DEFAULT_RESOLUTION
    assert len(tracks) == 2  # tempo track + one instrument

    # tempo meta: 120 BPM = 500000 us/quarter
    assert tracks[0][:7] == b"\x00\xff\x51\x03" + (500000).to_bytes(3, "big")

    body = tracks[1]
    assert body[1] == 0xC0 and body[2] == 4  # program change to E.Piano 1
    # count note-ons and note-offs
    ons = body.count(b"\x90")
    offs = body.count(b"\x80")
    assert ons >= 2 and offs >= 2
    assert b"\xe0" in body  # pitch bend present


def test_note_timing_ticks(tmp_path):
    midi = midi_io.MidiFile(tempo=120, resolution=220)
    # 1 second at 120 BPM = 2 quarters = 440 ticks
    assert midi._seconds_to_ticks(1.0) == 440


def test_synthesize_tone():
    midi = midi_io.MidiFile()
    inst = midi_io.Instrument()
    inst.notes.append(midi_io.Note(start=0.0, end=1.0, pitch=69, velocity=127))  # A4
    midi.instruments.append(inst)
    y = midi.synthesize(8000)
    assert len(y) >= 8000
    spec = np.abs(np.fft.rfft(y[:8000] * np.hanning(8000)))
    peak_hz = spec.argmax()  # 1s window -> bin = Hz
    assert abs(peak_hz - 440) <= 2


def test_synthesize_empty():
    y = midi_io.MidiFile().synthesize(8000)
    assert y.shape == (0,) or np.allclose(y, 0)


def test_percussion_channel_skipped(tmp_path):
    midi = midi_io.MidiFile()
    for _ in range(11):
        inst = midi_io.Instrument()
        inst.notes.append(midi_io.Note(0.0, 0.1, 60, 100))
        midi.instruments.append(inst)
    path = tmp_path / "many.mid"
    midi.write(path)
    _, _, tracks = _parse_smf(path.read_bytes())
    for body in tracks[1:]:
        channels = {b & 0x0F for b in body if (b & 0xF0) in (0x90, 0x80)}
        assert 9 not in channels  # GM drums channel never used


def test_distinct_channels_for_concurrent_bending_instruments(tmp_path):
    # 12 simultaneous pitches in multiple_pitch_bends style: every instrument
    # must land on its own channel (none on drums ch 9) so bends don't bleed
    midi = midi_io.MidiFile()
    for k in range(12):
        inst = midi_io.Instrument()
        inst.notes.append(midi_io.Note(0.0, 1.0, 48 + k, 100))
        inst.pitch_bends.append(midi_io.PitchBend(0.5, 1000 + k))
        midi.instruments.append(inst)
    path = tmp_path / "twelve.mid"
    midi.write(path)
    _, _, tracks = _parse_smf(path.read_bytes())
    channels = []
    for body in tracks[1:]:
        chans = {b & 0x0F for b in body if (b & 0xF0) == 0x90 and b >= 0x80}
        assert len(chans) == 1
        channels.append(chans.pop())
    assert 9 not in channels
    assert len(set(channels)) == len(channels) == 12


def test_sonify_salience_saved_wav_not_clipped(tmp_path):
    """Regression companion to the resample gain fix: the saved 44.1 kHz
    render (3000 -> 44100, up=147) must stay in [-1, 1], not clip at 147x."""
    import numpy as np

    from basic_pitch_tpu.decode import export
    from basic_pitch_tpu.utils import audio as audio_io

    gram = np.zeros((88, 50), np.float32)
    gram[40, :] = 0.9
    path = tmp_path / "salience.wav"
    y, fs = export.sonify_salience(gram, 1, save_path=str(path))
    assert fs == export.SONIFY_FS and np.abs(y).max() <= 0.81
    saved, sr = audio_io.read_wav(path)
    assert sr == 44100
    assert np.abs(saved).max() < 1.0  # clipped output would pin at +/-1.0
