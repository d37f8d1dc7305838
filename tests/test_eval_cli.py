"""basic-pitch-eval CLI: scoring across input formats and directory mode.

The reference has no in-repo evaluation (SURVEY §5); this CLI makes the
framework's note-F1 metric (utils/eval.py, mir_eval.transcription
semantics) a user-facing tool. Tests build small ground-truth/estimate
fixtures in every accepted format (MIDI via the own SMF writer, the
predict CLI's CSV schema, GuitarSet-style JAMS) and check the scores and
exit codes; transcription mode (audio estimated side) rides the golden
clip against its own decoded MIDI, which must score F1 = 1.
"""

import json
import pathlib

import pytest

from basic_pitch_tpu.cli import eval as eval_cli
from basic_pitch_tpu.utils import midi as midi_io

NOTES = [
    (0.50, 1.00, 60),
    (1.20, 1.70, 64),
    (2.00, 2.60, 67),
    (3.10, 3.50, 72),
]


def write_midi(path: pathlib.Path, notes) -> None:
    inst = midi_io.Instrument(program=4)
    for start, end, pitch in notes:
        inst.notes.append(midi_io.Note(start=start, end=end, pitch=pitch, velocity=90))
    mf = midi_io.MidiFile()
    mf.instruments.append(inst)
    mf.write(path)


def write_csv(path: pathlib.Path, notes) -> None:
    lines = ["start_time_s,end_time_s,pitch_midi,velocity,pitch_bend"]
    lines += [f"{s},{e},{p},90" for s, e, p in notes]
    path.write_text("\n".join(lines) + "\n")


def write_jams(path: pathlib.Path, notes) -> None:
    data = [
        {"time": s, "duration": e - s, "value": float(p), "confidence": 1.0}
        for s, e, p in notes
    ]
    jam = {"annotations": [{"namespace": "note_midi", "data": data}]}
    path.write_text(json.dumps(jam))


def run(args):
    return eval_cli.main([str(a) for a in args])


def test_identical_midi_scores_one(tmp_path, capsys):
    est, ref = tmp_path / "est.mid", tmp_path / "ref.mid"
    write_midi(est, NOTES)
    write_midi(ref, NOTES)
    assert run([est, ref]) == 0
    out = capsys.readouterr().out
    assert "F1 1.0000" in out


@pytest.mark.parametrize("ref_writer, suffix", [(write_csv, ".csv"), (write_jams, ".jams")])
def test_reference_formats(tmp_path, capsys, ref_writer, suffix):
    est, ref = tmp_path / "est.mid", tmp_path / ("ref" + suffix)
    write_midi(est, NOTES)
    ref_writer(ref, NOTES)
    assert run([est, ref]) == 0
    assert "F1 1.0000" in capsys.readouterr().out


def test_partial_match_and_json_report(tmp_path, capsys):
    # estimate misses one note and adds a spurious one: P=R=3/4
    est_notes = NOTES[:3] + [(5.0, 5.4, 80)]
    est, ref = tmp_path / "est.mid", tmp_path / "ref.mid"
    write_midi(est, est_notes)
    write_midi(ref, NOTES)
    report_path = tmp_path / "report.json"
    assert run([est, ref, "--json", report_path]) == 0
    report = json.loads(report_path.read_text())
    onset = report["aggregate"]["onset"]
    assert onset["n_matched"] == 3
    assert onset["precision"] == pytest.approx(0.75)
    assert onset["recall"] == pytest.approx(0.75)
    assert onset["f1"] == pytest.approx(0.75)


def test_offset_criterion_is_stricter(tmp_path):
    # onsets aligned, offsets 2x too long -> onset criterion matches,
    # onset+offset criterion rejects everything
    est_notes = [(s, e + 2.0, p) for s, e, p in NOTES]
    est, ref = tmp_path / "est.mid", tmp_path / "ref.mid"
    write_midi(est, est_notes)
    write_midi(ref, NOTES)
    report_path = tmp_path / "r.json"
    assert run([est, ref, "--json", report_path]) == 0
    report = json.loads(report_path.read_text())
    assert report["aggregate"]["onset"]["f1"] == pytest.approx(1.0)
    assert report["aggregate"]["onset_offset"]["f1"] == 0.0


def test_directory_mode_micro_average(tmp_path, capsys):
    est_dir, ref_dir = tmp_path / "est", tmp_path / "ref"
    est_dir.mkdir()
    ref_dir.mkdir()
    # track a: perfect; track b: half the notes. predict-CLI stem suffix on
    # the estimated side must still pair with the bare reference stem.
    write_midi(est_dir / "a_basic_pitch.mid", NOTES)
    write_midi(ref_dir / "a.mid", NOTES)
    write_midi(est_dir / "b_basic_pitch.mid", NOTES[:2])
    write_midi(ref_dir / "b.mid", NOTES)
    write_midi(est_dir / "orphan.mid", NOTES)  # no reference -> warned, skipped
    report_path = tmp_path / "agg.json"
    assert run([est_dir, ref_dir, "--json", report_path]) == 0
    captured = capsys.readouterr()
    assert "no reference for 1 file(s)" in captured.err
    report = json.loads(report_path.read_text())
    onset = report["aggregate"]["onset"]
    # pooled: matched 6 of 8 reference notes, 6 estimated notes
    assert onset["n_matched"] == 6
    assert onset["n_reference"] == 8
    assert onset["n_estimated"] == 6
    assert len(report["per_file"]) == 2


def test_error_paths(tmp_path, capsys):
    est, ref = tmp_path / "est.mid", tmp_path / "ref.mid"
    write_midi(est, NOTES)
    assert run([est, tmp_path / "missing.mid"]) == 2
    write_midi(ref, NOTES)
    assert run([est, tmp_path]) == 2  # file vs directory mismatch
    bad = tmp_path / "bad.txt"
    bad.write_text("nope")
    with pytest.raises(ValueError, match="unsupported input type"):
        run([bad, ref])
    # audio on the reference side is rejected
    wav = tmp_path / "ref.wav"
    wav.write_bytes(b"RIFF")
    with pytest.raises(ValueError, match="estimated side"):
        run([est, wav])


def test_transcribe_mode_self_consistency(tmp_path, capsys):
    """Audio estimated side: transcribe the golden clip, score it against
    the MIDI decoded from the same events — must be a perfect match."""
    golden = pathlib.Path("/root/reference/tests/resources/vocadito_10.wav")
    if not golden.exists():
        pytest.skip("reference golden clip unavailable")
    from basic_pitch_tpu import inference
    from basic_pitch_tpu.decode import export

    _, _, events = inference.predict(str(golden))
    ref_mid = tmp_path / "vocadito_10.mid"
    export.note_events_to_midi(events).write(ref_mid)
    assert run([golden, ref_mid]) == 0
    assert "F1 1.0000" in capsys.readouterr().out
