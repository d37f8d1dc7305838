"""Command-line interfaces: parser surfaces and end-to-end invocation."""

import pathlib
import sys

import numpy as np
import pytest

VOCADITO = pathlib.Path("/root/reference/tests/resources/vocadito_10.wav")


def test_predict_parser_flags():
    from basic_pitch_tpu.cli.predict import build_parser

    parser = build_parser()
    args = parser.parse_args(
        [
            "/tmp/out", "a.wav", "b.wav",
            "--onset-threshold", "0.6",
            "--frame-threshold", "0.2",
            "--minimum-note-length", "100",
            "--minimum-frequency", "100",
            "--maximum-frequency", "2000",
            "--multiple-pitch-bends",
            "--no-melodia",
            "--sonify-midi",
            "--save-model-outputs",
            "--save-note-events",
            "--midi-tempo", "90",
        ]
    )
    assert args.audio_paths == ["a.wav", "b.wav"]
    assert args.onset_threshold == 0.6
    assert args.melodia_trick is False
    assert args.multiple_pitch_bends is True
    assert args.save_midi is True


def test_cli_help_smoke():
    """`--help` on every CLI must exit 0 and print usage — the reference
    CI's installed-CLI smoke check (tox.yml:52-53). The import chain stays
    jax-free by design (models/params defers its jax import), though this
    box pre-imports jax at interpreter startup so that is asserted in-proc."""
    import subprocess

    # the CLI modules themselves must not pull jax in (checked in-process
    # by importing them fresh under a tracer is unreliable here because the
    # interpreter pre-imports jax; instead assert the known-lazy modules)
    import basic_pitch_tpu.models.params as params_mod

    assert "jax" not in params_mod.__dict__, "params must defer its jax import"

    for mod in ("basic_pitch_tpu.cli.predict", "basic_pitch_tpu.cli.train",
                "basic_pitch_tpu.cli.download"):
        proc = subprocess.run(
            [sys.executable, "-m", mod, "--help"], capture_output=True, timeout=60
        )
        assert proc.returncode == 0, (mod, proc.stderr.decode()[-500:])
        assert b"usage" in proc.stdout.lower()


def test_predict_cli_end_to_end(tmp_path, monkeypatch):
    if not VOCADITO.exists():
        pytest.skip("test clip unavailable")
    from basic_pitch_tpu.cli import predict as cli_predict

    monkeypatch.setattr(
        sys, "argv", ["basic-pitch", str(tmp_path), str(VOCADITO), "--save-note-events"]
    )
    cli_predict.main()
    assert (tmp_path / "vocadito_10_basic_pitch.mid").exists()
    assert (tmp_path / "vocadito_10_basic_pitch.csv").exists()


def test_predict_cli_streaming_matches_windowed_path(tmp_path, monkeypatch):
    """--streaming must produce the same note events (CSV) as the default
    path, via the batched StreamingTranscriber (BASELINE config 2)."""
    if not VOCADITO.exists():
        pytest.skip("test clip unavailable")
    from basic_pitch_tpu.cli import predict as cli_predict

    out_default, out_streaming = tmp_path / "default", tmp_path / "streaming"
    out_default.mkdir(), out_streaming.mkdir()
    monkeypatch.setattr(
        sys, "argv",
        ["basic-pitch", str(out_default), str(VOCADITO), "--save-note-events"],
    )
    cli_predict.main()
    monkeypatch.setattr(
        sys, "argv",
        ["basic-pitch", str(out_streaming), str(VOCADITO), "--save-note-events",
         "--streaming", "--save-model-outputs", "--sonify-midi"],
    )
    cli_predict.main()

    csv_default = (out_default / "vocadito_10_basic_pitch.csv").read_text()
    csv_streaming = (out_streaming / "vocadito_10_basic_pitch.csv").read_text()
    assert csv_streaming == csv_default
    assert (out_streaming / "vocadito_10_basic_pitch.mid").exists()
    assert (out_streaming / "vocadito_10_basic_pitch.npz").exists()
    assert (out_streaming / "vocadito_10_basic_pitch.wav").exists()
    # posteriorgrams from the streaming path match the windowed model's
    post = np.load(out_streaming / "vocadito_10_basic_pitch.npz", allow_pickle=True)[
        "basic_pitch_model_output"
    ].item()
    assert set(post) == {"note", "onset", "contour"}


def test_train_parser_datasets_required(monkeypatch, capsys):
    from basic_pitch_tpu.cli.train import console_entry_point

    monkeypatch.setattr(sys, "argv", ["basic-pitch-train", "--source", "/x", "--output", "/y"])
    with pytest.raises(SystemExit):
        console_entry_point()
    assert "at least one dataset" in capsys.readouterr().err


def test_download_dispatch_table():
    from basic_pitch_tpu.cli.download import _dispatch_table

    table = _dispatch_table()
    assert set(table) == {"guitarset", "ikala", "maestro", "medleydb_pitch", "slakh"}
    for build_parser, run in table.values():
        parser = build_parser()
        args = parser.parse_args(["--source", "/s", "--destination", "/d"])
        assert args.source == "/s"
