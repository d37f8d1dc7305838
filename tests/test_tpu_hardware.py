"""Real-hardware checks, run only with RUN_TPU_TESTS=1 (conftest skips
them otherwise and pins the suite to CPU).

These re-assert the CPU-verified contracts on an actual TPU backend: the
golden end-to-end events, the Pallas decode kernel's exactness against the
XLA decoder (compiled, not interpret mode), and the PCM codec round trip
through real device programs.
"""

import pathlib

import numpy as np
import pytest

VOCADITO = pathlib.Path("/root/reference/tests/resources/vocadito_10.wav")

pytestmark = pytest.mark.tpu


def _require_tpu():
    import jax

    if jax.devices()[0].platform == "cpu":
        pytest.skip("no TPU backend available")


def test_golden_events_on_hardware():
    _require_tpu()
    if not VOCADITO.exists():
        pytest.skip("test clip unavailable")
    from basic_pitch_tpu import pipeline
    from basic_pitch_tpu.utils import audio as audio_io

    samples, sr = audio_io.read_wav(str(VOCADITO))
    tr = pipeline.StreamingTranscriber(windows_per_chunk=32)
    events = tr.transcribe(audio_io.to_mono(samples), sr)
    assert len(events) == 28  # the reference's golden event count


def test_pallas_decoder_exact_on_hardware():
    _require_tpu()
    import jax
    import jax.numpy as jnp

    from basic_pitch_tpu.decode import device as device_decode
    from basic_pitch_tpu.decode import pallas_kernel

    rng = np.random.RandomState(0)
    frames = (rng.rand(300, 88) ** 3).astype(np.float32)
    onsets = (rng.rand(300, 88) ** 5).astype(np.float32)
    ref = jax.jit(
        lambda f, o: device_decode.decode(f, o, 0.5, 0.3, 5, max_notes=2048)
    )(frames, onsets)
    out = pallas_kernel.decode_pallas(
        jnp.asarray(frames), jnp.asarray(onsets), 0.5, 0.3, 5, max_notes=2048
    )
    n = int(ref.n_notes)
    assert n == int(out.n_notes) and n > 100
    for field in ("starts", "ends", "pitches"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, field)[:n]), np.asarray(getattr(out, field)[:n])
        )
    np.testing.assert_allclose(
        np.asarray(ref.amplitudes[:n]), np.asarray(out.amplitudes[:n]), atol=2e-6
    )


def test_decoder_microbench_artifact(tmp_path, monkeypatch):
    """The decode-backend probe measures BOTH backends on hardware and the
    micro-bench tool records an auditable artifact (VERDICT r2 #6)."""
    _require_tpu()
    from basic_pitch_tpu.decode import select

    result = select.probe(n_frames=300, force=True)
    assert result["platform"] != "cpu"
    assert result["xla_us_per_note"] > 0
    assert result["backend"] in ("xla", "pallas")
    # the pallas side either measured or documented why not
    assert result["pallas_us_per_note"] is not None or "note" in result

    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))
    import decoder_microbench

    decoder_microbench.main()
    report = pathlib.Path(__file__).parent.parent / "tools" / "decoder_bench.json"
    assert report.exists()
    import json

    data = json.loads(report.read_text())
    assert data["auto_selects"] in ("xla", "pallas")
    assert len(data["measurements"]) == 3


def test_pallas_decoder_constant_vmem_past_old_gate():
    """The constant-VMEM kernel (slab-carried scans + block-max tables)
    compiles and matches the XLA decoder at 109,056 frames — the exact
    scale that blew the 16 MB scoped-VMEM budget under the old
    timeline-resident design (DESIGN §4d round-3 update). Guards the
    pipeline's PALLAS_MAX_FRAMES=2M gate."""
    _require_tpu()
    import jax
    import jax.numpy as jnp

    from basic_pitch_tpu.decode import device as device_decode
    from basic_pitch_tpu.decode import pallas_kernel

    T = 109_056  # 2x the old 54,528-frame compile ceiling
    rng = np.random.RandomState(1)
    frames = np.zeros((T, 88), np.float32)
    onsets = np.zeros((T, 88), np.float32)
    # sparse synthetic notes spread over the whole timeline so every
    # block-table band sees both empty and occupied blocks
    for k in range(400):
        t0 = int(rng.randint(0, T - 64))
        row = int(rng.randint(0, 88))
        frames[t0 : t0 + 24, row] = 0.9
        onsets[t0, row] = 0.8
    kwargs = dict(max_notes=2048, melodia_trick=True, max_melodia_iters=8192)
    ref = jax.jit(
        lambda f, o: device_decode.decode(f, o, 0.5, 0.3, 5, **kwargs)
    )(frames, onsets)
    out = pallas_kernel.decode_pallas(
        jnp.asarray(frames), jnp.asarray(onsets), 0.5, 0.3, 5, **kwargs
    )
    n = int(ref.n_notes)
    assert n == int(out.n_notes) and n > 200
    for field in ("starts", "ends", "pitches"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, field)[:n]), np.asarray(getattr(out, field)[:n])
        )
    np.testing.assert_allclose(
        np.asarray(ref.amplitudes[:n]), np.asarray(out.amplitudes[:n]), atol=2e-6
    )


def test_auto_backend_transcribes_on_hardware():
    """decode_backend='auto' resolves to the measured winner and the
    resulting pipeline still produces the golden events."""
    _require_tpu()
    if not VOCADITO.exists():
        pytest.skip("test clip unavailable")
    from basic_pitch_tpu import pipeline
    from basic_pitch_tpu.utils import audio as audio_io

    samples, sr = audio_io.read_wav(str(VOCADITO))
    tr = pipeline.StreamingTranscriber(windows_per_chunk=32, decode_backend="auto")
    assert tr.decode_backend in ("xla", "pallas")
    events = tr.transcribe(audio_io.to_mono(samples), sr)
    assert len(events) == 28


def test_train_bench_miniature_on_hardware(tmp_path):
    """The full TRAIN_BENCH pipeline (corpus -> ETL -> loader -> timed train
    steps -> held-out predict-path eval) runs on the real chip and records a
    coherent artifact (VERDICT r2 #1; full run: tools/train_bench.py)."""
    _require_tpu()
    import json
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))
    import train_bench

    out = tmp_path / "TRAIN_BENCH_mini.json"
    report = train_bench.main(
        [
            "--tracks", "10", "--seconds", "10", "--steps", "40",
            "--workdir", str(tmp_path / "wd"), "--out", str(out),
        ]
    )
    assert out.exists()
    detail = json.loads(out.read_text())["detail"]
    assert detail["final_loss"] < detail["first_loss"]
    assert 0.0 <= detail["loader_feed_margin"] <= 1.0
    assert detail["n_heldout_tracks"] >= 1  # 10 tracks -> 1 test track
    assert report["value"] > 0


def test_pcm_codec_roundtrip_on_hardware():
    _require_tpu()
    from basic_pitch_tpu.ops import pcmcodec

    rng = np.random.RandomState(1)
    pcm = (rng.randn(100_000) * 3000).clip(-32768, 32767).astype(np.int16)
    out = np.asarray(pcmcodec.encode_decode(pcm))
    np.testing.assert_array_equal(out, pcm.astype(np.float32) / 32768.0)
