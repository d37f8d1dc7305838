"""PCM upload-transport selection (ops/transport.py).

The transport decision (residual codec vs raw int16) is MEASURED per
runtime, like the decode backend. These tests pin the selection mechanics
— forced modes, auto resolution, TTL re-probe, hysteresis — and that the
pipeline produces identical events under either transport (exactness of
the codec itself is tests/test_pcmcodec.py's job).
"""

import numpy as np
import pytest

from basic_pitch_tpu import constants, pipeline
from basic_pitch_tpu.ops import pcmcodec, transport


@pytest.fixture(autouse=True)
def _fresh_probe_cache(monkeypatch):
    monkeypatch.setattr(transport, "_PROBE_CACHE", None)
    monkeypatch.setattr(transport, "_REPROBE_THREAD", None)


def test_probe_measures_both_transports():
    result = transport.probe()
    assert result["transport"] in ("codec", "raw")
    assert result["raw_mib_s"] > 0 and result["codec_mib_s"] > 0
    assert result["pack_mib_s"] > 0 and result["codec_device_mib_s"] > 0
    assert result["packed_ratio"] > 1.0  # the canned buffer must compress
    # the decision matches the measurements it reports
    want = "codec" if result["codec_mib_s"] > result["raw_mib_s"] else "raw"
    assert result["transport"] == want


def test_probe_cached_per_process(monkeypatch):
    first = transport.probe()
    calls = []
    monkeypatch.setattr(
        transport, "_measure", lambda *a, **k: calls.append(1) or {}
    )
    assert transport.probe() is first  # no ttl: cache holds forever
    assert transport.probe(ttl_s=1e9) is first  # fresh within ttl
    assert not calls


def _settle():
    """Join the background re-probe thread, if one was kicked."""
    th = transport._REPROBE_THREAD
    if th is not None:
        th.join(timeout=10)


def test_ttl_reprobe_with_hysteresis(monkeypatch):
    base = {
        "raw_mib_s": 100.0,
        "codec_mib_s": 200.0,
        "transport": "codec",
        "platform": "cpu",
    }
    monkeypatch.setattr(transport, "_measure", lambda *a, **k: dict(base))
    assert transport.probe(ttl_s=60)["transport"] == "codec"

    # stale: the CALLER still gets the cached decision (re-probe happens on
    # a background thread so requests never absorb the probe's transfers)
    monkeypatch.setattr(
        transport.time, "monotonic", lambda: transport._PROBE_CACHE["ts"] + 61
    )
    # challenger NOT decisively better (within HYSTERESIS): hold, flagged
    wobble = dict(base, raw_mib_s=205.0, codec_mib_s=200.0, transport="raw")
    monkeypatch.setattr(transport, "_measure", lambda *a, **k: dict(wobble))
    assert transport.probe(ttl_s=60)["transport"] == "codec"
    _settle()
    held = transport.probe(ttl_s=1e9)
    assert held["transport"] == "codec"  # incumbent kept...
    assert held["held_by_hysteresis"] is True  # ...and the record says so
    assert held["raw_mib_s"] == 205.0  # with the NEW measurements

    # challenger decisively better: flip
    monkeypatch.setattr(
        transport.time, "monotonic", lambda: transport._PROBE_CACHE["ts"] + 61
    )
    decisive = dict(base, raw_mib_s=500.0, codec_mib_s=200.0, transport="raw")
    monkeypatch.setattr(transport, "_measure", lambda *a, **k: dict(decisive))
    transport.probe(ttl_s=60)
    _settle()
    flipped = transport.probe(ttl_s=1e9)
    assert flipped["transport"] == "raw"
    assert "held_by_hysteresis" not in flipped

    # force re-measures synchronously, takes the winner, ignores hysteresis
    back = dict(base, raw_mib_s=205.0, codec_mib_s=200.0, transport="raw")
    monkeypatch.setattr(transport, "_measure", lambda *a, **k: dict(back))
    assert transport.probe(force=True)["transport"] == "raw"


def test_report_without_packer(monkeypatch):
    monkeypatch.setattr(pcmcodec, "available", lambda: False)
    r = transport.report()
    assert r["transport"] == "raw"
    assert "raw_mib_s" not in r  # nothing measured, nothing recorded


def test_check_mode():
    assert transport.check_mode("auto") == "auto"
    with pytest.raises(ValueError, match="pcm_transport"):
        transport.check_mode("zip")


def test_resolve_forced_and_invalid():
    assert transport.resolve("codec") == "codec"
    assert transport.resolve("raw") == "raw"
    with pytest.raises(ValueError, match="pcm_transport"):
        transport.resolve("fast")


def test_resolve_auto_without_packer(monkeypatch):
    monkeypatch.setattr(pcmcodec, "available", lambda: False)
    assert transport.resolve("auto") == "raw"


def test_transcriber_validates_transport():
    with pytest.raises(ValueError, match="pcm_transport"):
        pipeline.StreamingTranscriber(windows_per_chunk=8, pcm_transport="zip")


def _tone_pcm(seconds=3.0):
    sr = constants.AUDIO_SAMPLE_RATE
    t = np.arange(int(seconds * sr)) / sr
    y = 0.4 * np.sin(2 * np.pi * 440.0 * t) * np.exp(-0.3 * t)
    return (y * 32767).astype(np.int16), sr


def test_forced_raw_and_codec_produce_identical_events(nmp_params):
    pcm, sr = _tone_pcm()
    raw_tr = pipeline.StreamingTranscriber(windows_per_chunk=8, pcm_transport="raw")
    codec_tr = pipeline.StreamingTranscriber(windows_per_chunk=8, pcm_transport="codec")
    (ev_raw,) = raw_tr.transcribe_batch([(pcm, sr)])
    (ev_codec,) = codec_tr.transcribe_batch([(pcm, sr)])
    assert ev_raw == ev_codec and len(ev_raw) >= 1
    # raw shipped the int16 bytes verbatim; codec shipped fewer
    assert sum(raw_tr.piece_upload_bytes.values()) >= pcm.nbytes
    if pcmcodec.available():
        assert sum(codec_tr.piece_upload_bytes.values()) < sum(
            raw_tr.piece_upload_bytes.values()
        )


def test_auto_dispatch_consults_probe(nmp_params, monkeypatch):
    pcm, sr = _tone_pcm(2.0)
    tr = pipeline.StreamingTranscriber(
        windows_per_chunk=8, pcm_transport="auto", transport_ttl_s=1e9
    )
    seen = []
    real_resolve = transport.resolve

    def spy(mode, **kw):
        out = real_resolve(mode, **kw)
        seen.append(out)
        return out

    monkeypatch.setattr(transport, "resolve", spy)
    (events,) = tr.transcribe_batch([(pcm, sr)])
    assert len(events) >= 1
    assert seen and all(s in ("codec", "raw") for s in seen)
    # float32 audio never consults the transport policy (no codec either way)
    seen.clear()
    tr.transcribe(pcm.astype(np.float32) / 32768.0, sr)
    assert not seen
