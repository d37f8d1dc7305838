"""HTTP serving frontend (serve.py + cli/serve.py).

Drives a REAL ThreadingHTTPServer over localhost: WAV bytes in, events
out, with parity pinned against the library path (`predict`) on the
reference's golden clip. Also covers micro-batching of concurrent
requests, parameter grouping, error paths, and the metrics surface.
"""

import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from basic_pitch_tpu import constants, pipeline, serve

GOLDEN_WAV = "/root/reference/tests/resources/vocadito_10.wav"


@pytest.fixture(scope="module")
def server(nmp_params):
    transcriber = pipeline.StreamingTranscriber(windows_per_chunk=16)
    service = serve.TranscriptionService(transcriber, max_batch=4, max_wait_ms=10.0)
    srv = serve.make_server(service, "127.0.0.1", 0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    host, port = srv.server_address[:2]
    yield f"http://{host}:{port}", service
    srv.shutdown()
    srv.server_close()
    service.close()


def _post(base, path, body, headers=None):
    req = urllib.request.Request(base + path, data=body, headers=headers or {})
    with urllib.request.urlopen(req, timeout=120) as resp:
        return resp.status, resp.headers.get_content_type(), resp.read()


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=30) as resp:
        return resp.status, json.loads(resp.read())


def test_healthz_and_routes(server):
    base, _ = server
    status, info = _get(base, "/healthz")
    assert status == 200
    assert info["status"] == "ok"
    assert info["decode_backend"] in ("xla", "pallas")
    with pytest.raises(urllib.error.HTTPError) as err:
        _get(base, "/nope")
    assert err.value.code == 404


def test_transcribe_golden_clip_matches_library(server):
    base, _ = server
    with open(GOLDEN_WAV, "rb") as fh:
        wav = fh.read()
    status, ctype, body = _post(base, "/v1/transcribe", wav)
    assert status == 200 and ctype == "application/json"
    payload = json.loads(body)
    assert payload["n_notes"] == len(payload["notes"])

    from basic_pitch_tpu.inference import predict

    _, _, library_events = predict(GOLDEN_WAV)
    assert payload["n_notes"] == len(library_events)
    for got, want in zip(payload["notes"], library_events):
        assert got["pitch_midi"] == want[2]
        assert abs(got["start_time_s"] - want[0]) < 1e-6
        assert abs(got["end_time_s"] - want[1]) < 1e-6
        want_bends = list(want[4]) if want[4] is not None else None
        assert got["pitch_bends"] == want_bends


def test_transcribe_formats(server):
    base, _ = server
    with open(GOLDEN_WAV, "rb") as fh:
        wav = fh.read()
    status, ctype, body = _post(base, "/v1/transcribe?format=csv", wav)
    assert status == 200 and ctype == "text/csv"
    lines = body.decode().splitlines()
    assert lines[0].startswith("start_time_s,end_time_s,pitch_midi,velocity")
    assert len(lines) > 1

    status, ctype, body = _post(base, "/v1/transcribe?format=midi", wav)
    assert status == 200 and ctype == "audio/midi"
    assert body[:4] == b"MThd"
    # the in-repo SMF reader parses what the server emitted
    import tempfile

    from basic_pitch_tpu.utils import midi as midi_io

    with tempfile.NamedTemporaryFile(suffix=".mid") as fh:
        fh.write(body)
        fh.flush()
        parsed = midi_io.read_midi(fh.name)
    assert sum(len(i.notes) for i in parsed.instruments) == len(lines) - 1


def test_transcribe_parameters(server):
    base, _ = server
    with open(GOLDEN_WAV, "rb") as fh:
        wav = fh.read()
    # a frequency cage: every note inside [200, 500] Hz
    status, _, body = _post(
        base,
        "/v1/transcribe?minimum_frequency=200&maximum_frequency=500"
        "&onset_threshold=0.8",
        wav,
    )
    assert status == 200
    notes = json.loads(body)["notes"]
    for n in notes:
        hz = 440.0 * 2 ** ((n["pitch_midi"] - 69) / 12)
        assert 180 <= hz <= 550  # cage plus rounding at the bin edges

    with pytest.raises(urllib.error.HTTPError) as err:
        _post(base, "/v1/transcribe?bogus_param=1", wav)
    assert err.value.code == 400
    assert "bogus_param" in json.loads(err.value.read())["error"]


def test_bad_bodies(server):
    base, _ = server
    for body in (b"", b"not a wav at all" * 10):
        with pytest.raises(urllib.error.HTTPError) as err:
            _post(base, "/v1/transcribe", body)
        assert err.value.code == 400


def test_concurrent_requests_batch_together(server):
    base, service = server
    with open(GOLDEN_WAV, "rb") as fh:
        wav = fh.read()
    before = service.snapshot_metrics()

    results = [None] * 4
    def hit(i):
        results[i] = _post(base, "/v1/transcribe", wav)

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    payloads = [json.loads(body) for status, _, body in results if status == 200]
    assert len(payloads) == 4
    assert len({p["n_notes"] for p in payloads}) == 1  # identical answers

    after = service.snapshot_metrics()
    assert after["requests"] - before["requests"] == 4
    assert after["audio_seconds"] > before["audio_seconds"]
    # batching happened: fewer dispatches than requests (4 identical
    # requests arriving together share transcribe_batch calls)
    assert after["batches"] - before["batches"] < 4


def test_decode_wav_request_pcm16_passthrough():
    sr = constants.AUDIO_SAMPLE_RATE
    pcm = (np.sin(np.arange(sr) * 0.05) * 20000).astype(np.int16)
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    samples, got_sr = serve.decode_wav_request(buf.getvalue())
    assert got_sr == sr
    assert samples.dtype == np.int16
    np.testing.assert_array_equal(samples, pcm)  # exact: codec-eligible

    # 48 kHz stereo float: decodes, mixes down, resamples to the model rate
    buf = io.BytesIO()
    stereo = np.stack([pcm, pcm], axis=1).astype(np.int16)
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(48000)
        w.writeframes(stereo.tobytes())
    samples, got_sr = serve.decode_wav_request(buf.getvalue())
    assert got_sr == constants.AUDIO_SAMPLE_RATE
    assert samples.dtype == np.float32


def test_cli_parser_smoke():
    from basic_pitch_tpu.cli import serve as serve_cli

    ns = serve_cli.build_parser().parse_args(["--port", "0", "--max-batch", "2"])
    assert ns.port == 0 and ns.max_batch == 2 and ns.pcm_transport == "auto"


def _melody_pcm(midis, note_s=0.45, gap_s=0.4):
    sr = constants.AUDIO_SAMPLE_RATE
    parts = [np.zeros(sr // 2, np.float32)]
    for m in midis:
        t = np.arange(int(note_s * sr)) / sr
        env = np.minimum(1.0, t / 0.02) * np.exp(-1.5 * t)
        f0 = 440.0 * 2 ** ((m - 69) / 12)
        y = sum(w * np.sin(2 * np.pi * f0 * h * t)
                for h, w in ((1, 1.0), (2, 0.5), (3, 0.25)))
        parts.append((0.35 * env * y).astype(np.float32))
        parts.append(np.zeros(int(gap_s * sr), np.float32))
    parts.append(np.zeros(sr, np.float32))
    audio = np.concatenate(parts)
    return np.clip(np.round(audio * 32768.0), -32768, 32767).astype(np.int16)


def _dechunk(body: bytes) -> bytes:
    out = b""
    pos = 0
    while True:
        eol = body.index(b"\r\n", pos)
        size = int(body[pos:eol].split(b";")[0], 16)
        if size == 0:
            return out
        out += body[eol + 2 : eol + 2 + size]
        pos = eol + 2 + size + 2


def test_stream_route_full_duplex(server):
    """POST /v1/stream with a chunked PCM body: NDJSON events must come
    back WHILE the request body is still open (true streaming), and the
    complete event set must match the offline transcribe of the same PCM."""
    import socket

    base, service = server
    host, port = base[len("http://"):].rsplit(":", 1)
    pcm = _melody_pcm([60, 64, 67, 72, 76, 72, 67, 64])
    offline = service.transcriber.transcribe(pcm, constants.AUDIO_SAMPLE_RATE)
    assert len(offline) >= 6

    sock = socket.create_connection((host, int(port)), timeout=180)
    try:
        sock.sendall(
            b"POST /v1/stream?segment_seconds=1.0&lookahead_seconds=0.5 HTTP/1.1\r\n"
            b"Host: t\r\nTransfer-Encoding: chunked\r\n"
            b"Content-Type: application/octet-stream\r\n\r\n"
        )
        raw = pcm.tobytes()
        step = len(raw) // 7 + 1
        for i in range(0, len(raw), step):
            piece = raw[i : i + step]
            sock.sendall(f"{len(piece):x}\r\n".encode() + piece + b"\r\n")
        # body NOT terminated yet: early events must already be coming back
        sock.settimeout(120)
        got = b""
        while b"pitch_midi" not in got:
            data = sock.recv(65536)
            assert data, "server closed before emitting any event"
            got += data
        # now finish the request and drain the response
        sock.sendall(b"0\r\n\r\n")
        while b"\r\n0\r\n\r\n" not in got:
            data = sock.recv(65536)
            if not data:
                break
            got += data
    finally:
        sock.close()

    header, _, body = got.partition(b"\r\n\r\n")
    assert b"200" in header.splitlines()[0]
    assert b"application/x-ndjson" in header
    lines = _dechunk(body).decode().splitlines()
    events = [json.loads(line) for line in lines if line]
    assert all("error" not in e for e in events)
    assert len(events) == len(offline)
    for got_ev, want in zip(
        sorted((e["start_time_s"], e["end_time_s"], e["pitch_midi"]) for e in events),
        sorted((s, e, p) for s, e, p, *_ in offline),
    ):
        assert got_ev[2] == want[2]
        assert abs(got_ev[0] - want[0]) <= 0.05
        assert abs(got_ev[1] - want[1]) <= 0.05

    metrics = service.snapshot_metrics()
    assert metrics["streams"] >= 1
    assert metrics["stream_flushes"] >= 2


class _StubTranscriber:
    """Blocks each transcribe_batch on an event — lets tests hold the
    dispatch thread busy and fill the bounded queue deterministically."""

    decode_backend = "xla"
    pcm_transport = "raw"
    w = 16

    def __init__(self):
        self.release = threading.Event()
        self.started = threading.Event()
        self.calls = []

    def transcribe_batch(self, recordings, **params):
        self.started.set()
        self.release.wait(timeout=30)
        self.calls.append(len(recordings))
        return [[] for _ in recordings]

    def close(self):
        pass


def _tiny_wav() -> bytes:
    import io
    import wave

    sr = constants.AUDIO_SAMPLE_RATE
    pcm = (np.sin(np.arange(sr // 4) * 0.05) * 10000).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def test_backpressure_sheds_beyond_queue_capacity():
    """Overload contract: one in-flight batch + max_queue pending; every
    request beyond that is shed immediately with OverloadedError (503),
    counted in metrics — latency under overload stays bounded."""
    stub = _StubTranscriber()
    service = serve.TranscriptionService(
        stub, max_batch=1, max_wait_ms=1.0, max_queue=2
    )
    try:
        wav = np.zeros(100, np.int16)
        results = []

        def hit():
            try:
                service.submit(wav, constants.AUDIO_SAMPLE_RATE, dict(serve._PARAM_DEFAULTS))
                results.append("ok")
            except serve.OverloadedError:
                results.append("shed")

        first = threading.Thread(target=hit)
        first.start()
        assert stub.started.wait(timeout=10)  # dispatch thread is now busy
        # fill the queue (capacity 2), then two more that must shed
        extra = [threading.Thread(target=hit) for _ in range(4)]
        for t in extra[:2]:
            t.start()
            time.sleep(0.05)  # let each enqueue before the next
        for t in extra[2:]:
            t.start()
        for t in extra[2:]:
            t.join(timeout=10)  # shed replies return WITHOUT waiting
        assert results.count("shed") == 2
        stub.release.set()
        first.join(timeout=10)
        for t in extra[:2]:
            t.join(timeout=10)
        assert results.count("ok") == 3
        m = service.snapshot_metrics()
        assert m["shed"] == 2 and m["requests"] == 3
        assert m["queue_capacity"] == 2
    finally:
        stub.release.set()
        service.close()


def test_request_timeout_and_abandoned_drop():
    """A caller past request_timeout_s gets DeadlineExceeded (504) and its
    request never occupies a later batch."""
    stub = _StubTranscriber()
    service = serve.TranscriptionService(
        stub, max_batch=1, max_wait_ms=1.0, max_queue=4, request_timeout_s=0.1
    )
    try:
        wav = np.zeros(100, np.int16)
        outcomes = []

        def hit():
            try:
                service.submit(wav, constants.AUDIO_SAMPLE_RATE, dict(serve._PARAM_DEFAULTS))
                outcomes.append("ok")
            except serve.DeadlineExceeded:
                outcomes.append("timeout")

        t1 = threading.Thread(target=hit)
        t1.start()
        assert stub.started.wait(timeout=10)
        t2 = threading.Thread(target=hit)  # queued behind the stuck batch
        t2.start()
        t1.join(timeout=10)
        t2.join(timeout=10)
        assert outcomes == ["timeout", "timeout"]
        calls_before = len(stub.calls)
        stub.release.set()
        deadline = time.monotonic() + 10
        while len(stub.calls) <= calls_before and time.monotonic() < deadline:
            time.sleep(0.01)
        time.sleep(0.2)  # give the worker a chance to (wrongly) dispatch t2
        # the first (in-flight) batch completes; the abandoned queued one is
        # dropped without a transcribe_batch call
        assert len(stub.calls) == calls_before + 1
        m = service.snapshot_metrics()
        assert m["timeouts"] == 2
    finally:
        stub.release.set()
        service.close()


def test_http_413_oversized_body(server):
    """End-to-end status code: 413 when the declared body exceeds the
    server's cap, without reading the body (503-shed status mapping is
    covered at the service level above and in tools/serve_bench.py's
    overload phase)."""
    base, service = server
    wav = _tiny_wav()
    import http.client

    host, port = base[len("http://"):].rsplit(":", 1)
    conn = http.client.HTTPConnection(host, int(port), timeout=30)
    try:
        conn.request(
            "POST",
            "/v1/transcribe",
            body=b"x" * 64,
            headers={"Content-Length": str(1 << 62)},
        )
        resp = conn.getresponse()
        assert resp.status == 413
        resp.read()
    finally:
        conn.close()
    # healthy request still succeeds afterwards
    status, _, _ = _post(base, "/v1/transcribe", wav)
    assert status == 200
    assert "shed" in service.snapshot_metrics()


def test_close_drains_queued_requests():
    """Graceful drain: requests admitted before close() still complete."""
    stub = _StubTranscriber()
    service = serve.TranscriptionService(stub, max_batch=1, max_wait_ms=1.0, max_queue=4)
    wav = np.zeros(100, np.int16)
    results = []

    def hit():
        results.append(
            service.submit(wav, constants.AUDIO_SAMPLE_RATE, dict(serve._PARAM_DEFAULTS))
        )

    threads = [threading.Thread(target=hit) for _ in range(3)]
    for t in threads:
        t.start()
    assert stub.started.wait(timeout=10)
    time.sleep(0.1)  # let the rest enqueue
    stub.release.set()
    closer = threading.Thread(target=service.close)
    closer.start()
    for t in threads:
        t.join(timeout=15)
    closer.join(timeout=15)
    assert len(results) == 3  # every admitted request was served
    with pytest.raises(RuntimeError):
        service.submit(wav, constants.AUDIO_SAMPLE_RATE, dict(serve._PARAM_DEFAULTS))


def test_stream_route_bad_params(server):
    import urllib.error
    import urllib.request

    base, _ = server
    req = urllib.request.Request(base + "/v1/stream?pcm_format=mp3", data=b"xx")
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(req, timeout=30)
    assert err.value.code == 400
    assert "pcm_format" in json.loads(err.value.read())["error"]
