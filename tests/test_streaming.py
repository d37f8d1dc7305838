"""StreamingSession: incremental transcription over the device pipeline.

Pins the streaming contract: block-size independence, bounded-latency
emission (events arrive during the stream, not just at close), no
duplicates, long-note carry across flush boundaries, and — on gapped
melodic material where window-local decode statistics match global ones —
event-for-event agreement with the offline `transcribe` path.
"""

import numpy as np
import pytest

from basic_pitch_tpu import constants, pipeline
from basic_pitch_tpu.streaming import StreamingSession

SR = constants.AUDIO_SAMPLE_RATE


@pytest.fixture(scope="module")
def transcriber(nmp_params):
    return pipeline.StreamingTranscriber(windows_per_chunk=16)


def tone(f0: float, seconds: float, amp: float = 0.35) -> np.ndarray:
    t = np.arange(int(seconds * SR)) / SR
    env = np.minimum(1.0, t / 0.02) * np.exp(-1.5 * t)
    y = np.zeros_like(t)
    for h, w in ((1, 1.0), (2, 0.5), (3, 0.25)):
        y += w * np.sin(2 * np.pi * f0 * h * t)
    return (amp * env * y).astype(np.float32)


def melody(midis, note_s=0.45, gap_s=0.40, lead_s=0.5, tail_s=1.0) -> np.ndarray:
    """Well-separated monophonic melody: the material where streaming and
    offline decodes must agree exactly."""
    parts = [np.zeros(int(lead_s * SR), np.float32)]
    for m in midis:
        parts.append(tone(440.0 * 2 ** ((m - 69) / 12), note_s))
        parts.append(np.zeros(int(gap_s * SR), np.float32))
    parts.append(np.zeros(int(tail_s * SR), np.float32))
    return np.concatenate(parts)


def stream_all(session, audio, block_s=0.25, rng=None):
    """Feed audio in blocks; returns (during_stream_events, close_events)."""
    live = []
    i = 0
    while i < len(audio):
        n = int(block_s * SR)
        if rng is not None:
            n = int(rng.uniform(0.05, 0.6) * SR)
        live.extend(session.feed(audio[i : i + n]))
        i += n
    return live, session.close()


def assert_same_events(streamed, offline, tol=0.05):
    assert len(streamed) == len(offline), (streamed, offline)
    for (s1, e1, p1, *_), (s2, e2, p2, *_) in zip(sorted(streamed), sorted(offline)):
        assert p1 == p2
        assert abs(s1 - s2) <= tol, (s1, s2)
        assert abs(e1 - e2) <= tol, (e1, e2)


def test_streamed_equals_offline_on_gapped_melody(transcriber):
    audio = melody([60, 64, 67, 72, 67, 64, 60, 55])
    offline = transcriber.transcribe(audio, SR)
    assert len(offline) >= 6  # the material actually transcribes

    session = StreamingSession(transcriber)
    live, tail = stream_all(session, audio)
    assert_same_events(live + tail, offline)
    # bounded latency: most events finalized during the stream, not at close
    assert len(live) >= len(offline) - 2
    assert session.stats["flushes"] >= 3


def test_block_size_independence(transcriber):
    audio = melody([62, 66, 69, 74])
    offline = transcriber.transcribe(audio, SR)
    rng = np.random.RandomState(7)
    for trial in range(2):
        session = StreamingSession(transcriber)
        live, tail = stream_all(session, audio, rng=rng)
        assert_same_events(live + tail, offline)


def test_no_duplicates_and_sorted(transcriber):
    audio = melody([60, 60, 60, 60], note_s=0.4, gap_s=0.5)
    session = StreamingSession(transcriber)
    live, tail = stream_all(session, audio, block_s=0.1)
    events = live + tail
    keys = [(round(s, 3), p) for s, _, p, *_ in events]
    assert len(keys) == len(set(keys))
    assert live == sorted(live)


def test_long_note_carries_across_flushes(transcriber):
    """A 3 s note spans many 2 s flush segments; it must come out once,
    with the onset from when it actually started."""
    # sustained tone with slow decay so the frame posteriorgram holds
    t = np.arange(int(3.0 * SR)) / SR
    sustained = (
        0.4
        * np.minimum(1.0, t / 0.02)
        * np.exp(-0.3 * t)
        * (
            np.sin(2 * np.pi * 220.0 * t)
            + 0.5 * np.sin(2 * np.pi * 440.0 * t)
            + 0.25 * np.sin(2 * np.pi * 660.0 * t)
        )
    ).astype(np.float32)
    audio = np.concatenate(
        [np.zeros(int(0.5 * SR), np.float32), sustained, np.zeros(int(1.0 * SR), np.float32)]
    )
    offline = transcriber.transcribe(audio, SR)
    session = StreamingSession(transcriber)
    live, tail = stream_all(session, audio, block_s=0.3)
    events = live + tail
    assert_same_events(events, offline)
    lows = [e for e in events if abs(e[0] - 0.5) < 0.1]
    assert lows, events
    assert lows[0][1] - lows[0][0] > 1.5  # the note kept its length


def test_note_longer_than_max_context(transcriber):
    """A note that outlives max_context_seconds must survive the window
    sliding past its onset: emitted ONCE, with the onset recorded when it
    was first observed (regression: clamped pending keys — before the fix
    the re-decoded window-edge onset failed to match the stale pending key
    and the note was dropped as an edge artifact)."""
    t = np.arange(int(9.0 * SR)) / SR
    sustained = (
        0.4
        * np.minimum(1.0, t / 0.02)
        * np.exp(-0.05 * t)
        * (
            np.sin(2 * np.pi * 220.0 * t)
            + 0.5 * np.sin(2 * np.pi * 440.0 * t)
            + 0.25 * np.sin(2 * np.pi * 660.0 * t)
        )
    ).astype(np.float32)
    audio = np.concatenate(
        [np.zeros(int(0.5 * SR), np.float32), sustained, np.zeros(int(1.0 * SR), np.float32)]
    )
    offline = transcriber.transcribe(audio, SR)
    assert len(offline) == 1 and offline[0][1] - offline[0][0] > 8.0

    session = StreamingSession(transcriber, max_context_seconds=5.0)
    live, tail = stream_all(session, audio, block_s=0.25)
    events = live + tail
    assert len(events) == 1, events
    onset, offset, pitch, *_ = events[0]
    assert pitch == offline[0][2]
    assert abs(onset - offline[0][0]) <= 0.05  # original onset preserved
    assert abs(offset - offline[0][1]) <= 0.1


def test_int16_feeds(transcriber):
    audio = melody([65, 69, 72])
    pcm = np.clip(np.round(audio * 32768.0), -32768, 32767).astype(np.int16)
    offline = transcriber.transcribe(pcm, SR)
    session = StreamingSession(transcriber)
    live, tail = stream_all(session, pcm)
    assert_same_events(live + tail, offline)


def test_api_errors(transcriber):
    session = StreamingSession(transcriber)
    with pytest.raises(ValueError, match="mono"):
        session.feed(np.zeros((2, 100), np.float32))
    session.feed(np.zeros(100, np.float32))
    with pytest.raises(ValueError, match="dtype changed"):
        session.feed(np.zeros(100, np.int16))
    assert session.close() == []  # sub-threshold audio: no events, clean close
    with pytest.raises(RuntimeError):
        session.feed(np.zeros(10, np.float32))
    assert session.close() == []  # idempotent

    with pytest.raises(ValueError, match="22050 or 44100"):
        StreamingSession(transcriber, sample_rate=16000)
    with pytest.raises(ValueError, match="max_context_seconds"):
        StreamingSession(transcriber, segment_seconds=8.0, max_context_seconds=6.0)


def test_empty_close(transcriber):
    assert StreamingSession(transcriber).close() == []


class _ChunkedReader:
    """stdin stub delivering at most `chunk` bytes per read (misaligned
    sample boundaries exercise the carry path)."""

    def __init__(self, data: bytes, chunk: int):
        self._data = data
        self._pos = 0
        self._chunk = chunk

    def read(self, n: int) -> bytes:
        n = min(n, self._chunk)
        out = self._data[self._pos : self._pos + n]
        self._pos += len(out)
        return out


def test_stream_cli_ndjson_matches_offline(transcriber, capsys):
    import io
    import json as json_mod

    from basic_pitch_tpu.cli import stream as stream_cli

    audio = melody([60, 67, 72])
    pcm = np.clip(np.round(audio * 32768.0), -32768, 32767).astype(np.int16)
    offline = transcriber.transcribe(pcm, SR)

    out = io.StringIO()
    rc = stream_cli.main(
        ["--windows-per-chunk", "16"],
        stdin=_ChunkedReader(pcm.tobytes(), chunk=5001),  # odd: splits samples
        stdout=out,
    )
    assert rc == 0
    lines = [json_mod.loads(line) for line in out.getvalue().splitlines()]
    events = [
        (d["start_time_s"], d["end_time_s"], d["pitch_midi"]) for d in lines
    ]
    assert_same_events(events, [(s, e, p) for s, e, p, *_ in offline])
    assert all(d["velocity"] == int(np.round(127 * d["amplitude"])) for d in lines)
    err = capsys.readouterr().err
    assert "stream done" in err
    assert "trailing byte" not in err


def test_dense_polyphony_parity_bound(transcriber):
    """Pin the MEASURED streaming-vs-offline bound on the admitted worst
    case (STREAM_PARITY.json): dense continuous polyphony, default session
    settings. The 60 s hardware measurement is F1 0.996; this miniature
    (12 s, same generator) must clear 0.95 — far above what a broken
    pending/finalization path produces, small enough for the CPU suite."""
    import pathlib
    import sys

    from basic_pitch_tpu.utils import eval as eval_utils

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))
    import stream_parity

    audio = stream_parity.dense_polyphony(12.0, seed=0)
    offline = transcriber.transcribe(audio, SR)
    session = StreamingSession(transcriber)
    live, tail = stream_all(session, audio)
    ref = eval_utils.events_to_notes(offline)
    est = eval_utils.events_to_notes(live + tail)
    score = eval_utils.precision_recall_f1(ref, est)
    assert score["n_reference"] >= 30, "workload too sparse to be meaningful"
    assert score["f1"] >= 0.95, score


def test_streaming_at_44k(transcriber):
    """44.1 kHz sessions decimate on device like offline transcribe; the
    window-hop alignment doubles with the rate."""
    sr2 = 2 * SR
    t = np.arange(int(0.45 * sr2)) / sr2
    env = np.minimum(1.0, t / 0.02) * np.exp(-1.5 * t)

    def tone2(m):
        f0 = 440.0 * 2 ** ((m - 69) / 12)
        y = sum(w * np.sin(2 * np.pi * f0 * h * t)
                for h, w in ((1, 1.0), (2, 0.5), (3, 0.25)))
        return (0.35 * env * y).astype(np.float32)

    parts = [np.zeros(sr2 // 2, np.float32)]
    for m in (60, 67, 72):
        parts += [tone2(m), np.zeros(int(0.4 * sr2), np.float32)]
    parts.append(np.zeros(sr2, np.float32))
    audio = np.concatenate(parts)

    offline = transcriber.transcribe(audio, sr2)
    assert len(offline) >= 2
    session = StreamingSession(transcriber, sample_rate=sr2)
    live = []
    block = int(0.25 * sr2)
    for i in range(0, len(audio), block):
        live.extend(session.feed(audio[i : i + block]))
    tail = session.close()
    assert_same_events(live + tail, offline)


# ---------------------------------------------------------------------------
# force-emit of grace-exhausted pending notes (round 5 — the round-4
# aggressive-setting recall hole: STREAM_PARITY worst case dropped 19 notes)
# ---------------------------------------------------------------------------


class _ScriptedTranscribe:
    """transcribe_fn stub: returns the scripted event list per flush."""

    def __init__(self, script):
        self.script = list(script)
        self.calls = 0

    def __call__(self, audio, sample_rate, **kw):
        events = self.script[min(self.calls, len(self.script) - 1)]
        self.calls += 1
        return list(events)


def _session(script, **kw):
    return StreamingSession(
        transcriber=None,
        transcribe_fn=_ScriptedTranscribe(script),
        **kw,
    )


def test_pending_note_force_emitted_not_lost():
    """A note the decode CONFIRMED (reported in two flushes) then never
    again survives grace exhaustion as an EVENT (with its last observed
    end), not a loss."""
    # flushes 1-2 see a note ending beyond the lookahead horizon ->
    # pending with 2 sightings; later flushes never report it again
    note = (0.5, 3.9, 60, 0.8, None)
    session = _session([[note], [note], [], [], []], segment_seconds=2.0,
                       lookahead_seconds=1.0)
    out = []
    block = np.zeros(int(0.5 * SR), np.float32)
    for _ in range(24):  # 12 s -> 6 flushes
        out.extend(session.feed(block))
    out.extend(session.close())
    assert session.stats["pending_dropped"] == 0
    assert session.stats["pending_force_emitted"] == 1
    forced = [e for e in out if e[2] == 60]
    assert len(forced) == 1
    start, end, pitch, amp, _ = forced[0]
    assert abs(start - 0.5) < 1e-6 and abs(end - 3.9) < 1e-6 and amp == 0.8


def test_pending_note_force_emitted_at_close():
    """Un-reclaimed CONFIRMED pendings at the final flush are emitted,
    not dropped."""
    note = (0.5, 3.9, 64, 0.7, None)
    session = _session([[note], [note], []], segment_seconds=2.0,
                       lookahead_seconds=1.0)
    out = []
    out.extend(session.feed(np.zeros(int(2.0 * SR), np.float32)))
    out.extend(session.feed(np.zeros(int(2.0 * SR), np.float32)))
    out.extend(session.close())
    assert [e[2] for e in out] == [64]
    assert session.stats["pending_force_emitted"] == 1


def test_single_sighting_phantom_dropped():
    """A note the decode reported exactly ONCE and never confirmed is a
    window-edge hallucination: dropped at grace exhaustion, not emitted
    (measured on real vocals — STREAM_PARITY precision floor)."""
    phantom = (0.5, 1.9, 60, 0.8, None)
    session = _session([[phantom], [], [], [], []], segment_seconds=2.0,
                       lookahead_seconds=1.0)
    out = []
    block = np.zeros(int(0.5 * SR), np.float32)
    for _ in range(16):
        out.extend(session.feed(block))
    out.extend(session.close())
    assert out == []
    assert session.stats["pending_force_emitted"] == 0
    assert session.stats["pending_dropped"] == 1


def test_grace_budget_scales_with_segment_length():
    """Grace is a TIME budget: 1 s segments get 2 grace flushes (2 s), the
    2 s default gets 1 — short segments no longer lose notes faster."""
    s_short = _session([[]], segment_seconds=1.0)
    s_default = _session([[]], segment_seconds=2.0)
    s_long = _session([[]], segment_seconds=4.0)
    assert s_short._grace_flushes == 2
    assert s_default._grace_flushes == 1
    assert s_long._grace_flushes == 1


def test_regained_note_not_duplicated_after_force_emit():
    """If the decode re-reports a note AFTER its force-emit, the emitted-key
    dedup suppresses the duplicate."""
    anchor = (0.1, 99.0, 40, 0.5, None)  # pins the window origin at 0
    note = (0.5, 1.9, 60, 0.8, None)
    late = (0.5, 2.2, 60, 0.8, None)  # same note, re-seen much later
    session = _session(
        [[anchor, note], [anchor], [anchor], [anchor, late], [anchor, late]],
        segment_seconds=2.0, lookahead_seconds=1.0)
    out = []
    block = np.zeros(int(1.0 * SR), np.float32)
    for _ in range(10):
        out.extend(session.feed(block))
    out.extend(session.close())
    assert [e[2] for e in out] == [60]


def test_jittered_refind_not_duplicated():
    """A note seen once is dropped at grace exhaustion (single sighting),
    but a later re-decode that re-finds it — onset jittered past the 40 ms
    key tolerance — resurrects it through the finalized-horizon filter, and
    the note still emits exactly ONCE. This was the round-5
    aggressive-setting precision hole (STREAM_PARITY 0.9086: force-emit +
    jittered re-find each produced an event)."""
    # an always-reported never-ending anchor at another pitch keeps the
    # trim (and so the scripted decode's window origin) pinned at 0
    anchor = (0.1, 99.0, 40, 0.5, None)
    first = (0.5, 3.5, 60, 0.8, None)  # pending: ends past the horizon
    jitter = (0.62, 3.5, 60, 0.8, None)  # same note, onset +120 ms
    session = _session(
        [[anchor, first], [anchor], [anchor], [anchor, jitter],
         [anchor, jitter]],
        segment_seconds=2.0, lookahead_seconds=1.0)
    out = []
    block = np.zeros(int(1.0 * SR), np.float32)
    for _ in range(10):
        out.extend(session.feed(block))
    out.extend(session.close())
    sixties = [e for e in out if e[2] == 60]
    assert len(sixties) == 1
    assert abs(sixties[0][0] - 0.62) < 1e-6  # resurrected sighting's onset
    assert session.stats["pending_dropped"] == 1


def test_force_emit_superseded_by_fresher_sighting():
    """A split first decode leaves TWO pending records for what later
    decodes see as ONE note; the event claims the earlier record, and when
    the orphaned second record exhausts grace it is suppressed (its span is
    already carried by the fresher pending), not emitted as a duplicate."""
    split_a = (0.5, 1.4, 60, 0.8, None)
    split_b = (1.5, 3.5, 60, 0.8, None)
    merged = (0.5, 3.5, 60, 0.8, None)
    session = _session([[split_a, split_b], [merged], [merged], [merged]],
                       segment_seconds=2.0, lookahead_seconds=1.0)
    out = []
    block = np.zeros(int(1.0 * SR), np.float32)
    for _ in range(8):
        out.extend(session.feed(block))
    out.extend(session.close())
    sixties = [e for e in out if e[2] == 60]
    assert len(sixties) == 1
    assert session.stats["pending_superseded"] == 1
    assert session.stats["pending_force_emitted"] == 0
    assert session.stats["pending_dropped"] == 0


def test_mismatch_anatomy_classification():
    """The STREAM_PARITY mismatch anatomy (tools/stream_parity.py) names
    each unmatched event's mechanism: a matched pair contributes nothing;
    an offline note with a twin one semitone away is semitone_adjacent;
    same pitch past the 50 ms scoring tolerance is onset_jitter; no twin
    within +/-1 semitone and 150 ms is lost; leftover streamed events are
    extra."""
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))
    import stream_parity

    ref = [(1.0, 1.5, 60), (2.0, 2.5, 47), (3.0, 3.4, 54), (9.0, 9.5, 70)]
    est = [(1.01, 1.5, 60), (2.02, 2.5, 46), (3.09, 3.4, 54), (20.0, 20.5, 30)]
    anatomy = stream_parity.mismatch_anatomy(ref, est)
    assert anatomy == {
        "semitone_adjacent": 1,
        "onset_jitter": 1,
        "lost": 1,
        "extra": 1,
    }
    # perfect agreement: all zeros
    assert stream_parity.mismatch_anatomy(ref, list(ref)) == {
        "semitone_adjacent": 0,
        "onset_jitter": 0,
        "lost": 0,
        "extra": 0,
    }
