"""Synthesize a GuitarSet-layout corpus: plucked-string audio + per-string JAMS.

Real GuitarSet (the reference's tested dataset) is ~10 GB of remote audio
this environment cannot fetch, so the training bench builds a faithful
stand-in with the SAME on-disk layout the builder consumes
(`data/datasets/guitarset.py`, mirroring
`/root/reference/basic_pitch/data/datasets/guitarset.py:54-123`):

    <root>/audio_mono-mic/<track_id>_mic.wav     44.1 kHz mono PCM16
    <root>/annotation/<track_id>.jams            6x note_midi + 6x pitch_contour

Audio is Karplus-Strong plucked strings (vectorized, per-period feedback
loop) over six standard-tuned strings playing strummed chords and melodic
lines — real attack transients, inharmonic decay tails, chord overlap, and
genuine annotation sparsity (notes only where plucked, per-string contour
tracks with vibrato), which is what distinguishes this from a sine pile.

Usage: ``python tools/make_guitar_corpus.py <dest> [--tracks 40] [--seconds 30]``
(also imported by tools/train_bench.py and the tests).
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from basic_pitch_tpu.utils import audio as audio_io  # noqa: E402

SR = 44100  # GuitarSet distributes 44.1 kHz; the builder transcodes to 22.05k
STRING_MIDI = (40, 45, 50, 55, 59, 64)  # standard tuning E2 A2 D3 G3 B3 E4
CHORD_SHAPES = {  # frets per string, -1 = muted
    "E": (0, 2, 2, 1, 0, 0),
    "Am": (-1, 0, 2, 2, 1, 0),
    "D": (-1, -1, 0, 2, 3, 2),
    "G": (3, 2, 0, 0, 0, 3),
    "C": (-1, 3, 2, 0, 1, 0),
}


def karplus_strong(f0: float, seconds: float, sr: int, rng, decay: float = 0.996) -> np.ndarray:
    """Vectorized Karplus-Strong pluck: noise burst through the averaging
    feedback delay line, computed period-by-period."""
    period = max(2, int(round(sr / f0)))
    n = int(seconds * sr)
    buf = rng.uniform(-1.0, 1.0, period).astype(np.float64)
    out = np.empty(((n // period) + 2) * period)
    out[:period] = buf
    pos = period
    while pos < n:
        nxt = decay * 0.5 * (buf + np.roll(buf, -1))
        out[pos : pos + period] = nxt
        buf = nxt
        pos += period
    body = out[:n]
    # gentle pick attack + release so concatenated notes don't click
    env = np.minimum(1.0, np.arange(n) / (0.002 * sr))
    env *= np.minimum(1.0, (n - np.arange(n)) / (0.01 * sr))
    return (body * env).astype(np.float32)


def _contour(f0: float, start: float, dur: float, rng, hop: float = 256.0 / 22050.0):
    """(times, freqs) pyin-style per-string pitch track with light vibrato."""
    times = np.arange(start, start + dur, hop)
    vib = 1.0 + 0.002 * np.sin(2 * np.pi * 5.5 * (times - start) + rng.rand() * 6.28)
    return times, f0 * vib


def synth_track(track_seconds: float, seed: int):
    """One performance: strummed chords + a melody line on the top strings.

    Returns (audio float32 @44.1k, per_string_notes, per_string_contours)
    where per_string_notes[s] is a list of (start, dur, midi) and
    per_string_contours[s] is (times, freqs) arrays.
    """
    rng = np.random.RandomState(seed)
    n = int(track_seconds * SR)
    audio = np.zeros(n, np.float64)
    notes = [[] for _ in STRING_MIDI]
    contours = [([], []) for _ in STRING_MIDI]

    def add(string: int, midi: int, start: float, dur: float, amp: float):
        f0 = 440.0 * 2 ** ((midi - 69) / 12)
        i0 = int(start * SR)
        seg = karplus_strong(f0, dur, SR, rng)
        i1 = min(i0 + len(seg), n)
        audio[i0:i1] += amp * seg[: i1 - i0]
        notes[string].append((start, dur, midi))
        ct, cf = _contour(f0, start, dur, rng)
        contours[string][0].extend(ct.tolist())
        contours[string][1].extend(cf.tolist())

    t = 0.3 + 0.2 * rng.rand()
    chords = list(CHORD_SHAPES.values())
    while t < track_seconds - 2.0:
        if rng.rand() < 0.55:  # strum a chord
            shape = chords[rng.randint(len(chords))]
            dur = float(rng.choice([0.8, 1.2, 1.6]))
            for s, fret in enumerate(shape):
                if fret < 0:
                    continue
                strum_delay = 0.012 * s  # downstroke
                add(s, STRING_MIDI[s] + fret, t + strum_delay, dur, 0.25 + 0.1 * rng.rand())
            t += dur * float(rng.choice([0.5, 0.75, 1.0]))
        else:  # melody burst on the top two strings
            n_mel = rng.randint(2, 6)
            for _ in range(n_mel):
                s = rng.choice([4, 5])
                fret = rng.randint(0, 9)
                dur = float(rng.choice([0.25, 0.4, 0.6]))
                add(s, STRING_MIDI[s] + fret, t, dur, 0.35 + 0.15 * rng.rand())
                t += dur * float(rng.choice([0.6, 1.0]))
        t += 0.05 * rng.rand()

    peak = np.abs(audio).max()
    if peak > 0.9:
        audio *= 0.9 / peak
    return audio.astype(np.float32), notes, contours


def write_track(root: pathlib.Path, track_id: str, track_seconds: float, seed: int) -> None:
    audio, notes, contours = synth_track(track_seconds, seed)
    (root / "audio_mono-mic").mkdir(parents=True, exist_ok=True)
    (root / "annotation").mkdir(parents=True, exist_ok=True)
    audio_io.write_wav(str(root / "audio_mono-mic" / f"{track_id}_mic.wav"), audio, SR)

    annotations = []
    for s in range(len(STRING_MIDI)):
        annotations.append(
            {
                "namespace": "note_midi",
                "annotation_metadata": {"data_source": str(s)},
                "data": [
                    {"time": start, "duration": dur, "value": float(midi), "confidence": None}
                    for start, dur, midi in notes[s]
                ],
            }
        )
        ct, cf = contours[s]
        annotations.append(
            {
                "namespace": "pitch_contour",
                "annotation_metadata": {"data_source": str(s)},
                "data": [
                    {
                        "time": float(tt),
                        "duration": 0.0,
                        "value": {"frequency": float(ff), "index": s, "voiced": True},
                    }
                    for tt, ff in zip(ct, cf)
                ],
            }
        )
    (root / "annotation" / f"{track_id}.jams").write_text(
        json.dumps({"annotations": annotations})
    )


def make_corpus(root, n_tracks: int = 40, track_seconds: float = 30.0, seed: int = 0) -> pathlib.Path:
    """Write the full corpus; returns root. Track ids follow GuitarSet's
    <player>_<style><n> shape so split logic sees familiar names."""
    root = pathlib.Path(root)
    styles = ["Rock", "Jazz", "BN", "Funk", "SS"]
    for i in range(n_tracks):
        track_id = f"{i:02d}_{styles[i % len(styles)]}{i // len(styles) + 1}"
        write_track(root, track_id, track_seconds, seed * 10007 + i)
    return root


def truth_events(root, track_id: str):
    """Ground-truth (start, end, midi) note list for one track's JAMS."""
    jam = json.loads((pathlib.Path(root) / "annotation" / f"{track_id}.jams").read_text())
    out = []
    for ann in jam["annotations"]:
        if ann["namespace"] != "note_midi":
            continue
        for obs in ann["data"]:
            out.append((obs["time"], obs["time"] + obs["duration"], int(round(obs["value"]))))
    return sorted(out)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dest")
    ap.add_argument("--tracks", type=int, default=40)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    make_corpus(args.dest, args.tracks, args.seconds, args.seed)
    print(f"wrote {args.tracks} tracks x {args.seconds:.0f}s under {args.dest}")
