"""Headline benchmark: end-to-end transcription throughput per chip.

Measures audio-seconds transcribed per wall-clock second through the FULL
pipeline — PCM16 samples at the canonical 22.05 kHz model rate (BASELINE
config 1) -> device windowing, CQT, model heads, overlap trim, on-device
note decoding -> note events on host — for a batch of recordings processed
with pipelined uploads (BASELINE config 2). Prints one JSON line:

    {"metric": ..., "value": N, "unit": "audio_sec_per_sec_per_chip",
     "vs_baseline": N / 500}

Baseline: the reference publishes no throughput numbers (BASELINE.md); the
driver-set target is 500x real-time per TPU v5e chip at note-F1 parity, so
vs_baseline = value / 500. The headline `value` is the MEDIAN of the timed
rounds; per-stage attribution is device_get-forced (on this runtime
block_until_ready does not await compute), and the model stage carries an
analytic-FLOPs MFU figure (utils/flops.py). Note events produced here are identical to the
reference decoder's output on the same posteriorgrams (see
tests/test_device_decode.py); model posteriorgrams are within 1e-4 of the
reference TF checkpoint (tests/test_model.py), so the measured pipeline is
the parity pipeline, not a degraded fast path.
"""

from __future__ import annotations

import json
import time

import numpy as np


def synth_audio(seconds: float, sample_rate: int = 22050, seed: int = 0) -> np.ndarray:
    """Polyphonic piano-ish test signal: random note events with decay."""
    rng = np.random.RandomState(seed)
    n = int(seconds * sample_rate)
    y = np.zeros(n, dtype=np.float32)
    t_total = np.arange(n) / sample_rate
    n_notes = int(seconds * 3)  # ~3 notes/sec
    for _ in range(n_notes):
        start = rng.rand() * (seconds - 1.0)
        dur = 0.2 + rng.rand() * 1.5
        midi = rng.randint(36, 84)
        f0 = 440.0 * 2 ** ((midi - 69) / 12)
        i0, i1 = int(start * sample_rate), min(int((start + dur) * sample_rate), n)
        t = t_total[: i1 - i0]
        env = np.exp(-3.0 * t) * min(1.0, (i1 - i0) / (0.01 * sample_rate))
        tone = np.zeros_like(t)
        for h in (1, 2, 3):
            tone += (0.5 ** (h - 1)) * np.sin(2 * np.pi * f0 * h * t)
        y[i0:i1] += (0.1 + 0.15 * rng.rand()) * env * tone
    peak = np.abs(y).max()
    if peak > 0.95:
        y *= 0.95 / peak
    return y


def real_audio(seconds: float, sample_rate: int = 22050) -> np.ndarray:
    """Real-recording-derived workload: the reference's vocadito vocal clip,
    tiled to the requested length (posteriorgram density of real music, not
    a synthetic sine pile)."""
    import pathlib

    from basic_pitch_tpu.utils import audio as audio_io

    clip_path = pathlib.Path("/root/reference/tests/resources/vocadito_10.wav")
    if not clip_path.exists():  # fall back to synthetic when fixtures absent
        return synth_audio(seconds, sample_rate, seed=99)
    samples, sr = audio_io.read_wav(str(clip_path))
    mono = audio_io.resample(audio_io.to_mono(samples), sr, sample_rate)
    n = int(seconds * sample_rate)
    reps = -(-n // len(mono))
    return np.tile(mono, reps)[:n]


_CAL_BYTES = 8 * 1024 * 1024  # fixed-size raw link probe (8 MiB of int16)
_CAL_ARRAY = None


def link_calibration() -> float:
    """Median MiB/s of a fixed-size raw `device_put` — the same-session
    weather reference every bench round records (VERDICT r4 #4), so
    round-over-round deltas decompose into {code, weather}. The array and
    shape are reused (novel shapes cost ~40-66 ms extra on this runtime,
    LINK_PROBE.json) and the first transfer after process start is warmed
    before timing."""
    global _CAL_ARRAY
    import jax
    import jax.numpy as jnp

    if _CAL_ARRAY is None:
        _CAL_ARRAY = np.zeros(_CAL_BYTES // 2, dtype=np.int16)
        jax.device_put(_CAL_ARRAY)  # warm the shape
    probe = jax.jit(lambda x: jnp.sum(x[-8:]))
    samples = []
    for _ in range(3):
        t0 = time.time()
        dev = jax.device_put(_CAL_ARRAY)
        jax.device_get(probe(dev))
        samples.append(_CAL_BYTES / (1024 * 1024) / (time.time() - t0))
    return round(float(np.median(samples)), 1)


def measure_stages(transcriber, pcm: np.ndarray) -> dict:
    """Synchronously time each pipeline stage for one recording.

    The production path enqueues everything async; this pass serializes the
    stages so the cost of each is attributable: upload (host->device link,
    incl. codec unpack), model (window+CQT+heads+trim), decode (fused note
    decoder), fetch (device->host of events). Each stage is forced with a
    `device_get` of a tiny probe value — on this tunneled runtime
    `block_until_ready` does NOT await enqueued computation (measured,
    tools/link_probe.py), so only a host fetch of a result that depends on
    the stage's output proves the device finished it. Returns seconds per
    stage plus MFU for the model stage (utils/flops.py).
    """
    import jax
    import jax.numpy as jnp

    from basic_pitch_tpu import pipeline
    from basic_pitch_tpu.ops import pcmcodec
    from basic_pitch_tpu.utils import flops as flops_mod

    tr = transcriber
    pad_front = pipeline.OVERLAP // 2
    n_windows = max(1, -(-(len(pcm) + pad_front) // pipeline.HOP))
    n_chunks = -(-n_windows // tr.w)
    n_frames = int(len(pcm) / pipeline.HOP * pipeline.FRAMES_PER_WINDOW)

    pieces = list(tr._pieces(pcm, False, n_chunks))
    piece_fn = tr._piece_fn(False)
    use_codec = tr._codec_enabled(pcm.dtype)

    # device-in-order execution: a probe program enqueued after a stage's
    # programs depends on the last one, so fetching its (tiny) result forces
    # the whole stage without fetching the stage's (large) outputs
    probe_sum = jax.jit(lambda x: jnp.sum(x[-1]))

    t0 = time.time()
    dev_pieces = []
    upload_bytes = 0
    for piece in pieces:
        if use_codec:
            packed = pcmcodec.pack(piece)
            if packed.packed_bytes < piece.nbytes:
                upload_bytes += packed.packed_bytes
                dev_pieces.append(pcmcodec.decode_to_device(packed, len(piece)))
                continue
        upload_bytes += piece.nbytes
        dev_pieces.append(jax.device_put(piece))
    # include the codec's device-side unpack in the upload stage (it is
    # transport cost) by forcing the last piece's samples
    jax.device_get(probe_sum(dev_pieces[-1]))
    t_upload = time.time() - t0

    t0 = time.time()
    # same compute grouping as the production _dispatch path: one model
    # program per `compute_group` pieces (tools/dispatch_ab.json)
    outs = []
    i = 0
    while i < len(dev_pieces):
        k = min(tr.compute_group, len(dev_pieces) - i)
        if k == 1:
            outs.append(piece_fn(tr.params, dev_pieces[i]))
        else:
            outs.extend(tr._group_fn(False, False, k)(tr.params, *dev_pieces[i : i + k]))
        i += k
    jax.device_get(probe_sum(outs[-1]["note"]))
    t_model = time.time() - t0

    decode_keys = ("note", "onset", "bends")
    outs = [{k: c[k] for k in decode_keys} for c in outs]
    bucket = 1 << max(0, (n_chunks - 1).bit_length())
    outs.extend([tr._zero_chunk()] * (bucket - n_chunks))
    # same auto-scaled note capacity as _dispatch (shares its executable)
    max_notes = max(16384, bucket * tr.w * pipeline.FRAMES_PER_WINDOW // 8)
    decode = tr._decode_fused_fn(True, max_notes, True, True, bucket)
    t0 = time.time()
    decoded_dev, bends_inline, _ = decode(outs, n_frames, 0.5, 0.3, 11, None)
    n_notes, _overflow = jax.device_get((decoded_dev.n_notes, decoded_dev.overflow))
    t_decode = time.time() - t0

    # the shrunk fetch of _fetch_tickets: a pow2-bucketed slice of the real
    # note slots (the count round trip above already forced the decode)
    t0 = time.time()
    out_cap = tr._shrink_bucket(int(n_notes), int(decoded_dev.starts.shape[0]))
    jax.device_get(tr._shrink_fn(True, out_cap)(decoded_dev, bends_inline))
    t_fetch = time.time() - t0

    model_flops = n_chunks * tr.w * flops_mod.window_forward_flops()
    mfu = flops_mod.mfu_report(
        model_flops, t_model, jax.devices()[0].device_kind
    )
    return {
        "upload_s": round(t_upload, 4),
        "model_s": round(t_model, 4),
        "decode_s": round(t_decode, 4),
        "fetch_s": round(t_fetch, 4),
        "upload_bytes": upload_bytes,
        "n_chunks": n_chunks,
        "model_gflops": round(model_flops / 1e9, 1),
        **mfu,
    }


def main() -> None:
    from basic_pitch_tpu import pipeline

    n_files = 4
    seconds_per_file = 600.0
    audio_seconds = n_files * seconds_per_file

    # PCM16 at the model rate: byte-identical to what a 22.05 kHz WAV holds.
    # Three synthetic piano-ish recordings plus one real vocal recording
    # (tiled vocadito) so the decoder's note-density-dependent cost is
    # exercised on real music too.
    recordings = []
    for seed in range(n_files - 1):
        y = synth_audio(seconds_per_file, seed=seed)
        pcm = np.clip(np.round(y * 32768.0), -32768, 32767).astype(np.int16)
        recordings.append((pcm, 22050))
    y = real_audio(seconds_per_file)
    pcm = np.clip(np.round(y * 32768.0), -32768, 32767).astype(np.int16)
    recordings.append((pcm, 22050))

    # single-stream workloads: one 20-min recording (steady-state streaming)
    # and one 1-hour recording (the long-context configuration, BASELINE
    # config 3 — previously the worst number in the table and unmeasured)
    single_seconds = 1200.0
    y = synth_audio(single_seconds, seed=7)
    single_pcm = np.clip(np.round(y * 32768.0), -32768, 32767).astype(np.int16)
    hour_seconds = 3600.0
    y = synth_audio(hour_seconds, seed=8)
    hour_pcm = np.clip(np.round(y * 32768.0), -32768, 32767).astype(np.int16)
    del y

    # auto backend: probe XLA-loop vs Pallas decode once and use the measured
    # winner (pallas on this runtime, ~2x per-note; recordings past the
    # VMEM frame gate fall back to the XLA decoder automatically). The PCM
    # transport (residual codec vs raw int16) is likewise measured per
    # process and re-measured across the run (ops/transport.py) — the link
    # this rides varies 35 MB/s..~1 GB/s between sessions.
    transcriber = pipeline.StreamingTranscriber(
        windows_per_chunk=192, decode_backend="auto", pcm_transport="auto"
    )

    import sys

    def note(msg):  # progress to stderr; stdout stays one JSON line
        print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)

    note(f"decode backend: {transcriber.decode_backend}")
    from basic_pitch_tpu.ops import transport as transport_mod

    transport_probe = transport_mod.report()
    note(
        f"pcm transport: {transport_probe['transport']} "
        f"(raw {transport_probe.get('raw_mib_s', '?')} MiB/s vs codec "
        f"{transport_probe.get('codec_mib_s', '?')} MiB/s effective)"
    )
    # warmup: compile chunk + decode executables at ALL bench shapes,
    # including the batch path itself — round 1 of earlier benches ran ~4x
    # slow because transcribe_batch's shrink buckets and the per-recording
    # piece shapes compiled inside the first timed round (VERDICT r3 weak #2).
    # (retry once — a transient tunnel error here must not kill the bench)
    try:
        transcriber.transcribe_batch(recordings)
    except Exception:
        transcriber.transcribe_batch(recordings)
    note("warm: 10-min batch shapes")
    transcriber.transcribe(single_pcm, 22050)
    note("warm: 20-min shapes")
    transcriber.transcribe(hour_pcm, 22050)
    note("warm: 1-hour shapes")

    # best-of-N with the full spread recorded: tunnel throughput varies
    # ~2-3x minute-to-minute (DESIGN.md §5); interleaving the modes spreads
    # each metric's samples across more tunnel weather
    batch_runs, single_runs, hour_runs, events = [], [], [], []
    cal_runs, stage_rounds, overlap_rounds = [], [], []
    failures = 0
    for round_i in range(7):
        # re-measure the transport OUTSIDE the timed region (force=True takes
        # the fresh winner): "auto" keeps tracking tunnel weather between
        # rounds, but the probe's own transfers never ride inside a timed
        # measurement (they contend for the same serial link — measured ~19x
        # upload slowdown under concurrent activity, tools/link_probe.py)
        transport_mod.probe(force=True)
        # a tunneled remote device occasionally drops a dispatch; one bad
        # round must not lose the whole measurement
        try:
            # same-session weather reference: fixed-size raw device_put
            cal_runs.append(link_calibration())

            t0 = time.time()
            results = transcriber.transcribe_batch(recordings)
            batch_runs.append(audio_seconds / (time.time() - t0))
            events = results

            t0 = time.time()
            transcriber.transcribe(single_pcm, 22050)
            single_runs.append(single_seconds / (time.time() - t0))

            # hour-scale every round: under 2-3x tunnel-weather variance the
            # recorded best-of-N needs as many samples as the other modes
            # (warm repeats cost ~3-7 s each since the Pallas decode rewrite)
            t0 = time.time()
            transcriber.transcribe(hour_pcm, 22050)
            hour_runs.append(hour_seconds / (time.time() - t0))

            # per-stage pass INSIDE the round: overlap_efficiency compares
            # this round's serialized sum against this round's production
            # wall under the SAME tunnel weather (VERDICT r4 weak #2 — the
            # old single end-of-run stage pass made the two incomparable)
            stage_r = measure_stages(transcriber, single_pcm)
            stage_rounds.append(stage_r)
            serial_r = (
                stage_r["upload_s"] + stage_r["model_s"]
                + stage_r["decode_s"] + stage_r["fetch_s"]
            )
            overlap_rounds.append(
                round(1.0 - (single_seconds / serial_r) / single_runs[-1], 3)
            )
            note(
                f"round {round_i + 1}/7: batch {batch_runs[-1]:.0f}x, "
                f"single {single_runs[-1]:.0f}x, hour {hour_runs[-1]:.0f}x, "
                f"link {cal_runs[-1]:.0f} MiB/s, overlap {overlap_rounds[-1]:.2f}"
            )
        except Exception as err:  # noqa: BLE001 — transient PJRT/tunnel errors
            failures += 1
            import sys
            import traceback

            traceback.print_exc()
            print(f"bench round failed ({err!r}); continuing", file=sys.stderr)
            if failures >= 3:
                raise

    # per-stage attribution: the MEDIAN per field across the in-round stage
    # passes (each one device_get-forced and serialized)
    stages = {
        k: (
            round(float(np.median([s[k] for s in stage_rounds])), 4)
            if isinstance(stage_rounds[0][k], float)
            else stage_rounds[0][k]
        )
        for k in stage_rounds[0]
    }
    device_s = stages["model_s"] + stages["decode_s"]
    serialized = device_s + stages["upload_s"] + stages["fetch_s"]

    def stats(runs):
        return {
            "best": round(max(runs), 1),
            "median": round(float(np.median(runs)), 1),
            "spread": [round(r, 1) for r in sorted(runs)],
        }

    # headline = MEDIAN of the rounds (the defensible statistic under
    # minute-scale tunnel-weather variance), not best-of-N (VERDICT r3)
    headline = float(np.median(batch_runs))
    median_single = float(np.median(single_runs))
    # how much of the serialized stage sum the production path hides:
    # 1 - serialized_xRT/measured_xRT, computed PER ROUND under matched
    # weather and reported as median + spread. Device compute (enqueued
    # async) runs under the synchronous host upload stream, so model/decode
    # time largely disappears behind upload_s; host-side upload THREADING is
    # separately rejected (unreliable under congestion — LINK_PROBE.json)
    overlap_efficiency = round(float(np.median(overlap_rounds)), 3)
    # link-normalized 20-min e2e at a FIXED reference link speed: a pure
    # code-progress number — round-over-round deltas here are code, deltas
    # in `calibration.link_mib_s` are weather (VERDICT r4 #4)
    ref_link_mib_s = 100.0
    normalized_e2e = single_seconds / (
        stages["upload_bytes"] / (ref_link_mib_s * 1024 * 1024)
        + device_s
        + stages["fetch_s"]
    )
    print(
        json.dumps(
            {
                "metric": "end_to_end_transcription_throughput",
                "value": round(headline, 1),
                "unit": "audio_sec_per_sec_per_chip",
                "vs_baseline": round(headline / 500.0, 3),
                "detail": {
                    "n_files": n_files,
                    "audio_seconds": audio_seconds,
                    "note_events": sum(len(e) for e in events),
                    "aggregate": stats(batch_runs),
                    "single_stream_20min": stats(single_runs),
                    "single_stream_1hour": stats(hour_runs),
                    "single_stream_x_realtime": round(median_single, 1),
                    "single_stream_file_s": single_seconds,
                    "calibration": {
                        "link_mib_s": cal_runs,
                        "link_mib_s_median": round(float(np.median(cal_runs)), 1),
                        "probe_bytes": _CAL_BYTES,
                        "note": (
                            "fixed-size raw device_put per round — the "
                            "same-session weather reference; compare across "
                            "BENCH_r*.json to attribute round-over-round "
                            "deltas to {code, weather}"
                        ),
                    },
                    "normalized": {
                        "e2e_20min_x_at_100mibs_link": round(normalized_e2e, 1),
                        "device_only_x_realtime": round(single_seconds / device_s, 1),
                        "note": (
                            "counterfactual 20-min e2e with the measured "
                            "median stage times and the link pinned at 100 "
                            "MiB/s — a weather-free code-progress metric"
                        ),
                    },
                    "stages": {
                        **stages,
                        "audio_s": single_seconds,
                        "device_only_x_realtime": round(single_seconds / device_s, 1),
                        "link_bound_fraction": round(
                            stages["upload_s"] / serialized, 3
                        ),
                        "overlap_efficiency": overlap_efficiency,
                        "overlap_efficiency_rounds": overlap_rounds,
                        "note": (
                            "median across per-round serialized, device_get-"
                            "forced stage passes on the 20-min stream; "
                            "overlap_efficiency compares each round's "
                            "serialized sum to the SAME round's production "
                            "wall (matched weather) — device compute runs "
                            "under the synchronous host upload stream "
                            "(enqueued async), so model/decode time largely "
                            "disappears behind upload_s; host-side upload "
                            "threading is NOT used (unreliable under "
                            "congestion — LINK_PROBE.json)"
                        ),
                    },
                    "decode_backend": transcriber.decode_backend,
                    # re-fetch: auto mode re-probes on a TTL during the run,
                    # so the cache holds the latest measurement
                    "pcm_transport": transport_mod.report(),
                    "pipeline": "22.05kHz PCM16 -> device window+CQT+model+decode -> events",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
