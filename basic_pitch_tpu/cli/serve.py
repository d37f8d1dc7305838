"""``basic-pitch-serve`` — HTTP transcription server.

The reference has no serving surface (SURVEY §5); this front-ends the
TPU pipeline (`basic_pitch_tpu.serve`) so one chip's ~1000x-realtime
throughput is shared across concurrent callers via request batching.
"""

from __future__ import annotations

import argparse
import logging

from basic_pitch_tpu.models.params import ICASSP_2022_WEIGHTS_PATH


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Serve basic-pitch transcription over HTTP "
        "(POST /v1/transcribe with a WAV body; GET /healthz, /metrics)."
    )
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8132)
    parser.add_argument(
        "--model-path",
        default=str(ICASSP_2022_WEIGHTS_PATH),
        help="checkpoint: flat-npz archive or any reference serialization",
    )
    parser.add_argument(
        "--windows-per-chunk", type=int, default=128,
        help="device dispatch width (see StreamingTranscriber)",
    )
    parser.add_argument(
        "--decode-backend", choices=["xla", "pallas", "auto"], default="auto",
        help="note decoder: measured winner by default",
    )
    parser.add_argument(
        "--pcm-transport", choices=["codec", "raw", "auto"], default="auto",
        help="how PCM crosses the host->device link: measured by default",
    )
    parser.add_argument(
        "--head-precision", choices=["highest", "high", "default"],
        default="highest",
        help="MXU precision for the model's head convs only (the CQT "
        "front-end always runs HIGHEST). 'high' is a measured 1.57x "
        "model-stage speedup whose churn was ONE event offset frame in "
        "5673 on dense material (tools/precision_ab.json); 'highest' "
        "keeps exact event parity with the library path",
    )
    parser.add_argument(
        "--max-batch", type=int, default=8,
        help="max concurrent requests fused into one device dispatch",
    )
    parser.add_argument(
        "--max-wait-ms", type=float, default=25.0,
        help="how long the first request in a batch waits for company",
    )
    parser.add_argument(
        "--max-queue", type=int, default=32,
        help="bounded admission: pending requests beyond this are shed "
        "with HTTP 503 + Retry-After instead of queueing unboundedly",
    )
    parser.add_argument(
        "--request-timeout", type=float, default=None, metavar="SECONDS",
        help="per-request deadline: callers waiting longer get HTTP 504 and "
        "their request is dropped from later batches (default: no timeout)",
    )
    parser.add_argument(
        "--max-body-mb", type=float, default=256.0,
        help="largest accepted request body (413 beyond it)",
    )
    parser.add_argument(
        "--warmup", default="30",
        help="comma-separated clip lengths (seconds) to transcribe at boot so "
        "their executables exist before the first caller (novel shape "
        "buckets otherwise pay a one-time compile); '' disables",
    )
    return parser


def _warm(transcriber, lengths_csv: str) -> None:
    import time

    import numpy as np

    from basic_pitch_tpu import constants

    sr = constants.AUDIO_SAMPLE_RATE
    for field in lengths_csv.split(","):
        field = field.strip()
        if not field:
            continue
        seconds = float(field)
        t = np.arange(int(seconds * sr)) / sr
        # repeating plucked tones: cheap to synthesize, dense enough in
        # notes to exercise realistic decode/fetch capacity buckets
        y = 0.3 * np.sin(2 * np.pi * 220.0 * t) * np.exp(-2.0 * (t % 0.5))
        pcm = np.clip(np.round(y * 32768.0), -32768, 32767).astype(np.int16)
        t0 = time.time()
        transcriber.transcribe(pcm, sr)
        logging.info("warmed %.0fs shapes in %.1fs", seconds, time.time() - t0)


def main(args: "list[str] | None" = None) -> None:
    ns = build_parser().parse_args(args)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    from basic_pitch_tpu import pipeline, serve

    import jax

    head_precision = {
        "highest": None,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }[ns.head_precision]
    transcriber = pipeline.StreamingTranscriber(
        ns.model_path,
        windows_per_chunk=ns.windows_per_chunk,
        decode_backend=ns.decode_backend,
        pcm_transport=ns.pcm_transport,
        head_precision=head_precision,
    )
    if ns.warmup:
        _warm(transcriber, ns.warmup)
    service = serve.TranscriptionService(
        transcriber,
        max_batch=ns.max_batch,
        max_wait_ms=ns.max_wait_ms,
        max_queue=ns.max_queue,
        request_timeout_s=ns.request_timeout,
    )
    server = serve.make_server(
        service, ns.host, ns.port,
        max_body_bytes=int(ns.max_body_mb * (1 << 20)),
    )
    host, port = server.server_address[:2]
    logging.info(
        "basic-pitch-serve on http://%s:%d (decode=%s transport=%s)",
        host, port, transcriber.decode_backend, transcriber.pcm_transport,
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
        service.close()


if __name__ == "__main__":
    main()
