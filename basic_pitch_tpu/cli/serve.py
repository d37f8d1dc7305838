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
        "--max-batch", type=int, default=8,
        help="max concurrent requests fused into one device dispatch",
    )
    parser.add_argument(
        "--max-wait-ms", type=float, default=25.0,
        help="how long the first request in a batch waits for company",
    )
    return parser


def main(args=None) -> None:
    ns = build_parser().parse_args(args)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    from basic_pitch_tpu import pipeline, serve

    transcriber = pipeline.StreamingTranscriber(
        ns.model_path,
        windows_per_chunk=ns.windows_per_chunk,
        decode_backend=ns.decode_backend,
        pcm_transport=ns.pcm_transport,
    )
    service = serve.TranscriptionService(
        transcriber, max_batch=ns.max_batch, max_wait_ms=ns.max_wait_ms
    )
    server = serve.make_server(service, ns.host, ns.port)
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
