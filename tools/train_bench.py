"""Real-hardware training benchmark at the design point (VERDICT r2 #1).

Reproduces the reference's "download GuitarSet and train" workflow
(`/root/reference/basic_pitch/train.py:35-168` + BASELINE config 5) end to
end on the current accelerator and records the numbers that matter:

1. corpus   — GuitarSet-layout plucked-string corpus (tools/make_guitar_corpus)
2. ETL      — the real `bp-download guitarset` builder -> TFRecord shards
3. training — the real `data/loader` feeding the jitted train step, with
              per-step wall time AND per-step loader blocking time measured
              in steady state (compile excluded)
4. eval     — held-out tracks transcribed with the TRAINED checkpoint
              through the standard predict path (StreamingTranscriber) and
              scored against ground truth (mir_eval semantics)

Writes ``TRAIN_BENCH.json`` at the repo root:
  step_time_ms (p50/p90), audio-windows/s, loader feed margin (fraction of
  step time the input pipeline hides: 1 - loader_block/step_wall),
  loss trajectory, held-out note-F1, device.

Run: ``python tools/train_bench.py`` (defaults: 40 tracks x 30 s, 2000
steps, batch 16). A RUN_TPU_TESTS-gated test runs a miniature version.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import tempfile
import time

import numpy as np

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))
sys.path.insert(0, str(REPO_ROOT / "tools"))


def build_corpus_and_shards(workdir: pathlib.Path, n_tracks: int, seconds: float):
    """Corpus synthesis + the real guitarset builder -> TFRecord shards."""
    import make_guitar_corpus as mgc

    from basic_pitch_tpu.data.datasets import guitarset

    corpus = workdir / "corpus"
    t0 = time.time()
    mgc.make_corpus(corpus, n_tracks=n_tracks, track_seconds=seconds)
    t_synth = time.time() - t0

    shards = workdir / "shards"
    args = guitarset.build_parser().parse_args(
        [
            "--source", str(corpus),
            "--destination", str(shards),
            "--timestamped", "false",
            "--train-percent", "0.8",
            "--validation-percent", "0.1",
            "--split-seed", "7",
        ]
    )
    t0 = time.time()
    guitarset.main(args)
    t_etl = time.time() - t0
    return corpus, shards, {"synth_s": round(t_synth, 1), "etl_s": round(t_etl, 1)}


def timed_training(shards, steps: int, batch_size: int, learning_rate: float,
                   warmup_steps: int = 10, shuffle: int = 100, sync_every: int = 50,
                   device_targets: bool = False, pcm_transport: str = "auto",
                   steps_per_dispatch: int = 1, precision: str = "highest"):
    """Train with the production loader + jitted step; time both sides.

    Steps are ENQUEUED asynchronously (dispatch pipelining — the production
    loop's behavior) and the loss is fetched every ``sync_every`` steps
    (device_get — the only operation that truly awaits compute on this
    runtime), so the amortized step time measures the chip + link + loader.
    Batch audio rides the measured PCM transport: packed on the prefetch
    thread, reconstructed in HBM (train_loop.packed_batches/upload_batch).
    The per-step fully-synchronous latency is recorded separately.
    """
    import jax

    from basic_pitch_tpu.data import loader
    from basic_pitch_tpu.models import nmp
    from basic_pitch_tpu.train import loop as train_loop

    train_iter, _ = loader.prepare_datasets(
        str(shards), shuffle, batch_size, 2, ["guitarset"], [1.0], seed=0,
        device_targets=device_targets, parse_workers=4,
    )
    k = max(1, steps_per_dispatch)
    if k > 1:
        # scan k optimizer steps inside one program: ONE dispatch + ONE
        # upload per group (tools/dispatch_overhead.json: ~23 ms/dispatch)
        train_iter = train_loop.grouped_batches(train_iter, k)
    if device_targets:
        train_iter = train_loop.packed_batches(train_iter, pcm_transport)
    config = train_loop.TrainConfig(
        learning_rate=learning_rate, precision=precision
    )
    optimizer = train_loop.make_optimizer(config)
    params = nmp.init_params(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)
    step = (
        train_loop.build_multi_step(optimizer, config) if k > 1
        else train_loop.build_train_step(optimizer, config)
    )

    def last_loss(metrics):
        return metrics["loss"][-1] if k > 1 else metrics["loss"]

    losses = []
    first_loss = None
    loader_block_s = 0.0
    upload_s = 0.0
    upload_bytes = 0
    sync_latency_ms = None
    steady_t0 = None
    steady_steps = 0
    n_dispatches = max(1, steps // k)
    warmup_dispatch = max(1, warmup_steps // k)
    sync_dispatches = max(1, sync_every // k)
    for i in range(n_dispatches):
        t0 = time.time()
        batch = next(train_iter)
        t_loader = time.time() - t0

        t0 = time.time()
        batch, nbytes = train_loop.upload_batch(batch)
        t_upload = time.time() - t0

        params, opt_state, metrics = step(params, opt_state, batch)

        if i == 0 or i == n_dispatches - 1 or (i + 1) % sync_dispatches == 0:
            loss = float(jax.device_get(last_loss(metrics)))
            if first_loss is None:
                first_loss = loss
            losses.append(round(loss, 4))
        if i == warmup_dispatch:
            # one loss fetch (full sync), then start the steady-state clock;
            # also record the fully-synchronous single-step latency once
            t0 = time.time()
            params, opt_state, metrics = step(params, opt_state, batch)
            float(jax.device_get(last_loss(metrics)))
            sync_latency_ms = (time.time() - t0) * 1e3 / k
            steady_t0 = time.time()
            loader_block_s = 0.0
            upload_s = 0.0
            upload_bytes = 0
        elif steady_t0 is not None:
            loader_block_s += t_loader
            upload_s += t_upload
            upload_bytes += nbytes
            steady_steps += k
    float(jax.device_get(last_loss(metrics)))
    steady_wall = time.time() - steady_t0 if steady_t0 is not None else 0.0

    amortized_ms = steady_wall / max(steady_steps, 1) * 1e3
    feed_margin = float(np.clip(1.0 - loader_block_s / max(steady_wall, 1e-9), 0.0, 1.0))
    stats = {
        "steps": steps,
        "batch_size": batch_size,
        "steps_per_dispatch": k,
        "learning_rate": learning_rate,
        "step_time_ms_amortized": round(amortized_ms, 2),
        "step_latency_ms_synchronous": round(sync_latency_ms or 0.0, 2),
        "windows_per_s": round(batch_size / (amortized_ms / 1e3), 1),
        "audio_sec_per_s": round(batch_size * 2.0 / (amortized_ms / 1e3), 1),
        "loader_block_ms_per_step": round(loader_block_s / max(steady_steps, 1) * 1e3, 3),
        "loader_feed_margin": round(feed_margin, 4),
        "upload_ms_per_step": round(upload_s / max(steady_steps, 1) * 1e3, 3),
        "upload_bytes_per_step": int(upload_bytes / max(steady_steps, 1)),
        "first_loss": round(first_loss, 4),
        "final_loss": losses[-1],
        "loss_trajectory": losses,
    }
    return params, stats


def step_anatomy(shards, batch_size: int, k: int = 16):
    """Device-time attribution of one train step (VERDICT r3 #4).

    With ONE batch resident in HBM (no upload in the timed region), enqueue
    k chained steps and force completion with a device_get of the last loss
    — on this runtime that is the only way to measure device time
    (LINK_PROBE.json: block_until_ready does not await compute). Forward
    cost comes from the eval step the same way. Returns per-step forward ms,
    fwd+bwd ms, their ratio, and train-step MFU from analytic FLOPs.
    """
    import jax

    from basic_pitch_tpu.data import loader
    from basic_pitch_tpu.models import nmp
    from basic_pitch_tpu.train import loop as train_loop
    from basic_pitch_tpu.utils import flops as flops_mod

    train_iter, _ = loader.prepare_datasets(
        str(shards), 0, batch_size, 2, ["guitarset"], [1.0], seed=0,
        device_targets=True,
    )
    batch_host = next(train_iter)
    batch, _ = train_loop.upload_batch(batch_host)
    config = train_loop.TrainConfig()
    optimizer = train_loop.make_optimizer(config)
    params = nmp.init_params(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)
    # non-donating variants: the anatomy loop reuses its inputs
    step = train_loop.build_train_step(optimizer, config)
    eval_step = train_loop.build_eval_step(config)

    # warm both executables
    p, o, m = step(params, opt_state, batch)
    float(jax.device_get(m["loss"]))
    float(jax.device_get(eval_step(p, batch)["loss"]))

    def timed(fn):
        t0 = time.time()
        fn()
        return (time.time() - t0) * 1e3

    def run_train():
        nonlocal p, o
        for _ in range(k):
            p, o, m = step(p, o, batch)
        float(jax.device_get(m["loss"]))

    def run_eval():
        for _ in range(k):
            m = eval_step(p, batch)
        float(jax.device_get(m["loss"]))

    fwd_ms = min(timed(run_eval) for _ in range(3)) / k
    fwdbwd_ms = min(timed(run_train) for _ in range(3)) / k

    # scan-fused step: k real optimizer steps inside ONE executable — the
    # honest device compute, with the ~23 ms/dispatch runtime latency
    # amortized away (tools/dispatch_overhead.json). Params change every
    # iteration, so nothing is loop-invariant-hoisted.
    multi = train_loop.build_multi_step(optimizer, config)
    stacked, _ = train_loop.upload_batch(
        train_loop.stack_batches([batch_host] * k)
    )
    # fresh trees: the warm-up step() above DONATED params/opt_state
    p2 = nmp.init_params(jax.random.PRNGKey(0))
    o2 = optimizer.init(p2)
    p2, o2, ms = multi(p2, o2, stacked)
    float(jax.device_get(ms["loss"][-1]))  # warm

    def run_scan():
        nonlocal p2, o2
        p2, o2, ms = multi(p2, o2, stacked)
        float(jax.device_get(ms["loss"][-1]))

    fwdbwd_scan_ms = min(timed(run_scan) for _ in range(3)) / k

    train_flops = batch_size * flops_mod.train_step_flops_per_window()
    mfu = flops_mod.mfu_report(
        train_flops, fwdbwd_scan_ms / 1e3, jax.devices()[0].device_kind
    )
    return {
        "batch_size": batch_size,
        "k_steps": k,
        "fwd_ms": round(fwd_ms, 2),
        "fwd_bwd_ms": round(fwdbwd_ms, 2),
        "fwd_bwd_scan_ms": round(fwdbwd_scan_ms, 2),
        "dispatch_overhead_ms": round(fwdbwd_ms - fwdbwd_scan_ms, 2),
        "bwd_over_fwd": round(fwdbwd_ms / max(fwd_ms, 1e-9) - 1.0, 2),
        "train_step_gflops": round(train_flops / 1e9, 1),
        **mfu,
        "note": (
            "fwd/fwd_bwd: device_get-forced over k CHAINED dispatches (each "
            "pays the runtime's fixed per-execute latency); fwd_bwd_scan: the "
            "same k steps scan-fused into one executable — the honest device "
            "compute. MFU is computed from the scan number."
        ),
    }


def heldout_f1(corpus, shards, params):
    """Transcribe the TEST split's tracks with the trained checkpoint through
    the standard predict path; score vs the ground-truth JAMS."""
    import make_guitar_corpus as mgc

    from basic_pitch_tpu import pipeline
    from basic_pitch_tpu.utils import audio as audio_io
    from basic_pitch_tpu.utils import eval as eval_metrics

    import csv

    with open(shards / "guitarset" / "index.csv") as fh:
        rows = list(csv.reader(fh))
    test_ids = sorted(tid for split, tid in rows if split == "test")
    if not test_ids:
        return {"heldout_note_f1": None, "n_heldout_tracks": 0}

    tr = pipeline.StreamingTranscriber(params, windows_per_chunk=32)
    scores, onset_scores = [], []
    for track_id in test_ids:
        wav = corpus / "audio_mono-mic" / f"{track_id}_mic.wav"
        samples, sr = audio_io.read_wav(str(wav))
        events = tr.transcribe(audio_io.to_mono(samples), sr)
        est = eval_metrics.events_to_notes(events)
        truth = mgc.truth_events(corpus, track_id)
        onset_scores.append(eval_metrics.precision_recall_f1(truth, est)["f1"])
        scores.append(
            eval_metrics.precision_recall_f1(truth, est, offset_ratio=0.2)["f1"]
        )
    return {
        "heldout_note_f1": round(float(np.mean(onset_scores)), 4),
        "heldout_note_f1_with_offsets": round(float(np.mean(scores)), 4),
        "n_heldout_tracks": len(test_ids),
    }


def _link_probe() -> dict:
    """Host->device MiB/s at measurement time (ops/transport.py probe)."""
    from basic_pitch_tpu.ops import transport

    r = transport.report()
    keep = ("raw_mib_s", "codec_mib_s", "transport", "note")
    return {k: r[k] for k in keep if k in r}


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tracks", type=int, default=40)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--steps", type=int, default=2000,
                    help="batch-16-equivalent steps; a batch-B run does steps*16/B")
    ap.add_argument("--batch-size", type=int, default=64,
                    help="headline batch size (LR scales by sqrt(B/16) from --lr)")
    ap.add_argument("--lr", type=float, default=1e-3, help="batch-16 learning rate")
    ap.add_argument("--sweep", default="16,128",
                    help="comma list of extra batch sizes for short sweep runs ('' skips)")
    ap.add_argument("--steps-per-dispatch", type=int, default=8,
                    help="optimizer steps scanned per device program in the "
                    "throughput arms (1 = the r4 per-step dispatch behavior)")
    ap.add_argument("--train-precision", default="highest",
                    choices=("highest", "high", "default"),
                    help="MXU precision for the timed TRAINING arms; the "
                    "batch-16 convergence comparator always runs highest "
                    "(tools/train_precision_ab.json for device-only A/B)")
    ap.add_argument("--no-baseline-f1", dest="baseline_f1", action="store_false",
                    help="skip the same-corpus batch-16 convergence comparator")
    ap.add_argument("--workdir", default=None, help="reuse a directory (default: temp)")
    ap.add_argument("--out", default=str(REPO_ROOT / "TRAIN_BENCH.json"))
    args = ap.parse_args(argv)

    import jax

    workdir = pathlib.Path(args.workdir or tempfile.mkdtemp(prefix="train_bench_"))
    workdir.mkdir(parents=True, exist_ok=True)
    print(f"workdir: {workdir}")

    corpus, shards, etl_stats = build_corpus_and_shards(workdir, args.tracks, args.seconds)
    print(f"corpus+ETL: {etl_stats}")

    def lr_for(bs: int) -> float:
        return args.lr * (bs / 16.0) ** 0.5  # sqrt LR scaling from the batch-16 rate

    def steps_for(bs: int, scale: int = 1) -> int:
        return max((args.steps * 16) // (bs * scale), 50)

    # device-only step anatomy: fwd vs fwd+bwd and train-step MFU, measured
    # before the timed runs (VERDICT r3 #4: locate the 135-vs-1687 gap)
    anatomy = [step_anatomy(shards, 16), step_anatomy(shards, args.batch_size)]
    for a in anatomy:
        print(f"anatomy: {a}")

    # headline: device-rasterized batches + packed audio transport at the
    # headline batch size, same total windows as the batch-16-equivalent
    # step budget (batch scaling trades steps for batch at sqrt-scaled LR)
    params, train_stats = timed_training(
        shards, steps_for(args.batch_size), args.batch_size,
        lr_for(args.batch_size), device_targets=True,
        steps_per_dispatch=args.steps_per_dispatch,
        precision=args.train_precision,
    )
    train_stats["train_precision"] = args.train_precision
    print(f"training (batch {args.batch_size}): {train_stats}")

    # short sweep runs: same pipeline at other batch sizes (1/4 the windows)
    sweep_stats = []
    for bs in [int(b) for b in args.sweep.split(",") if b]:
        _, s = timed_training(
            shards, steps_for(bs, 4), bs, lr_for(bs), device_targets=True,
            steps_per_dispatch=args.steps_per_dispatch,
            precision=args.train_precision,
        )
        print(f"sweep batch {bs}: {s}")
        sweep_stats.append(
            {k: s[k] for k in (
                "batch_size", "steps_per_dispatch", "learning_rate", "steps",
                "step_time_ms_amortized", "windows_per_s",
                "loader_feed_margin", "upload_ms_per_step",
                "upload_bytes_per_step", "first_loss", "final_loss",
            )}
        )
    train_stats["batch_sweep"] = sweep_stats

    # dense-batch short run: the transport baseline the sparse+packed path
    # improves on
    _, dense_stats = timed_training(
        shards, steps_for(args.batch_size, 4), args.batch_size,
        lr_for(args.batch_size),
    )
    print(f"training (dense batches): {dense_stats}")
    train_stats["dense_baseline"] = {
        k: dense_stats[k]
        for k in (
            "steps",
            "step_time_ms_amortized",
            "windows_per_s",
            "loader_feed_margin",
        )
    }

    f1_stats = heldout_f1(corpus, shards, params)
    print(f"held-out: {f1_stats}")

    if args.baseline_f1:
        # the convergence gate is SAME-CORPUS parity with the reference-
        # shaped batch-16 recipe (held-out F1 varies with the random corpus,
        # so cross-run absolute numbers don't compare)
        params16, _ = timed_training(
            shards, steps_for(16), 16, lr_for(16), device_targets=True
        )
        f1_16 = heldout_f1(corpus, shards, params16)
        print(f"batch-16 baseline held-out: {f1_16}")
        f1_stats["batch16_baseline_note_f1"] = f1_16["heldout_note_f1"]
        f1_stats["batch16_baseline_note_f1_with_offsets"] = f1_16[
            "heldout_note_f1_with_offsets"
        ]

    report = {
        "metric": "train_step_audio_windows_per_s",
        "value": train_stats["windows_per_s"],
        "unit": "windows_per_s",
        "detail": {
            "device": str(jax.devices()[0]),
            # link weather at measurement time: the training step is
            # batch-upload bound through a slow tunnel, so the recorded
            # throughput is only interpretable next to the link speed
            "link_probe": _link_probe(),
            "corpus": {
                "n_tracks": args.tracks,
                "track_seconds": args.seconds,
                "layout": "guitarset (audio_mono-mic + per-string JAMS)",
            },
            "step_anatomy": anatomy,
            **etl_stats,
            **train_stats,
            **f1_stats,
            "pipeline": (
                "make_guitar_corpus -> bp-download guitarset -> data/loader "
                "-> jitted train step -> StreamingTranscriber eval"
            ),
        },
    }
    pathlib.Path(args.out).write_text(json.dumps(report, indent=2))
    print(f"wrote {args.out}")
    return report


if __name__ == "__main__":
    main()
