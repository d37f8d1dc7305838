"""``basic-pitch-train`` command-line interface + training driver.

Flag surface mirrors the reference trainer
(`/root/reference/basic_pitch/train.py:171-288`), including the per-dataset
booleans generated from DATASET_SAMPLING_FREQUENCY and normalized sampling
weights; the execution path is the framework's jitted (optionally
multi-chip) train loop.
"""

from __future__ import annotations

import argparse
import logging
import os
import pathlib
from datetime import datetime, timezone
from typing import List

import numpy as np

from basic_pitch_tpu import constants

logging.basicConfig(level=logging.INFO)


def main(
    source: str,
    output: str,
    batch_size: int,
    shuffle_size: int,
    learning_rate: float,
    epochs: int,
    steps_per_epoch: int,
    validation_steps: int,
    size_evaluation_callback_datasets: int,
    datasets_to_use: List[str],
    dataset_sampling_frequency: np.ndarray,
    no_sonify: bool,
    no_contours: bool,
    weighted_onset_loss: bool,
    positive_onset_weight: float,
    data_parallel: bool = True,
    trainable_cqt: bool = False,
    device_targets: bool = True,
    coordinator: str = "",
    num_processes: int = 1,
    process_id: int = 0,
    parse_workers: int = 2,
    steps_per_dispatch: int = 1,
    train_precision: str = "highest",
) -> None:
    """Build datasets, model, and callbacks, then run the fit loop."""
    if num_processes > 1:
        # must run before any jax call initializes the backend
        from basic_pitch_tpu.parallel import distributed as dist

        dist.initialize(coordinator or None, num_processes, process_id)
    import jax

    from basic_pitch_tpu.data import loader
    from basic_pitch_tpu.models import nmp
    from basic_pitch_tpu.parallel import mesh as mesh_lib
    from basic_pitch_tpu.train import loop as train_loop
    from basic_pitch_tpu.train.visualize import VisualizeCallback

    logging.info("source directory: %s", source)
    logging.info("output directory: %s", output)
    logging.info("devices: %s", jax.devices())
    logging.info(
        "batch_size=%d shuffle_size=%d lr=%g epochs=%d steps/epoch=%d val_steps=%d",
        batch_size, shuffle_size, learning_rate, epochs, steps_per_epoch, validation_steps,
    )
    logging.info("datasets: %s, weights: %s", datasets_to_use, dataset_sampling_frequency)

    model_config = nmp.ModelConfig(no_contours=no_contours, trainable_cqt=trainable_cqt)
    train_iter, val_iter = loader.prepare_datasets(
        source,
        shuffle_size,
        batch_size,
        validation_steps,
        datasets_to_use,
        dataset_sampling_frequency,
        device_targets=device_targets,
        num_shards=num_processes,
        shard_index=process_id,
        parse_workers=parse_workers,
    )
    if steps_per_dispatch > 1:
        if num_processes > 1:
            raise ValueError("--steps-per-dispatch is single-process (multi-host feeds per-step batches)")
        # scan k optimizer steps inside ONE device program: amortizes the
        # fixed per-dispatch latency and merges k uploads into one transfer
        train_iter = train_loop.grouped_batches(train_iter, steps_per_dispatch)

    timestamp = datetime.now(timezone.utc).strftime("%Y%m%d-%H%M")
    run_dir = pathlib.Path(output) / timestamp
    tensorboard_log_dir = os.path.join(run_dir, "tensorboard")

    callbacks = []
    if size_evaluation_callback_datasets > 0:
        # restart the stream when a pass over the split completes: a single-
        # pass generator would silently stop feeding tensorboard partway
        # through a long run (the reference's tf.data re-iterates per epoch)
        def _cycling(split, seed=None):
            while True:
                empty = True
                for item in loader.example_stream(
                    split, source, datasets_to_use, dataset_sampling_frequency,
                    n_samples_per_track=1, seed=seed,
                ):
                    empty = False
                    yield item
                if empty:
                    return  # empty split: don't spin forever

        viz_batch = min(size_evaluation_callback_datasets, 4)
        callbacks.append(
            VisualizeCallback(
                loader._prefetch(loader._batched(_cycling("train", seed=0), viz_batch), 1),
                loader._prefetch(loader._batched(_cycling("validation"), viz_batch), 1),
                tensorboard_log_dir,
                sonify=not no_sonify,
                contours=not no_contours,
                model_config=model_config,
            )
        )

    mesh = None
    if data_parallel and len(jax.devices()) > 1:
        mesh = mesh_lib.make_mesh()
        if batch_size % mesh.devices.size != 0:  # not assert: survives -O
            raise ValueError(
                f"batch size {batch_size} must divide across "
                f"{mesh.devices.size} devices"
            )
        logging.info("training data-parallel over %d devices", mesh.devices.size)

    config = train_loop.TrainConfig(
        learning_rate=learning_rate,
        precision=train_precision,
        weighted_onset_loss=weighted_onset_loss,
        positive_onset_weight=positive_onset_weight,
        steps_per_epoch=steps_per_epoch,
        validation_steps=validation_steps,
        epochs=epochs,
    )
    train_loop.fit(
        train_iter,
        val_iter,
        run_dir,
        config=config,
        model_config=model_config,
        mesh=mesh,
        callbacks=tuple(callbacks),
        log=logging.info,
    )


def console_entry_point() -> None:
    parser = argparse.ArgumentParser(description="Train the NMP transcription model on TPU.")
    parser.add_argument("--source", required=True, help="directory containing <dataset>/splits/<split>/*.tfrecord")
    parser.add_argument("--output", required=True, help="directory for checkpoints and tensorboard logs")
    parser.add_argument("-e", "--epochs", type=int, default=500, help="number of training epochs")
    parser.add_argument("-b", "--batch-size", type=int, default=16,
                        help="global batch size (sharded across the device mesh)")
    parser.add_argument("-l", "--learning-rate", type=float, default=0.001, help="Adam learning rate")
    parser.add_argument("--steps-per-epoch", type=int, default=100, help="training batches per epoch")
    parser.add_argument("-v", "--validation-steps", type=int, default=10,
                        help="validation batches per validation run (positive integer)")
    parser.add_argument("-z", "--training-shuffle-buffer-size", type=int, default=100,
                        help="training dataset shuffle buffer size")
    parser.add_argument("--size-evaluation-callback-datasets", type=int, default=4,
                        help="number of examples used by the visualization callback")
    for dataset in constants.DATASET_SAMPLING_FREQUENCY:
        parser.add_argument(
            f"--{dataset.lower()}",
            action="store_true",
            default=False,
            help=f"use the {dataset} dataset in training",
        )
    parser.add_argument("--no-sonify", action="store_true", help="exclude sonifications from tensorboard")
    parser.add_argument("--no-contours", action="store_true", help="train without supervising the contour head")
    parser.add_argument(
        "--trainable-cqt",
        action="store_true",
        help="learn the CQT filterbank alongside the convs (kernels stay L1-normalized per bin)",
    )
    parser.add_argument("--weighted-onset-loss", action="store_true",
                        help="use a class-balanced loss for onsets")
    parser.add_argument("--positive-onset-weight", type=float, default=0.5,
                        help="positive-class onset weight (with --weighted-onset-loss)")
    parser.add_argument("--no-device-targets", dest="device_targets", action="store_false",
                        help="ship dense float32 target tensors instead of the sparse-COO + "
                             "int16 batches rasterized in-graph (identical training, more "
                             "host->device bytes)")
    parser.add_argument("--no-data-parallel", dest="data_parallel", action="store_false",
                        help="disable sharding the batch across devices")
    parser.add_argument("--coordinator", default="",
                        help="multi-host: coordinator address host:port (jax.distributed); "
                             "empty on managed clusters that self-configure")
    parser.add_argument("--num-processes", type=int, default=1,
                        help="multi-host: total number of training processes")
    parser.add_argument("--process-id", type=int, default=0,
                        help="multi-host: this process's id in [0, --num-processes)")
    parser.add_argument("--parse-workers", type=int, default=2,
                        help="loader record-parse threads (order-preserving; "
                             "deterministic for a fixed seed)")
    parser.add_argument("--steps-per-dispatch", type=int, default=1,
                        help="optimizer steps scanned inside one device program "
                             "(amortizes per-dispatch latency; single-process only)")
    parser.add_argument("--train-precision", default="highest",
                        choices=("highest", "high", "default"),
                        help="MXU precision for the TRAINING step (inference "
                             "always runs highest); 'high'/'default' trade "
                             "exact fp32 emulation for MXU throughput - gate "
                             "on held-out F1 (tools/train_precision_ab.json)")
    args = parser.parse_args()

    datasets_flagged = [
        dataset
        for dataset in constants.DATASET_SAMPLING_FREQUENCY
        if getattr(args, dataset.lower().replace("-", "_"))
    ]
    if not datasets_flagged:
        parser.error("select at least one dataset (e.g. --guitarset)")
    weights = np.array(
        [constants.DATASET_SAMPLING_FREQUENCY[d] for d in datasets_flagged], np.float64
    )
    weights /= weights.sum()

    main(
        args.source,
        args.output,
        args.batch_size,
        args.training_shuffle_buffer_size,
        args.learning_rate,
        args.epochs,
        args.steps_per_epoch,
        args.validation_steps,
        args.size_evaluation_callback_datasets,
        datasets_flagged,
        weights,
        args.no_sonify,
        args.no_contours,
        args.weighted_onset_loss,
        args.positive_onset_weight,
        args.data_parallel,
        args.trainable_cqt,
        args.device_targets,
        args.coordinator,
        args.num_processes,
        args.process_id,
        args.parse_workers,
        args.steps_per_dispatch,
        args.train_precision,
    )


if __name__ == "__main__":
    console_entry_point()
