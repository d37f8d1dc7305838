"""Generic dataset-building pipeline: track ids -> sharded TFRecords.

The reference builds datasets with an Apache Beam graph targeting GCP
Dataflow (`/root/reference/basic_pitch/data/pipeline.py:53-99`). Here the
same stages — filter invalid tracks, batch, convert to serialized examples,
write per-split TFRecord shards + an index — run on a local process pool:
the distribution primitive is multiprocessing, matching how data ETL
actually runs next to a TPU host.

A dataset builder supplies two callables (see `datasets/`):
  * ``filter_invalid(track_id) -> Optional[reason]`` — drop bad tracks;
  * ``to_examples(track_ids) -> list[bytes]`` — serialized tf.train.Examples.
"""

from __future__ import annotations

import csv
import logging
import multiprocessing
import pathlib
import random
import time
from typing import Callable, Dict, List, Optional, Sequence, Tuple

from basic_pitch_tpu.data import tfrecord

logger = logging.getLogger(__name__)

Splits = Dict[str, List[str]]  # split name -> track ids


def assign_percentage_splits(
    track_ids: Sequence[str],
    train_percent: float,
    validation_percent: float,
    seed: Optional[int] = None,
) -> List[Tuple[str, str]]:
    """Shuffled percentage split assignment (test = remainder), mirroring
    `create_input_data` (`datasets/guitarset.py:126-151`)."""
    assert train_percent + validation_percent < 1.0, "Don't over allocate the data!"
    ids = list(track_ids)
    rng = random.Random(seed)
    rng.shuffle(ids)
    n = len(ids)
    out = []
    for i, track_id in enumerate(ids):
        if i < n * train_percent:
            split = "train"
        elif i < n * (train_percent + validation_percent):
            split = "validation"
        else:
            split = "test"
        out.append((track_id, split))
    return out


def _batched(ids: Sequence[str], batch_size: int) -> List[List[str]]:
    return [list(ids[i : i + batch_size]) for i in range(0, len(ids), batch_size)]


def write_split(
    to_examples: Callable[[List[str]], List[bytes]],
    track_ids: Sequence[str],
    destination: pathlib.Path,
    batch_size: int,
    pool: Optional[multiprocessing.pool.Pool],
) -> int:
    destination.mkdir(parents=True, exist_ok=True)
    batches = _batched(list(track_ids), batch_size)
    # stream results: each batch holds full WAV bytes, so materializing every
    # shard of a large split at once (pool.map / list comprehension) costs
    # tens of GB on MAESTRO-sized corpora; imap keeps one window in flight
    if pool is not None:
        results = pool.imap(to_examples, batches)
    else:
        results = (to_examples(batch) for batch in batches)
    written = 0
    for i, records in enumerate(results):
        if not records:
            continue
        path = destination / f"{i:05d}.tfrecord"
        with tfrecord.TFRecordWriter(path) as writer:
            for record in records:
                writer.write(record)
        written += len(records)
    return written


def run(
    name: str,
    input_data: List[Tuple[str, str]],
    to_examples: Callable[[List[str]], List[bytes]],
    filter_invalid: Callable[[str], Optional[str]],
    destination: str,
    batch_size: int = 5,
    num_workers: int = 0,
    timestamped: bool = True,
) -> pathlib.Path:
    """Build one dataset: filter -> per-split shards + index.csv.

    Returns the dataset's output directory (containing ``splits/<split>``).
    """
    base = pathlib.Path(destination)
    if timestamped:
        base = base / str(int(time.time()))
    dataset_dir = base / name
    dataset_dir.mkdir(parents=True, exist_ok=True)

    splits: Splits = {}
    dropped = []
    for track_id, split in input_data:
        reason = filter_invalid(track_id)
        if reason:
            dropped.append((track_id, reason))
            continue
        splits.setdefault(split, []).append(track_id)
    for track_id, reason in dropped:
        logger.info("dropping %s: %s", track_id, reason)

    with open(dataset_dir / "index.csv", "w", newline="") as fh:
        writer = csv.writer(fh)
        for split, ids in sorted(splits.items()):
            for track_id in ids:
                writer.writerow([split, track_id])

    pool = multiprocessing.Pool(num_workers) if num_workers > 0 else None
    try:
        for split, ids in sorted(splits.items()):
            count = write_split(
                to_examples, ids, dataset_dir / "splits" / split, batch_size, pool
            )
            logger.info("%s/%s: wrote %d examples from %d tracks", name, split, count, len(ids))
    finally:
        if pool is not None:
            pool.close()
            pool.join()
    return dataset_dir
