"""Host-side loader throughput attribution (VERDICT r4 next #3, host half).

TRAIN_BENCH r4's batch sweep shows the loader collapsing at batch 128
(feed margin 0.88, ~43 windows/s) while feeding ~486 windows/s at batch 64
in the main run. This profiles the production loader STANDALONE (no device
anywhere) per batch size and per stage, so the regression is attributable
before anything is fixed.

Usage: python tools/loader_profile.py [--tracks 60] [--batches 30]
Writes tools/loader_profile.json.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent))


def profile_stream(shards, batch_size: int, n_batches: int, **kwargs) -> dict:
    from basic_pitch_tpu.data import loader

    train_iter, _ = loader.prepare_datasets(
        str(shards), 100, batch_size, 2, ["guitarset"], [1.0], seed=0,
        device_targets=True, **kwargs,
    )
    # warm: first batch pays file open + shuffle fill
    next(train_iter)
    t0 = time.time()
    for _ in range(n_batches):
        next(train_iter)
    wall = time.time() - t0
    per_batch = wall / n_batches
    return {
        "batch_size": batch_size,
        "n_batches": n_batches,
        "ms_per_batch": round(per_batch * 1e3, 1),
        "windows_per_s": round(batch_size / per_batch, 1),
        **{k: v for k, v in kwargs.items()},
    }


def stage_times(shards, batch_size: int, n_batches: int) -> dict:
    """Time the pipeline stages separately: record iteration+parse,
    window extraction, collate."""
    from basic_pitch_tpu.data import loader, serialization, tfrecord
    import numpy as np

    files = loader._dataset_files(str(shards), "guitarset", "train", 1, 0)
    t0 = time.time()
    records = [r for p in files for r in tfrecord.read_tfrecords(p)]
    t_read = time.time() - t0
    t0 = time.time()
    examples = [serialization.parse_transcription_example(r) for r in records]
    t_parse = time.time() - t0

    rng = np.random.RandomState(0)
    t0 = time.time()
    windows = []
    for ex in examples:
        windows.extend(loader.iter_track_windows(ex, 20, False, rng))
    t_window = time.time() - t0

    n_batches_avail = len(windows) // batch_size
    t0 = time.time()
    for i in range(n_batches_avail):
        loader._collate_device(windows[i * batch_size : (i + 1) * batch_size])
    t_collate = time.time() - t0

    return {
        "read_ms_per_track": round(t_read / len(records) * 1e3, 2),
        "parse_ms_per_track": round(t_parse / len(records) * 1e3, 2),
        "window_ms_per_track": round(t_window / len(examples) * 1e3, 2),
        "windows_per_track_yield": round(len(windows) / len(examples), 1),
        "collate_ms_per_batch": round(t_collate / max(n_batches_avail, 1) * 1e3, 2),
        "epoch_windows": len(windows),
        "epoch_parse_total_s": round(t_read + t_parse + t_window, 2),
    }


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--tracks", type=int, default=60)
    parser.add_argument("--batches", type=int, default=30)
    args = parser.parse_args(argv)

    from train_bench import build_corpus_and_shards

    workdir = pathlib.Path(tempfile.mkdtemp(prefix="loader_profile_"))
    _, shards, meta = build_corpus_and_shards(workdir, args.tracks, 30.0)

    out = {"corpus": meta, "stages": stage_times(shards, 64, args.batches)}
    runs = []
    for bs in (16, 64, 128):
        n = max(4, args.batches * 64 // bs)
        runs.append(profile_stream(shards, bs, n, parse_workers=4))
    out["end_to_end"] = runs
    print(json.dumps(out, indent=1))
    path = pathlib.Path(__file__).parent / "loader_profile.json"
    path.write_text(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    main()
