"""Profile the batch-128 training feed chain stage by stage (host only).

The train path is loader -> grouped_batches(k) -> pack_batch_audio ->
upload. TRAIN_BENCH r5 measured 270 ms/step loader block at batch 128
(474 windows/s) against a 139 ms scan-fused device step (918 windows/s
ceiling) — this tool attributes the gap so the fix is measured, not
guessed (VERDICT r4 #3).

Usage: python tools/feed_profile.py --shards /tmp/train_bench_*/shards
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def timed_iter(it, n, warmup=2):
    for _ in range(warmup):
        next(it)
    t0 = time.time()
    out = [next(it) for _ in range(n)]
    return (time.time() - t0) / n * 1e3, out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--shards", required=True)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--n", type=int, default=6, help="groups to time per arm")
    ap.add_argument("--parse-workers", type=int, default=4)
    ap.add_argument("--collate-workers", type=int, default=1)
    ap.add_argument("--out", default=str(REPO_ROOT / "tools" / "feed_profile.json"))
    args = ap.parse_args(argv)

    from basic_pitch_tpu.data import loader
    from basic_pitch_tpu.train import loop as train_loop

    def fresh_iter(collate_workers=None):
        it, _ = loader.prepare_datasets(
            args.shards, 100, args.batch_size, 2, ["guitarset"], [1.0], seed=0,
            device_targets=True, parse_workers=args.parse_workers,
            collate_workers=(args.collate_workers if collate_workers is None
                             else collate_workers),
        )
        return it

    report = {"batch_size": args.batch_size, "k": args.k,
              "parse_workers": args.parse_workers,
              "collate_workers": args.collate_workers}

    # stage A: raw loader batches
    ms, batches = timed_iter(fresh_iter(), args.n * args.k)
    report["loader_ms_per_batch"] = round(ms, 1)
    report["loader_windows_per_s"] = round(args.batch_size / (ms / 1e3), 1)

    # stage B: stack k batches (host np.stack) — cost of grouping alone
    group = batches[: args.k]
    t0 = time.time()
    for _ in range(args.n):
        stacked = train_loop.stack_batches(group)
    report["stack_ms_per_group"] = round((time.time() - t0) / args.n * 1e3, 1)

    # stage C: pack the stacked group's audio (codec, native)
    t0 = time.time()
    for _ in range(args.n):
        packed = train_loop.pack_batch_audio(stacked, "codec")
    report["pack_ms_per_group"] = round((time.time() - t0) / args.n * 1e3, 1)
    report["audio_mb_per_group"] = round(stacked["audio"].nbytes / 2**20, 1)
    if "audio_packed" in packed:
        report["packed_mb_per_group"] = round(
            packed["audio_packed"][0].packed_bytes / 2**20, 1)

    # stage D: the whole production chain as the train loop consumes it
    chain = train_loop.packed_batches(
        train_loop.grouped_batches(fresh_iter(), args.k), "codec")
    ms, _ = timed_iter(chain, args.n)
    report["chain_ms_per_group"] = round(ms, 1)
    report["chain_windows_per_s"] = round(
        args.batch_size * args.k / (ms / 1e3), 1)

    print(json.dumps(report, indent=1))
    pathlib.Path(args.out).write_text(json.dumps(report, indent=1))
    return report


if __name__ == "__main__":
    main()
