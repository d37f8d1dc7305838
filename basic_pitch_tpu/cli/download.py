"""``bp-download`` command-line interface: build training datasets.

Two-stage argparse with a dataset dispatch table, mirroring the reference
(`/root/reference/basic_pitch/data/download.py:30-61`). Each subcommand
converts a locally available corpus into the framework's TFRecord layout
(<destination>/<dataset>/splits/<split>/*.tfrecord); with ``--fetch`` the
remote corpus is first downloaded into ``--source`` (resumable transfers,
md5 verification — `basic_pitch_tpu.data.fetch`), reproducing the
reference's mirdata acquisition step (`datasets/guitarset.py:85-93`).
"""

from __future__ import annotations

import argparse
import logging


def _dispatch_table():
    from basic_pitch_tpu.data.datasets import (
        guitarset,
        ikala,
        maestro,
        medleydb_pitch,
        slakh,
    )

    return {
        "guitarset": (guitarset.build_parser, guitarset.main),
        "ikala": (ikala.build_parser, ikala.main),
        "maestro": (maestro.build_parser, maestro.main),
        "medleydb_pitch": (medleydb_pitch.build_parser, medleydb_pitch.main),
        "slakh": (slakh.build_parser, slakh.main),
    }


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    table = _dispatch_table()
    parser = argparse.ArgumentParser(
        description="Build training datasets (TFRecord shards) from local MIR corpora."
    )
    parser.add_argument("dataset", choices=sorted(table), help="dataset to build")
    args, remaining = parser.parse_known_args()

    build_parser, run = table[args.dataset]
    sub = build_parser()
    run(sub.parse_args(remaining))


if __name__ == "__main__":
    main()
