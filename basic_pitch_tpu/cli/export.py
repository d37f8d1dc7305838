"""``basic-pitch-export`` — write a checkpoint in deployable formats.

The reference ships its model in four serializations so transcription runs
on phones, browsers, and DAWs (`/root/reference/basic_pitch/saved_models/
icassp_2022/`, selected at runtime by `inference.py:78-154`). This CLI is
the training-side counterpart for models trained in THIS framework:

    # the shipped ICASSP-2022 checkpoint, all exportable formats
    basic-pitch-export out_dir/

    # a checkpoint you trained (flat-npz or orbax layout both load)
    basic-pitch-export out_dir/ --checkpoint runs/my_model.npz

    # only specific formats
    basic-pitch-export out_dir/ --format onnx --format savedmodel

Formats:
  onnx        nmp.onnx — runtime-free first-party writer
              (models/onnx_export.py); loads in onnxruntime and in this
              repo's own importer, reference-compatible I/O names.
  savedmodel  nmp/ — TF SavedModel directory; requires tensorflow at
              export time (models/tf_export.py).
  tflite      nmp.tflite — requires tensorflow at export time.

Every export is verified before the CLI reports success: the artifact is
re-imported through this repo's own readers and the posteriorgrams are
compared against the source checkpoint (--verify-tolerance, default 2e-6
for weight round-trips).
"""

from __future__ import annotations

import argparse
import pathlib
import sys
from typing import Dict, List

import numpy as np

ALL_FORMATS = ("onnx", "savedmodel", "tflite")


def _verify(params: Dict, reimported: Dict, tolerance: float, label: str) -> float:
    """Max posteriorgram deviation between source and re-imported params."""
    import jax.numpy as jnp

    from basic_pitch_tpu.models import nmp

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((1, 43844)) * 0.1, jnp.float32)
    want = nmp.predict_fn(params, audio)
    got = nmp.predict_fn(reimported, audio)
    worst = max(
        float(jnp.abs(want[h] - got[h]).max()) for h in ("note", "onset", "contour")
    )
    if worst > tolerance:
        raise SystemExit(
            f"{label}: round-trip deviation {worst:.3g} exceeds {tolerance:.3g}"
        )
    return worst


def main(argv: List[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        "basic-pitch-export",
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    parser.add_argument("output_dir", type=pathlib.Path, help="directory for the artifacts")
    parser.add_argument(
        "--checkpoint",
        default=None,
        help="checkpoint to export: flat .npz (models/params.py) or any format "
        "the repo's Model() loader sniffs; default = the shipped ICASSP-2022 weights",
    )
    parser.add_argument(
        "--format",
        dest="formats",
        action="append",
        choices=ALL_FORMATS,
        help="repeatable; default = every format whose toolchain is available",
    )
    parser.add_argument(
        "--verify-tolerance",
        type=float,
        default=2e-6,
        help="max allowed posteriorgram deviation after re-importing the artifact",
    )
    parser.add_argument(
        "--no-verify", action="store_true", help="skip the re-import verification pass"
    )
    args = parser.parse_args(argv)

    from basic_pitch_tpu.models import params as params_mod

    if args.checkpoint is None:
        params = params_mod.load_params()
    elif str(args.checkpoint).endswith(".npz"):
        params = params_mod.load_params(args.checkpoint)
    else:
        from basic_pitch_tpu import inference

        params = inference.Model(args.checkpoint).params

    formats = args.formats or list(ALL_FORMATS)
    args.output_dir.mkdir(parents=True, exist_ok=True)
    wrote = []

    if "onnx" in formats:
        from basic_pitch_tpu.models import onnx_export, onnx_import

        out = args.output_dir / "nmp.onnx"
        onnx_export.export_onnx(params, out)
        if not args.no_verify:
            worst = _verify(
                params, onnx_import.load_nmp_onnx(out), args.verify_tolerance, "onnx"
            )
            print(f"onnx: round-trip max deviation {worst:.3g}")
        wrote.append(out)

    tf_formats = [f for f in formats if f in ("savedmodel", "tflite")]
    if tf_formats:
        try:
            from basic_pitch_tpu.models import tf_export
        except ImportError:
            tf_export = None
        if tf_export is None:
            print(
                "savedmodel/tflite export needs tensorflow; skipping "
                f"{tf_formats} (onnx export is runtime-free)",
                file=sys.stderr,
            )
            if args.formats:  # explicitly requested -> this is an error
                return 2
        else:
            if "savedmodel" in tf_formats:
                from basic_pitch_tpu.models import savedmodel as savedmodel_import

                out = args.output_dir / "nmp"
                tf_export.export_savedmodel(params, out)
                if not args.no_verify:
                    worst = _verify(
                        params,
                        savedmodel_import.load_nmp_savedmodel(out),
                        args.verify_tolerance,
                        "savedmodel",
                    )
                    print(f"savedmodel: round-trip max deviation {worst:.3g}")
                wrote.append(out)
            if "tflite" in tf_formats:
                from basic_pitch_tpu.models import tflite_import

                out = args.output_dir / "nmp.tflite"
                tf_export.export_tflite(params, out)
                if not args.no_verify:
                    # TFLite folding is fp32 arithmetic on the weights; allow
                    # a proportionally looser bound than raw weight copies
                    worst = _verify(
                        params,
                        tflite_import.load_nmp_tflite(out),
                        max(args.verify_tolerance, 2e-6),
                        "tflite",
                    )
                    print(f"tflite: round-trip max deviation {worst:.3g}")
                wrote.append(out)

    for path in wrote:
        print(f"wrote {path}")
    return 0


def console_entry_point() -> None:
    raise SystemExit(main())


if __name__ == "__main__":
    console_entry_point()
