"""One-shot conversion of the reference ICASSP-2022 checkpoint to our format.

Loads the TF SavedModel shipped with the reference
(`/root/reference/basic_pitch/saved_models/icassp_2022/nmp`) and re-serializes
its variables into the framework's flat-npz parameter layout
(`basic_pitch_tpu/models/params.py`). TF is only needed to RUN this tool;
the framework itself never imports it.

Variable-name mapping (TF Keras auto-names -> our tree):
    batch_normalization      -> bn_cqt        (post-CQT, 1 channel)
    conv2d_1                 -> contour_conv  (3x39x8x8)
    batch_normalization_2    -> bn_contour
    contours-reduced         -> contour_out   (5x5x8x1, sigmoid)
    conv2d_2                 -> note_conv     (7x7x1x32, stride (1,3))
    conv2d_3                 -> note_out      (7x3x32x1, sigmoid)
    conv2d_4                 -> onset_conv    (5x5x8x32, stride (1,3))
    batch_normalization_3    -> bn_onset
    conv2d_5                 -> onset_out     (3x3x33x1; input channel 0 is
                                               the note-head pre-activation)
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

DEFAULT_SAVED_MODEL = "/root/reference/basic_pitch/saved_models/icassp_2022/nmp"

BN_MAP = {"gamma": "gamma", "beta": "beta", "moving_mean": "mean", "moving_variance": "var"}
LAYER_MAP = {
    "batch_normalization": "bn_cqt",
    "conv2d_1": "contour_conv",
    "batch_normalization_2": "bn_contour",
    "contours-reduced": "contour_out",
    "conv2d_2": "note_conv",
    "conv2d_3": "note_out",
    "conv2d_4": "onset_conv",
    "batch_normalization_3": "bn_onset",
    "conv2d_5": "onset_out",
}


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--saved-model", default=DEFAULT_SAVED_MODEL)
    parser.add_argument(
        "--output",
        default=str(REPO_ROOT / "basic_pitch_tpu" / "assets" / "nmp_icassp2022.npz"),
    )
    args = parser.parse_args()

    import tensorflow as tf  # local import: tool-only dependency

    saved = tf.saved_model.load(args.saved_model)
    flat = {}
    for variable in saved.variables:
        layer, field = variable.name.rsplit(":", 1)[0].split("/")
        ours = LAYER_MAP[layer]
        if field in BN_MAP:
            flat[f"{ours}/{BN_MAP[field]}"] = variable.numpy()
        elif field == "kernel":
            flat[f"{ours}/w"] = variable.numpy()
        elif field == "bias":
            flat[f"{ours}/b"] = variable.numpy()
        else:
            raise ValueError(f"unmapped variable {variable.name}")

    expected = 4 * 3 + 2 * 6  # 3 BN layers x 4 fields + 6 convs x 2 fields
    if len(flat) != expected:
        raise ValueError(f"expected {expected} arrays, got {len(flat)}: {sorted(flat)}")

    out = pathlib.Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(out, **flat)
    total = sum(v.size for v in flat.values())
    print(f"wrote {out} ({len(flat)} arrays, {total} parameters)")


if __name__ == "__main__":
    main()
