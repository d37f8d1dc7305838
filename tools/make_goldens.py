"""Generate golden regression fixtures by running the reference TF model.

Produces checked-in goldens under ``tests/goldens/`` so the test suite can
assert numerical parity with the reference WITHOUT needing TensorFlow at test
time:

  * ``random_windows.npz`` — deterministic random audio (seed 0, 2 windows)
    plus the reference model's CQT and posteriorgram outputs for it.
  * ``vocadito_windows.npz`` — the reference test clip decoded and resampled
    by OUR audio pipeline, windowed exactly like the reference inference
    driver (`/root/reference/basic_pitch/inference.py:194-245`), with the
    reference model's posteriorgrams per window.

Run from the repo root with TF installed: ``python tools/make_goldens.py``.
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from basic_pitch_tpu import constants
from basic_pitch_tpu.utils import audio as audio_io

SAVED_MODEL = "/root/reference/basic_pitch/saved_models/icassp_2022/nmp"
REFERENCE_WAV = "/root/reference/tests/resources/vocadito_10.wav"
GOLDENS = REPO_ROOT / "tests" / "goldens"


def window_audio(y: np.ndarray) -> np.ndarray:
    """Replicate reference windowing: pre-pad half an overlap, slice fixed
    windows at the overlap hop, zero-pad the last."""
    y = np.concatenate([np.zeros(constants.OVERLAP_LENGTH_SAMPLES // 2, np.float32), y])
    hop = constants.WINDOW_HOP_SAMPLES
    windows = []
    for start in range(0, len(y), hop):
        w = y[start : start + constants.AUDIO_N_SAMPLES]
        if len(w) < constants.AUDIO_N_SAMPLES:
            w = np.pad(w, (0, constants.AUDIO_N_SAMPLES - len(w)))
        windows.append(w)
    return np.stack(windows).astype(np.float32)


def main() -> None:
    import tensorflow as tf

    sys.path.insert(0, "/root/reference")
    from basic_pitch.layers import nnaudio

    model = tf.saved_model.load(SAVED_MODEL)
    GOLDENS.mkdir(parents=True, exist_ok=True)

    # --- deterministic random windows -------------------------------------
    rng = np.random.RandomState(0)
    rand_audio = (rng.randn(2, constants.AUDIO_N_SAMPLES) * 0.1).astype(np.float32)
    cqt_layer = nnaudio.CQT(
        sr=constants.AUDIO_SAMPLE_RATE,
        hop_length=constants.FFT_HOP,
        fmin=constants.ANNOTATIONS_BASE_FREQUENCY,
        n_bins=309,
        bins_per_octave=36,
    )
    ref_cqt = cqt_layer(tf.constant(rand_audio)).numpy()
    out = {k: v.numpy() for k, v in model(rand_audio[..., None]).items()}
    np.savez_compressed(
        GOLDENS / "random_windows.npz",
        audio=rand_audio,
        cqt=ref_cqt,
        note=out["note"],
        onset=out["onset"],
        contour=out["contour"],
    )
    print("wrote random_windows.npz", {k: v.shape for k, v in out.items()})

    # --- vocadito clip through OUR decode/resample ------------------------
    y, _ = audio_io.load_audio(REFERENCE_WAV, constants.AUDIO_SAMPLE_RATE)
    windows = window_audio(y)
    out = {k: v.numpy() for k, v in model(windows[..., None]).items()}
    np.savez_compressed(
        GOLDENS / "vocadito_windows.npz",
        original_length=np.int64(len(y)),
        note=out["note"],
        onset=out["onset"],
        contour=out["contour"],
    )
    print("wrote vocadito_windows.npz", windows.shape, "orig len", len(y))


if __name__ == "__main__":
    main()
