"""basic_pitch_tpu: a TPU-native automatic music transcription framework.

Audio in, MIDI (with pitch bends) out — built around the lightweight NMP
convnet (ICASSP 2022), re-designed for TPUs: the CQT front-end, model heads,
window/overlap assembly, and note decoding run as one jitted JAX/XLA program
batched over windows and files; only file I/O and MIDI serialization stay on
host. API surface mirrors the reference (`/root/reference/basic_pitch/`).
"""

__version__ = "0.2.0"

import enum
import pathlib

from basic_pitch_tpu.models.params import ICASSP_2022_WEIGHTS_PATH

ICASSP_2022_MODEL_PATH = ICASSP_2022_WEIGHTS_PATH


class FilenameSuffix(enum.Enum):
    """The reference's serialization selector (`__init__.py:74-88`).

    This framework runs one engine (XLA). ``tf`` resolves to a loadable
    checkpoint: the bundled flat-npz weights (bit-identical to the TF
    SavedModel's variables — `tests/test_savedmodel.py`), and a stock TF
    SavedModel directory also loads directly via `inference.Model`.
    The engine-specific formats (coreml/tflite/onnx) have no XLA loader and
    raise a documented error when requested.
    """

    tf = "npz"
    coreml = "mlpackage"
    tflite = "tflite"
    onnx = "onnx"


def build_icassp_2022_model_path(suffix: FilenameSuffix) -> pathlib.Path:
    """Reference-compatible model-path resolution (`__init__.py:91-95`)."""
    if suffix is FilenameSuffix.tf:
        return pathlib.Path(ICASSP_2022_MODEL_PATH)
    raise ValueError(
        f"🚨 the {suffix.name} serialization targets the reference's "
        f"{suffix.name} runtime; this framework's single engine is XLA. "
        "Use FilenameSuffix.tf (bundled weights) or pass a TF SavedModel "
        "directory to Model()."
    )
