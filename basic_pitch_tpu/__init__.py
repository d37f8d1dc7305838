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

    Every reference serialization is loadable here — not by probing four
    native runtimes as the reference does (`__init__.py:23-71`), but with
    first-party format readers (`models/{savedmodel,onnx_import,
    tflite_import,coreml_import}.py`) that all feed the one XLA engine.
    ``tf`` resolves to the bundled flat-npz weights (bit-identical to the
    TF SavedModel's variables — `tests/test_savedmodel.py`); the other
    suffixes resolve to a reference `saved_models/icassp_2022` checkout
    when one is locatable (see `build_icassp_2022_model_path`).
    """

    tf = "nmp"
    coreml = "nmp.mlpackage"
    tflite = "nmp.tflite"
    onnx = "nmp.onnx"


def _reference_saved_models_dir() -> "pathlib.Path | None":
    """Locate a reference basic-pitch `saved_models/icassp_2022` directory.

    Checks `BASIC_PITCH_SAVED_MODELS`, then an installed `basic_pitch`
    package. Returns None when neither exists.
    """
    import os

    env = os.environ.get("BASIC_PITCH_SAVED_MODELS")
    if env and pathlib.Path(env).is_dir():
        return pathlib.Path(env)
    try:
        import basic_pitch  # the reference package, if installed

        candidate = pathlib.Path(basic_pitch.__file__).parent / "saved_models" / "icassp_2022"
        if candidate.is_dir():
            return candidate
    except Exception:
        # the reference package imports TensorFlow on import; beyond
        # ImportError it can raise OSError (native libs) or RuntimeError —
        # any failure here just means "no reference checkout available"
        pass
    return None


def build_icassp_2022_model_path(suffix: FilenameSuffix) -> pathlib.Path:
    """Reference-compatible model-path resolution (`__init__.py:91-95`).

    ``tf`` always resolves (bundled weights). The coreml/tflite/onnx
    serializations resolve to the reference package's shipped artifact when
    one can be found; all four load through `inference.Model`'s own
    format readers, no per-format runtime required.
    """
    if suffix is FilenameSuffix.tf:
        return pathlib.Path(ICASSP_2022_MODEL_PATH)
    ref_dir = _reference_saved_models_dir()
    if ref_dir is not None:
        candidate = ref_dir / suffix.value
        if candidate.exists():
            return candidate
    raise FileNotFoundError(
        f"🚨 no {suffix.name} serialization of the ICASSP-2022 checkpoint is "
        "bundled with this package (only the npz weights are). Point "
        "BASIC_PITCH_SAVED_MODELS at a reference saved_models/icassp_2022 "
        f"directory, or pass any {suffix.value} path straight to "
        "Model() — its format readers load all four reference "
        "serializations without the matching runtime."
    )
