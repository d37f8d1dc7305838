"""basic_pitch_tpu: a TPU-native automatic music transcription framework.

Audio in, MIDI (with pitch bends) out — built around the lightweight NMP
convnet (ICASSP 2022), re-designed for TPUs: the CQT front-end, model heads,
window/overlap assembly, and note decoding run as one jitted JAX/XLA program
batched over windows and files; only file I/O and MIDI serialization stay on
host. API surface mirrors the reference (`/root/reference/basic_pitch/`).
"""

__version__ = "0.1.0"

from basic_pitch_tpu.models.params import ICASSP_2022_WEIGHTS_PATH

ICASSP_2022_MODEL_PATH = ICASSP_2022_WEIGHTS_PATH
