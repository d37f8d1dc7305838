"""Weight import from all four reference serializations, no runtimes needed.

The reference ships the same ICASSP-2022 checkpoint as TF SavedModel, ONNX,
TFLite, and CoreML (`/root/reference/basic_pitch/saved_models/icassp_2022/`)
and loads each with its own native engine (`inference.py:78-154`). This
framework parses every format itself; these tests pin that each parsed tree
reproduces the canonical checkpoint's posteriorgrams.

The ONNX/TFLite/CoreML exports are batch-norm folded, so their trees cannot
be compared leaf-wise against the npz (the SavedModel test does that);
equivalence is functional, at the float tolerance the fold introduces.
"""

import pathlib

import numpy as np
import pytest

from basic_pitch_tpu.models import nmp
from basic_pitch_tpu.models import params as params_io

SAVED_MODELS = pathlib.Path("/root/reference/basic_pitch/saved_models/icassp_2022")

needs_reference = pytest.mark.skipif(
    not SAVED_MODELS.exists(), reason="reference serialized models not present"
)

# the fold re-associates (gamma/sigma)*w products; observed max error ~2e-6
FOLD_ATOL = 1e-5


def _loaders():
    from basic_pitch_tpu.models import coreml_import, onnx_import, tflite_import

    return {
        "onnx": (onnx_import.load_nmp_onnx, SAVED_MODELS / "nmp.onnx"),
        "tflite": (tflite_import.load_nmp_tflite, SAVED_MODELS / "nmp.tflite"),
        "coreml": (coreml_import.load_nmp_coreml, SAVED_MODELS / "nmp.mlpackage"),
    }


@needs_reference
@pytest.mark.parametrize("fmt", ["onnx", "tflite", "coreml"])
def test_import_matches_canonical_forward(fmt):
    loader, path = _loaders()[fmt]
    tree = loader(path)
    ref = params_io.load_params()
    assert set(tree) == set(ref)

    rng = np.random.RandomState(0)
    audio = (rng.randn(2, 43844) * 0.1).astype(np.float32)
    out = nmp.predict_fn(tree, audio)
    want = nmp.predict_fn(ref, audio)
    for head in ("note", "onset", "contour"):
        np.testing.assert_allclose(
            np.asarray(out[head]), np.asarray(want[head]), atol=FOLD_ATOL, rtol=0, err_msg=head
        )


@needs_reference
@pytest.mark.parametrize(
    "name", ["nmp.onnx", "nmp.tflite", "nmp.mlpackage", "nmp.mlpackage/Data/com.apple.CoreML/model.mlmodel"]
)
def test_model_sniffs_and_loads_each_format_with_golden_parity(name):
    from basic_pitch_tpu import inference

    goldens = pathlib.Path(__file__).parent / "goldens"
    golden = np.load(goldens / "random_windows.npz")
    model = inference.Model(SAVED_MODELS / name)
    out = model.predict(golden["audio"])
    for head in ("note", "onset", "contour"):
        np.testing.assert_allclose(out[head], golden[head], atol=1e-4, rtol=0, err_msg=head)


@needs_reference
def test_coreml_bn_cqt_statistics_are_bit_exact():
    # coremltools keeps the standalone post-CQT batch norm unfused, so its
    # statistics must round-trip exactly against the canonical checkpoint
    from basic_pitch_tpu.models import coreml_import

    tree = coreml_import.load_nmp_coreml(SAVED_MODELS / "nmp.mlpackage")
    ref = params_io.load_params()
    for leaf in ("gamma", "beta", "mean", "var"):
        np.testing.assert_array_equal(
            tree["bn_cqt"][leaf], np.asarray(ref["bn_cqt"][leaf]), err_msg=leaf
        )


@needs_reference
def test_build_model_path_resolves_reference_formats(monkeypatch):
    import basic_pitch_tpu as bp

    monkeypatch.setenv("BASIC_PITCH_SAVED_MODELS", str(SAVED_MODELS))
    for suffix, expected in (
        (bp.FilenameSuffix.onnx, SAVED_MODELS / "nmp.onnx"),
        (bp.FilenameSuffix.tflite, SAVED_MODELS / "nmp.tflite"),
        (bp.FilenameSuffix.coreml, SAVED_MODELS / "nmp.mlpackage"),
    ):
        assert bp.build_icassp_2022_model_path(suffix) == expected
    assert bp.build_icassp_2022_model_path(bp.FilenameSuffix.tf).exists()


def test_build_model_path_errors_without_reference(monkeypatch):
    import basic_pitch_tpu as bp

    monkeypatch.delenv("BASIC_PITCH_SAVED_MODELS", raising=False)
    monkeypatch.setattr(bp, "_reference_saved_models_dir", lambda: None)
    with pytest.raises(FileNotFoundError, match="BASIC_PITCH_SAVED_MODELS"):
        bp.build_icassp_2022_model_path(bp.FilenameSuffix.onnx)


def test_onnx_tensor_parses_packed_float_data():
    """onnx.proto declares float_data as `[packed = true]` — standard
    serializers emit ONE length-delimited buffer (wire type 2), not
    per-element fixed32 records. Both encodings must decode."""
    import struct

    from basic_pitch_tpu.data import proto
    from basic_pitch_tpu.models import onnx_import

    values = [1.5, -2.25, 3.0, 0.125]
    payload = b"".join(struct.pack("<f", v) for v in values)
    common = (
        proto._tag(1, 0) + proto.encode_varint(2)      # dims: 2
        + proto._tag(1, 0) + proto.encode_varint(2)    # dims: 2
        + proto._tag(2, 0) + proto.encode_varint(1)    # data_type: FLOAT
        + proto._length_delimited(8, b"w")             # name
    )
    packed = common + proto._length_delimited(4, payload)
    unpacked = common + b"".join(
        proto._tag(4, 5) + struct.pack("<f", v) for v in values
    )
    for buf in (packed, unpacked):
        name, dims, arr = onnx_import._tensor(buf)
        assert name == "w" and dims == (2, 2)
        np.testing.assert_array_equal(arr, np.asarray(values, np.float32).reshape(2, 2))
