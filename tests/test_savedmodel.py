"""TF-free SavedModel import: byte parity with the exported npz, error UX."""

import pathlib

import numpy as np
import pytest

from basic_pitch_tpu.models import params as params_io
from basic_pitch_tpu.models import savedmodel

REFERENCE_SAVEDMODEL = pathlib.Path(
    "/root/reference/basic_pitch/saved_models/icassp_2022/nmp"
)

needs_reference = pytest.mark.skipif(
    not REFERENCE_SAVEDMODEL.exists(), reason="reference SavedModel not present"
)


@needs_reference
def test_savedmodel_import_matches_exported_npz():
    tree = savedmodel.load_nmp_savedmodel(REFERENCE_SAVEDMODEL)
    ref = params_io.load_params()
    assert set(tree) == set(ref)
    for layer in ref:
        assert set(tree[layer]) == set(ref[layer])
        for leaf in ref[layer]:
            np.testing.assert_array_equal(
                np.asarray(ref[layer][leaf]), tree[layer][leaf], err_msg=f"{layer}/{leaf}"
            )


@needs_reference
def test_model_accepts_savedmodel_dir_with_golden_parity():
    import jax.numpy as jnp

    from basic_pitch_tpu import inference

    goldens = pathlib.Path(__file__).parent / "goldens"
    golden = np.load(goldens / "random_windows.npz")
    model = inference.Model(REFERENCE_SAVEDMODEL)
    out = model.predict(golden["audio"])
    for head in ("note", "onset", "contour"):
        np.testing.assert_allclose(out[head], golden[head], atol=1e-4, rtol=0, err_msg=head)


@needs_reference
def test_checkpoint_tensor_reader_sees_optimizer_state():
    tensors = savedmodel.read_checkpoint_tensors(
        REFERENCE_SAVEDMODEL / "variables" / "variables"
    )
    # the checkpoint carries Adam slots and Keras metrics beyond the 24
    # model leaves; the reader must surface them all without confusion
    assert len(tensors) > 24
    assert any("OPTIMIZER_SLOT" in k for k in tensors)


def test_corrupt_engine_formats_get_clear_per_format_errors(tmp_path):
    from basic_pitch_tpu import inference

    for name, match in (
        ("nmp.tflite", "TFL3 magic"),
        ("nmp.onnx", "GraphProto|ModelProto|Conv"),
        ("nmp.mlpackage", "model.mlmodel"),
    ):
        p = tmp_path / name
        if name.endswith(".mlpackage"):
            p.mkdir()
        else:
            p.write_bytes(b"\x00" * 16)
        with pytest.raises(ValueError, match=match):
            inference.Model(p)


def test_non_savedmodel_dir_rejected(tmp_path):
    with pytest.raises(savedmodel.SavedModelFormatError, match="not a SavedModel"):
        savedmodel.load_nmp_savedmodel(tmp_path)
