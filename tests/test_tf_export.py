"""SavedModel + TFLite export (VERDICT r4 directive #5, second half).

The reference ships its checkpoint as a TF SavedModel and nmp.tflite
(`/root/reference/basic_pitch/saved_models/icassp_2022/`, consumed by
`inference.py:78-117`); `models/tf_export.py` writes both for models
trained HERE. Verification layers:

  1. the exported SavedModel round-trips BIT-EXACTLY through this repo's
     own TF-free reader (`models/savedmodel.py`) — the directive's gate;
  2. stock TensorFlow loads and CALLS the SavedModel like the reference
     does (`model(x) -> dict`), matching the JAX forward;
  3. the TFLite flatbuffer round-trips through the runtime-free importer
     (`models/tflite_import.py`, built for the reference's own artifact)
     and executes under the TFLite interpreter with reference output names.

Skipped wholesale when tensorflow is not installed — the export path is
explicitly TF-at-export-time-only.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

tf = pytest.importorskip("tensorflow")

from basic_pitch_tpu.models import nmp, savedmodel, tf_export, tflite_import  # noqa: E402
from basic_pitch_tpu.models import params as params_mod  # noqa: E402


@pytest.fixture(scope="module")
def canonical_params():
    return params_mod.load_params()


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(3)
    return (rng.standard_normal((2, 43844)) * 0.1).astype(np.float32)


@pytest.fixture(scope="module")
def sm_dir(tmp_path_factory, canonical_params):
    out = tmp_path_factory.mktemp("tfexport") / "nmp"
    tf_export.export_savedmodel(canonical_params, out)
    return out


@pytest.fixture(scope="module")
def tflite_path(tmp_path_factory, canonical_params):
    out = tmp_path_factory.mktemp("tfexport") / "nmp.tflite"
    tf_export.export_tflite(canonical_params, out)
    return out


def test_savedmodel_reader_roundtrip_bit_exact(sm_dir, canonical_params):
    """Exported dir -> models/savedmodel.py (no TF) -> identical tree."""
    reimported = savedmodel.load_nmp_savedmodel(sm_dir)
    assert set(reimported) == {
        "bn_cqt", "contour_conv", "bn_contour", "contour_out", "note_conv",
        "note_out", "onset_conv", "bn_onset", "onset_out",
    }
    for slot, leaf in reimported.items():
        for role, arr in leaf.items():
            src = np.asarray(canonical_params[slot][role])
            np.testing.assert_array_equal(arr, src, err_msg=f"{slot}/{role}")


def test_savedmodel_loads_and_calls_like_reference(sm_dir, canonical_params, audio):
    """The reference consumer does `model(x)` on the loaded object and reads
    a {contour, note, onset} dict (`inference.py:160-162`)."""
    loaded = tf.saved_model.load(str(sm_dir))
    out = loaded(audio[..., None])
    assert set(out) == {"contour", "note", "onset"}
    want = nmp.predict_fn(canonical_params, jnp.asarray(audio))
    for head in ("note", "onset", "contour"):
        diff = float(np.abs(np.asarray(out[head]) - np.asarray(want[head])).max())
        assert diff < 1e-4, (head, diff)  # fp32 reduction-order noise
    assert "serving_default" in loaded.signatures


def test_savedmodel_detected_by_model_sniffer(sm_dir):
    assert savedmodel.looks_like_savedmodel(sm_dir)


def test_tflite_importer_roundtrip(tflite_path, canonical_params, audio):
    """Exported flatbuffer -> models/tflite_import.py -> posteriorgram
    parity (the importer reconstructs folded weights + identity BNs, so the
    gate is functional, matching how the reference's own tflite is read)."""
    reimported = tflite_import.load_nmp_tflite(tflite_path)
    want = nmp.predict_fn(canonical_params, jnp.asarray(audio))
    got = nmp.predict_fn(reimported, jnp.asarray(audio))
    for head in ("note", "onset", "contour"):
        diff = float(jnp.abs(want[head] - got[head]).max())
        assert diff <= 2e-6, (head, diff)


def test_tflite_interpreter_executes(tflite_path, canonical_params, audio):
    """Builtin-ops-only conversion: the stock interpreter runs it (no flex
    delegate), with the reference's output naming (`inference.py:163-167`)."""
    interp = tf.lite.Interpreter(str(tflite_path))
    inp = interp.get_input_details()[0]
    interp.resize_tensor_input(inp["index"], (audio.shape[0], 43844, 1))
    interp.allocate_tensors()
    interp.set_tensor(inp["index"], audio[..., None])
    interp.invoke()
    outs = {d["name"]: interp.get_tensor(d["index"]) for d in interp.get_output_details()}
    assert set(outs) == {
        "StatefulPartitionedCall:0",
        "StatefulPartitionedCall:1",
        "StatefulPartitionedCall:2",
    }
    want = nmp.predict_fn(canonical_params, jnp.asarray(audio))
    for head, name in (
        ("contour", "StatefulPartitionedCall:0"),
        ("note", "StatefulPartitionedCall:1"),
        ("onset", "StatefulPartitionedCall:2"),
    ):
        diff = float(np.abs(outs[name] - np.asarray(want[head])).max())
        assert diff < 1e-4, (head, diff)


def test_fresh_init_roundtrip_with_nontrivial_bn(tmp_path):
    """A just-initialized model with non-identity BN stats survives both
    exports — exercises the in-graph BN fold on real statistics."""
    params = nmp.init_params(jax.random.PRNGKey(1))
    params["bn_contour"]["mean"] = jnp.full((8,), 0.3)
    params["bn_contour"]["var"] = jnp.full((8,), 2.0)
    params["bn_onset"]["gamma"] = jnp.full((32,), 1.5)
    params["bn_cqt"]["beta"] = jnp.full((1,), -0.2)

    sm = tmp_path / "nmp"
    tf_export.export_savedmodel(params, sm)
    re_sm = savedmodel.load_nmp_savedmodel(sm)
    for slot, leaf in re_sm.items():
        for role, arr in leaf.items():
            np.testing.assert_array_equal(arr, np.asarray(params[slot][role]))

    tl = tmp_path / "nmp.tflite"
    tf_export.export_tflite(params, tl)
    re_tl = tflite_import.load_nmp_tflite(tl)
    rng = np.random.default_rng(5)
    audio = jnp.asarray(rng.standard_normal((1, 43844)) * 0.1, jnp.float32)
    want = nmp.predict_fn(params, audio)
    got = nmp.predict_fn(re_tl, audio)
    for head in ("note", "onset", "contour"):
        diff = float(jnp.abs(want[head] - got[head]).max())
        assert diff <= 4e-6, (head, diff)


def test_export_cli_writes_and_verifies(tmp_path):
    """`basic-pitch-export --format savedmodel --format tflite` end to end
    (the CLI's own re-import verification gate runs inside main())."""
    from basic_pitch_tpu.cli import export as export_cli

    rc = export_cli.main(
        [str(tmp_path), "--format", "savedmodel", "--format", "tflite"]
    )
    assert rc == 0
    assert (tmp_path / "nmp" / "saved_model.pb").exists()
    assert (tmp_path / "nmp.tflite").exists()
