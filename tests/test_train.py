"""Training stack: losses, train step, end-to-end fit on synthetic data.

Mirrors the reference's strategy of training a real model for a couple of
epochs on random-data pipelines (`/root/reference/tests/test_nn.py:37-125`,
`tests/test_callbacks.py:27-61`).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from basic_pitch_tpu import constants
from basic_pitch_tpu.models import nmp
from basic_pitch_tpu.train import loop as train_loop
from basic_pitch_tpu.train import losses


def _random_batch(rng, batch_size=2):
    return {
        "audio": rng.randn(batch_size, constants.AUDIO_N_SAMPLES).astype(np.float32) * 0.1,
        "targets": {
            "contour": rng.rand(batch_size, 172, 264).astype(np.float32),
            "note": rng.rand(batch_size, 172, 88).astype(np.float32),
            "onset": (rng.rand(batch_size, 172, 88) > 0.95).astype(np.float32),
        },
        "weights": {k: np.ones(batch_size, np.float32) for k in ("contour", "note", "onset")},
    }


def test_transcription_loss_matches_bce():
    y_true = jnp.asarray([[0.0, 1.0, 0.5]])
    y_pred = jnp.asarray([[0.1, 0.9, 0.5]])
    out = losses.transcription_loss(y_true, y_pred, label_smoothing=0.0)
    expected = -np.mean(
        [np.log(0.9), np.log(0.9), 0.5 * np.log(0.5) + 0.5 * np.log(0.5)]
    )
    assert float(out[0]) == pytest.approx(expected, rel=1e-5)


def test_label_smoothing_pulls_towards_half():
    y_true = jnp.asarray([[1.0]])
    y_pred = jnp.asarray([[0.8]])
    hard = float(losses.transcription_loss(y_true, y_pred, 0.0)[0])
    smooth = float(losses.transcription_loss(y_true, y_pred, 0.2)[0])
    assert smooth > hard  # smoothed target (0.9) penalizes confident 0.8 more


def test_weighted_transcription_loss_balances_classes():
    y_true = jnp.asarray([[0.0] * 99 + [1.0]])
    y_pred = jnp.full((1, 100), 0.5)
    unweighted = float(jnp.mean(losses.transcription_loss(y_true, y_pred, 0.0)))
    weighted = float(losses.weighted_transcription_loss(y_true, y_pred, 0.0, positive_weight=0.5))
    # both classes predict 0.5 -> same loss; now skew predictions
    y_pred2 = jnp.asarray([[0.1] * 99 + [0.1]])
    w2 = float(losses.weighted_transcription_loss(y_true, y_pred2, 0.0, positive_weight=0.5))
    # positive example (pred 0.1, true 1) contributes half the loss despite 1/100 frequency
    assert w2 > unweighted


def test_sample_weights_zero_out_heads():
    rng = np.random.RandomState(0)
    batch = _random_batch(rng)
    outputs = {k: jnp.asarray(np.clip(v * 0.5 + 0.25, 1e-4, 1 - 1e-4)) for k, v in batch["targets"].items()}
    weights_on = {k: jnp.ones(2) for k in outputs}
    weights_off = {"contour": jnp.zeros(2), "note": jnp.ones(2), "onset": jnp.ones(2)}
    total_on, _ = losses.total_loss(outputs, batch["targets"], weights_on)
    total_off, per_head = losses.total_loss(outputs, batch["targets"], weights_off)
    assert float(per_head["contour"]) == 0.0
    assert float(total_off) < float(total_on)


def test_train_step_reduces_loss():
    rng = np.random.RandomState(0)
    config = train_loop.TrainConfig(learning_rate=5e-3)
    optimizer = train_loop.make_optimizer(config)
    params = nmp.init_params(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)
    step = train_loop.build_train_step(optimizer, config)
    batch = _random_batch(rng)
    params, opt_state, m0 = step(params, opt_state, batch)
    for _ in range(3):
        params, opt_state, m = step(params, opt_state, batch)
    assert float(m["loss"]) < float(m0["loss"])
    # unit-norm constraint holds after stepping
    w = params["note_conv"]["w"]
    norms = np.asarray(jnp.sqrt(jnp.sum(w**2, axis=(0, 1, 2))))
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


@pytest.mark.parametrize("precision", ["high", "default"])
def test_train_step_runs_at_reduced_precision(precision):
    """TrainConfig.precision steers the MXU passes of the TRAINING step
    only (inference stays HIGHEST); the step must run and reduce the loss
    at every setting — convergence, not bit-exactness, is training's
    acceptance gate (tools/train_precision_ab.json)."""
    rng = np.random.RandomState(0)
    config = train_loop.TrainConfig(learning_rate=5e-3, precision=precision)
    optimizer = train_loop.make_optimizer(config)
    params = nmp.init_params(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)
    step = train_loop.build_train_step(optimizer, config)
    batch = _random_batch(rng)
    params, opt_state, m0 = step(params, opt_state, batch)
    for _ in range(3):
        params, opt_state, m = step(params, opt_state, batch)
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < float(m0["loss"])


def test_trainable_cqt_kernels_learn_and_transcribe():
    """`trainable_cqt=True` puts the filterbank in the param tree: gradient
    steps move it, the per-step constraint keeps each bin L1-normalized, and
    the forward pass still produces well-formed posteriorgrams (the parity
    analogue of the reference CQT's `trainable=True`, `nnaudio.py:602-604`)."""
    rng = np.random.RandomState(3)
    model_config = nmp.ModelConfig(trainable_cqt=True)
    config = train_loop.TrainConfig(learning_rate=5e-3)
    optimizer = train_loop.make_optimizer(config)
    params = nmp.init_params(jax.random.PRNGKey(0), model_config)
    assert "cqt_kernels" in params
    initial = np.asarray(params["cqt_kernels"]).copy()

    opt_state = optimizer.init(params)
    step = train_loop.build_train_step(optimizer, config, model_config)
    batch = _random_batch(rng)
    for _ in range(2):
        params, opt_state, metrics = step(params, opt_state, batch)

    learned = np.asarray(params["cqt_kernels"])
    assert not np.allclose(learned, initial), "kernels did not receive gradients"
    # constraint invariant: complex L1 norm of every bin stays 1
    n_filters = learned.shape[1] // 2
    mags = np.sqrt(learned[:, :n_filters] ** 2 + learned[:, n_filters:] ** 2)
    np.testing.assert_allclose(mags.sum(axis=0), 1.0, atol=1e-5)

    out = nmp.predict_fn(params, jnp.asarray(batch["audio"]), model_config)
    assert out["note"].shape == (2, 172, 88)
    assert np.isfinite(np.asarray(out["note"])).all()
    # inference with the default (non-trainable) config is untouched: no
    # cqt_kernels key means the analytic bank is used
    base = nmp.init_params(jax.random.PRNGKey(0))
    assert "cqt_kernels" not in base


def test_fit_end_to_end(tmp_path):
    rng = np.random.RandomState(1)

    def iterator():
        while True:
            yield _random_batch(rng)

    config = train_loop.TrainConfig(
        epochs=2, steps_per_epoch=2, validation_steps=1, learning_rate=1e-3
    )
    best = train_loop.fit(
        iterator(), iterator(), tmp_path, config=config, log=lambda *_: None
    )
    assert (tmp_path / "model.best.npz").exists()
    assert (tmp_path / "checkpoints" / "model.00.npz").exists()
    assert (tmp_path / "checkpoints" / "model.01.npz").exists()
    # the saved best params load and run
    from basic_pitch_tpu.models import params as params_io

    loaded = params_io.load_params(tmp_path / "model.best.npz")
    out = nmp.predict_fn(loaded, jnp.zeros((1, constants.AUDIO_N_SAMPLES)))
    assert out["note"].shape == (1, 172, 88)


def test_visualize_callback_writes_events(tmp_path):
    pytest.importorskip("tensorboardX")
    from basic_pitch_tpu.train.visualize import VisualizeCallback

    rng = np.random.RandomState(2)

    def viz_iter():
        while True:
            yield _random_batch(rng)

    params = nmp.init_params(jax.random.PRNGKey(0))
    cb = VisualizeCallback(viz_iter(), viz_iter(), str(tmp_path), sonify=False)
    cb(0, params, {"loss": 1.0}, {"loss": 2.0})
    cb.close()
    files = list(tmp_path.glob("events.out.tfevents.*"))
    assert files and files[0].stat().st_size > 0


def test_fit_resume(tmp_path):
    """Killing training after epoch 0 and refitting resumes from the orbax
    state instead of restarting (a capability the reference lacks)."""
    rng = np.random.RandomState(3)

    def iterator():
        while True:
            yield _random_batch(rng)

    logs = []
    config = train_loop.TrainConfig(epochs=1, steps_per_epoch=1, validation_steps=1)
    train_loop.fit(iterator(), iterator(), tmp_path, config=config, log=logs.append)
    assert (tmp_path / "train_state").exists()

    config2 = train_loop.TrainConfig(epochs=3, steps_per_epoch=1, validation_steps=1)
    logs2 = []
    train_loop.fit(iterator(), iterator(), tmp_path, config=config2, log=logs2.append)
    assert any("resumed" in str(line) for line in logs2)
    # epochs 1 and 2 ran; epoch 0 did not repeat
    assert (tmp_path / "checkpoints" / "model.02.npz").exists()
    assert not any("epoch 0:" in str(line) for line in logs2)


def test_profiling_timers():
    from basic_pitch_tpu.utils.profiling import Timers

    timers = Timers()
    with timers("a"):
        pass
    with timers("a"):
        pass
    with timers("b"):
        pass
    rows = {name: count for name, _, count in timers.summary()}
    assert rows == {"a": 2, "b": 1}
    assert "a" in timers.report()


def test_eval_f1():
    from basic_pitch_tpu.utils import eval as evaluation

    ref = [(0.0, 1.0, 60), (1.0, 2.0, 64), (2.0, 3.0, 67)]
    est = [(0.01, 1.1, 60), (1.04, 2.2, 64), (2.5, 3.0, 67)]  # last onset too late
    m = evaluation.precision_recall_f1(ref, est)
    assert m["n_matched"] == 2
    assert m["precision"] == pytest.approx(2 / 3)
    assert m["recall"] == pytest.approx(2 / 3)
    # pitch off by a semitone -> no match
    m2 = evaluation.precision_recall_f1([(0.0, 1.0, 60)], [(0.0, 1.0, 61)])
    assert m2["n_matched"] == 0
    # offset criterion
    m3 = evaluation.precision_recall_f1(
        [(0.0, 1.0, 60)], [(0.0, 1.6, 60)], offset_ratio=0.2
    )
    assert m3["n_matched"] == 0
    m4 = evaluation.precision_recall_f1(
        [(0.0, 1.0, 60)], [(0.0, 1.1, 60)], offset_ratio=0.2
    )
    assert m4["n_matched"] == 1
    # empty edge cases
    assert evaluation.precision_recall_f1([], [])["f1"] == 0.0


def test_reduce_lr_on_plateau_keras_semantics():
    # scripted loss sequence reproducing keras.callbacks.ReduceLROnPlateau
    # (patience=2, factor=0.5, min_delta=0.05, cooldown=1)
    sched = train_loop.ReduceLROnPlateau(factor=0.5, patience=2, min_delta=0.05, cooldown=1)
    lr = 1.0
    history = []
    #         improve   sub-min_delta wobble (no reset)  plateau...
    seq = [1.0, 0.5, 0.49, 0.48, 0.6, 0.6, 0.6, 0.6, 0.6]
    for v in seq:
        lr, reduced = sched.step(v, lr)
        history.append((lr, reduced))
    # epoch0 1.0 improves (best inf->1.0); epoch1 0.5 improves; epochs 2,3 are
    # within min_delta of 0.5 -> wait 1,2 -> cut at epoch3 and cooldown starts.
    # Keras decrements the cooldown counter at the top of the epoch, so the
    # single cooldown epoch (4) still increments wait afterwards -> the next
    # cut lands on epoch5, then the cycle repeats (cooldown 6, cut 7, wait 8).
    assert [r for _, r in history] == [False, False, False, True, False, True, False, True, False]
    assert history[-1][0] == 0.125
    # best is NOT reset by a reduction: only a real improvement updates it
    assert sched.best == 0.5


def test_early_stopping_keras_semantics():
    es = train_loop.EarlyStopping(patience=3, min_delta=0.0)
    seq = [1.0, 0.9, 0.95, 0.95, 0.89, 0.95, 0.95]
    stops = [es.step(v) for v in seq]
    # improvements at 1.0, 0.9, 0.89 reset the wait; never 3 bad in a row,
    # but the tail leaves wait=2 (epochs 5,6)
    assert stops == [False] * 7
    assert es.step(0.95) is True  # third consecutive non-improvement


def test_no_contours_train_step():
    # with no_contours the "contour" output is a relu'd hidden activation;
    # the loss must skip it (reference intent: train.py:144-147 loss_no_contour)
    rng = np.random.RandomState(0)
    model_config = nmp.ModelConfig(no_contours=True)
    config = train_loop.TrainConfig(learning_rate=5e-3)
    optimizer = train_loop.make_optimizer(config)
    params = nmp.init_params(jax.random.PRNGKey(0), model_config)
    opt_state = optimizer.init(params)
    step = train_loop.build_train_step(optimizer, config, model_config)
    batch = _random_batch(rng)
    params, opt_state, m0 = step(params, opt_state, batch)
    assert "loss_contour" not in m0
    assert np.isfinite(float(m0["loss"]))
    params, opt_state, m1 = step(params, opt_state, batch)
    params, opt_state, m2 = step(params, opt_state, batch)
    assert float(m2["loss"]) < float(m0["loss"])


def test_total_loss_no_contours_excludes_head():
    rng = np.random.RandomState(0)
    batch = _random_batch(rng)
    outputs = {
        "contour": jnp.asarray(rng.randn(2, 172, 264).astype(np.float32)) * 10.0,  # relu-ish, not a probability
        "note": jnp.asarray(np.clip(batch["targets"]["note"], 1e-4, 1 - 1e-4)),
        "onset": jnp.asarray(np.clip(batch["targets"]["onset"] * 0.5 + 0.25, 1e-4, 1 - 1e-4)),
    }
    total, per_head = losses.total_loss(outputs, batch["targets"], no_contours=True)
    assert set(per_head) == {"note", "onset"}
    assert np.isfinite(float(total))


# ---------------------------------------------------------------------------
# device-rasterized batches (loader._collate_device + loop.materialize_batch)
# ---------------------------------------------------------------------------


def _annotation_like_windows(rng, n=3, pcm16_audio=True):
    """Window dicts with realistic sparse targets (a few hundred nonzeros)."""

    def sparse(bins, nnz):
        m = np.zeros((172, bins), np.float32)
        t = rng.randint(0, 172, nnz)
        f = rng.randint(0, bins, nnz)
        m[t, f] = rng.rand(nnz).astype(np.float32) * 0.9 + 0.1
        return m

    windows = []
    for _ in range(n):
        if pcm16_audio:
            pcm = rng.randint(-32768, 32768, constants.AUDIO_N_SAMPLES)
            audio = (pcm.astype(np.float32) / 32768.0).astype(np.float32)
        else:
            audio = rng.randn(constants.AUDIO_N_SAMPLES).astype(np.float32)
        windows.append(
            {
                "audio": audio,
                "targets": {
                    "onset": sparse(88, rng.randint(1, 40)),
                    "note": sparse(88, rng.randint(50, 400)),
                    "contour": sparse(264, rng.randint(100, 900)),
                },
                "weights": {k: 1.0 for k in ("onset", "note", "contour")},
            }
        )
    return windows


def test_device_collate_materializes_bitexact():
    """Sparse COO batch -> in-graph rasterization == the dense collate,
    bit-for-bit, including the exact int16 audio round trip."""
    from basic_pitch_tpu.data import loader

    rng = np.random.RandomState(3)
    windows = _annotation_like_windows(rng)
    dense = loader._collate(windows)
    device = loader._collate_device(windows)
    assert device["audio"].dtype == np.int16  # PCM16-exact audio detected
    mat = jax.jit(train_loop.materialize_batch)(
        jax.tree_util.tree_map(jnp.asarray, device)
    )
    np.testing.assert_array_equal(np.asarray(mat["audio"]), dense["audio"])
    for head in ("onset", "note", "contour"):
        np.testing.assert_array_equal(
            np.asarray(mat["targets"][head]), dense["targets"][head]
        )
        np.testing.assert_array_equal(
            np.asarray(mat["weights"][head]), dense["weights"][head]
        )


def test_device_collate_keeps_f32_audio_when_not_pcm16():
    from basic_pitch_tpu.data import loader

    rng = np.random.RandomState(4)
    windows = _annotation_like_windows(rng, pcm16_audio=False)
    device = loader._collate_device(windows)
    assert device["audio"].dtype == np.float32
    dense = loader._collate(windows)
    np.testing.assert_array_equal(device["audio"], dense["audio"])


def test_packed_batch_transport_bitexact():
    """packed_batches + upload_batch (codec audio transport for training,
    VERDICT r4): the reconstructed device batch materializes bit-identically
    to the dense collate, and the link-byte accounting matches what shipped."""
    from basic_pitch_tpu.data import loader
    from basic_pitch_tpu.ops import pcmcodec

    if not pcmcodec.available():
        pytest.skip("native packer not built")
    rng = np.random.RandomState(5)
    windows = _annotation_like_windows(rng)
    for w in windows:  # compressible PCM16 (uniform noise rightly falls back)
        walk = np.cumsum(rng.randint(-300, 300, constants.AUDIO_N_SAMPLES))
        w["audio"] = np.clip(walk, -32768, 32767).astype(np.int16).astype(
            np.float32
        ) / np.float32(32768.0)
    dense = loader._collate(windows)
    device = loader._collate_device(windows)

    packed = train_loop.pack_batch_audio(device, pcm_transport="codec")
    assert "audio_packed" in packed and "audio" not in packed
    assert train_loop.needs_upload(packed)
    # sparse targets are wire-trimmed to the batch's nnz bucket: far fewer
    # bytes than the executable caps the loader pads to
    for head, sp in packed["targets_sparse"].items():
        assert sp["idx"].shape[1] <= device["targets_sparse"][head]["idx"].shape[1]
    dev_batch, nbytes = train_loop.upload_batch(packed)
    expected = packed["audio_packed"][0].packed_bytes + sum(
        leaf.nbytes
        for k, v in packed.items()
        if k != "audio_packed"
        for leaf in jax.tree_util.tree_leaves(v)
        if hasattr(leaf, "nbytes")
    )
    assert nbytes == expected
    untrimmed_wire = sum(
        leaf.nbytes for leaf in jax.tree_util.tree_leaves(device)
    )
    assert nbytes < 0.6 * untrimmed_wire, (nbytes, untrimmed_wire)
    # device batch restored to the executable cap shapes
    for head, sp in dev_batch["targets_sparse"].items():
        assert sp["idx"].shape == device["targets_sparse"][head]["idx"].shape
    mat = train_loop.materialize_batch(dev_batch)
    np.testing.assert_array_equal(np.asarray(mat["audio"]), dense["audio"])
    for head in ("onset", "note", "contour"):
        np.testing.assert_array_equal(
            np.asarray(mat["targets"][head]), dense["targets"][head]
        )

    # raw mode passes through untouched (the transport decision is measured,
    # not assumed — "raw" must stay available)
    raw = train_loop.pack_batch_audio(device, pcm_transport="raw")
    assert "audio" in raw and "audio_packed" not in raw


def test_sparse_cap_buckets_pow2_and_sentinel_drops():
    from basic_pitch_tpu.data import loader

    m = np.zeros((172, 88), np.float32)
    m[5, 7] = 0.5
    sp = loader._sparse_head("onset", [m, np.zeros((172, 88), np.float32)])
    # caps sit at the per-head floor (stable executable signature) until a
    # denser batch ratchets them to the next pow2
    assert sp["idx"].shape == (2, loader._SPARSE_CAP_FLOORS["onset"])
    assert sp["idx"][0, 0] == 5 * 88 + 7
    assert (sp["idx"][1] == 172 * 88).all()  # all-sentinel empty window

    dense = np.ones((172, 88), np.float32)  # nnz 15136 > the onset floor
    sp = loader._sparse_head("onset", [dense])
    cap = sp["idx"].shape[1]
    assert cap >= 15136 and (cap & (cap - 1)) == 0  # pow2 ratchet


def test_train_step_sparse_equals_dense():
    """One optimizer step from identical state through both batch formats
    produces identical metrics and identical updated parameters."""
    rng = np.random.RandomState(5)
    windows = _annotation_like_windows(rng, n=2)
    from basic_pitch_tpu.data import loader

    config = train_loop.TrainConfig(learning_rate=5e-3)
    optimizer = train_loop.make_optimizer(config)
    step = train_loop.build_train_step(optimizer, config)

    results = []
    for batch in (loader._collate(windows), loader._collate_device(windows)):
        params = nmp.init_params(jax.random.PRNGKey(1))
        opt_state = optimizer.init(params)
        new_params, _, metrics = step(params, opt_state, batch)
        results.append((new_params, float(metrics["loss"])))
    (p_dense, l_dense), (p_sparse, l_sparse) = results
    assert l_dense == l_sparse
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        p_dense,
        p_sparse,
    )


# ---------------------------------------------------------------------------
# multi-step (scan-fused) training program — dispatch amortization
# (tools/dispatch_overhead.json: ~23 ms fixed per-execute on the tunneled
# runtime; one program per k steps makes it ~23/k ms)
# ---------------------------------------------------------------------------


def test_multi_step_equals_sequential_steps():
    """build_multi_step(stack_batches([b1..bk])) must produce the same
    params/opt_state/metrics as k sequential build_train_step calls."""
    import optax

    rng = np.random.RandomState(0)
    batches = [_random_batch(rng, batch_size=2) for _ in range(3)]
    config = train_loop.TrainConfig(learning_rate=1e-3)
    # SGD for the bit-level check: adam's m/(sqrt(v)+eps) amplifies fp32
    # fusion-order noise to lr-scale param differences, which says nothing
    # about program equivalence. The production (adam) path is covered by
    # the loss-trajectory match in test_multi_step_sparse_wire_roundtrip.
    optimizer = optax.inject_hyperparams(optax.sgd)(learning_rate=config.learning_rate)
    params = jax.device_get(nmp.init_params(jax.random.PRNGKey(1)))
    opt_state = jax.device_get(optimizer.init(params))

    clone = lambda tree: jax.tree.map(jnp.array, tree)  # donation-safe copies
    p_seq, o_seq = clone(params), clone(opt_state)
    step = train_loop.build_train_step(optimizer, config)
    seq_losses = []
    for b in batches:
        p_seq, o_seq, m = step(p_seq, o_seq, b)
        seq_losses.append(float(m["loss"]))

    stacked = train_loop.stack_batches(batches)
    assert train_loop.is_stacked(stacked)
    multi = train_loop.build_multi_step(optimizer, config)
    p_multi, o_multi, metrics = multi(clone(params), clone(opt_state), stacked)

    np.testing.assert_allclose(np.asarray(metrics["loss"]), seq_losses, rtol=1e-6)
    for (path_a, a), (path_b, b) in zip(
        jax.tree_util.tree_flatten_with_path(jax.device_get(p_seq))[0][:],
        jax.tree_util.tree_flatten_with_path(jax.device_get(p_multi))[0][:],
    ):
        assert path_a == path_b
        # scan-fused and per-step executables fuse differently; fp32
        # reduction reassociation (BN batch means over ~30k elements) bounds
        # the leaf divergence while the per-step losses match at rtol 1e-6
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-5, err_msg=str(path_a))


def test_multi_step_sparse_wire_roundtrip():
    """Stacked wire-form batches (trimmed sparse + packed audio) upload and
    scan to the same result as per-batch dense steps."""
    from basic_pitch_tpu.data import loader

    rng = np.random.RandomState(3)
    batches_dense, batches_sparse = [], []
    for i in range(2):
        windows = _annotation_like_windows(rng, n=2)
        batches_dense.append(loader._collate(windows))
        batches_sparse.append(loader._collate_device(windows))

    config = train_loop.TrainConfig()
    optimizer = train_loop.make_optimizer(config)
    params = jax.device_get(nmp.init_params(jax.random.PRNGKey(2)))
    opt_state = jax.device_get(optimizer.init(params))

    clone = lambda tree: jax.tree.map(jnp.array, tree)
    step = train_loop.build_train_step(optimizer, config)
    p_seq, o_seq = clone(params), clone(opt_state)
    seq_losses = []
    for b in batches_dense:
        p_seq, o_seq, m = step(p_seq, o_seq, b)
        seq_losses.append(float(m["loss"]))

    stacked = train_loop.stack_batches(batches_sparse)
    wire = train_loop.pack_batch_audio(stacked, pcm_transport="codec")
    dev, nbytes = train_loop.upload_batch(wire)
    assert nbytes > 0
    multi = train_loop.build_multi_step(optimizer, config)
    _p, _o, metrics = multi(clone(params), clone(opt_state), dev)
    np.testing.assert_allclose(np.asarray(metrics["loss"]), seq_losses, rtol=1e-6)


def test_grouped_batches_stacks_k():
    rng = np.random.RandomState(1)
    stream = iter([_random_batch(rng) for _ in range(5)])
    groups = list(train_loop.grouped_batches(stream, 2))
    assert len(groups) == 2  # trailing partial group is dropped (infinite streams in practice)
    assert groups[0]["audio"].shape[0] == 2


def test_multi_step_sharded_over_mesh():
    """The stacked program shards each micro-batch over the data axis."""
    from basic_pitch_tpu.parallel import mesh as mesh_lib

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    mesh = mesh_lib.make_mesh()
    rng = np.random.RandomState(5)
    batches = [_random_batch(rng, batch_size=8) for _ in range(2)]
    config = train_loop.TrainConfig()
    optimizer = train_loop.make_optimizer(config)
    params = mesh_lib.replicate(mesh, nmp.init_params(jax.random.PRNGKey(0)))
    opt_state = mesh_lib.replicate(mesh, optimizer.init(jax.device_get(params)))

    stacked = train_loop.stack_batches(batches)
    multi = train_loop.build_multi_step(optimizer, config, mesh=mesh)
    p, o, metrics = multi(params, opt_state, stacked)
    assert np.asarray(metrics["loss"]).shape == (2,)
    assert np.isfinite(np.asarray(metrics["loss"])).all()


def test_fit_with_grouped_batches(tmp_path):
    """fit consumes a grouped_batches stream: k steps per dispatch, epoch
    step accounting intact, checkpoints written."""
    rng = np.random.RandomState(7)

    def iterator():
        while True:
            yield _random_batch(rng)

    config = train_loop.TrainConfig(
        epochs=2, steps_per_epoch=4, validation_steps=1, learning_rate=1e-3
    )
    train_loop.fit(
        train_loop.grouped_batches(iterator(), 2),
        iterator(),
        tmp_path,
        config=config,
        log=lambda *_: None,
    )
    assert (tmp_path / "model.best.npz").exists()
    assert (tmp_path / "checkpoints" / "model.01.npz").exists()
