"""Training loop: optimizer state, the jitted (optionally sharded) train
step, LR scheduling, early stopping, and checkpointing.

Reference behavior mirrored from `/root/reference/basic_pitch/train.py:35-168`:
Adam, per-head smoothed BCE (optional class-balanced onset loss), unit-norm
kernel constraint after each step, ReduceLROnPlateau(factor 0.5, patience 10),
EarlyStopping(patience 25), best + per-epoch checkpoints. TPU-first
differences: the step is one jitted function whose batch axis is sharded
over a `Mesh` (gradients combine via a compiler-inserted psum over ICI), and
checkpoints are this framework's flat-npz parameter archives.
"""

from __future__ import annotations

import dataclasses
import functools
import pathlib
import time
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from basic_pitch_tpu import constants
from basic_pitch_tpu.models import nmp
from basic_pitch_tpu.models import params as params_io
from basic_pitch_tpu.parallel import mesh as mesh_lib
from basic_pitch_tpu.train import losses

Batch = Dict[str, Any]  # {"audio": (b, n), "targets": {...}, "weights": {...}}

_HEAD_BINS = {
    "onset": constants.N_FREQ_BINS_NOTES,
    "note": constants.N_FREQ_BINS_NOTES,
    "contour": constants.N_FREQ_BINS_CONTOURS,
}


def materialize_batch(batch: Batch) -> Batch:
    """In-graph materialization of a device-rasterized batch (traced code).

    The loader's `device_targets` mode ships int16 audio plus flat-COO
    target triples (data/loader.py:_collate_device) because the dense
    (B, 172, 88/264) float32 targets dominate an upload-bound link. Here,
    inside the jitted step, int16 dequantizes by the exact /32768 the WAV
    decoder used, and each head scatters into its dense shape. Window COO
    coords are unique, so scatter-set with mode="drop" (padding slots carry
    an out-of-range sentinel) reproduces the host-densified tensors
    bit-for-bit — pinned by tests/test_train.py.
    Dense batches pass through untouched.
    """
    audio = batch["audio"]
    if "targets_sparse" not in batch and audio.dtype != jnp.int16:
        return batch
    out = {k: v for k, v in batch.items() if k != "targets_sparse"}
    if audio.dtype == jnp.int16:
        out["audio"] = audio.astype(jnp.float32) / 32768.0
    if "targets_sparse" in batch:
        frames = constants.ANNOT_N_FRAMES
        dense = {}
        for head, sp in batch["targets_sparse"].items():
            bins = _HEAD_BINS[head]
            b = sp["idx"].shape[0]
            flat = jnp.zeros((b, frames * bins), sp["val"].dtype)
            flat = flat.at[jnp.arange(b)[:, None], sp["idx"]].set(
                sp["val"], mode="drop"
            )
            dense[head] = flat.reshape(b, frames, bins)
        out["targets"] = dense
    return out


# ---------------------------------------------------------------------------
# batch transport: the training analogue of the inference pipeline's measured
# PCM transport (ops/transport.py). Through a slow tunnel the per-step batch
# upload, not the fwd+bwd compute, bounds windows/s (TRAIN_BENCH r3: 118 ms
# steps vs ~17 ms of step compute), so int16 batch audio rides the same
# residual codec: `pack_batch_audio` runs on the producing (prefetch) thread,
# `upload_batch` ships the result and counts the bytes that crossed the link.
# ---------------------------------------------------------------------------


_WIRE_MIN_BUCKET = 64


def _trim_sparse_for_wire(batch: Batch) -> Batch:
    """Slice each sparse head's (idx, val) to the batch's actual pow2 nnz
    bucket for the wire; `upload_batch` re-pads ON DEVICE to the executable
    cap (sentinel idx / zero val — scatter-dropped slots, so materialization
    is unchanged bit-for-bit). The caps exist to keep ONE train-step
    executable (loader._SPARSE_CAP_FLOORS); without this trim they also
    shipped as bytes — ~54 KB/window of padding against ~1-2 KB of real
    nonzeros, the dominant target-upload cost at batch >= 64."""
    if "targets_sparse" not in batch:
        return batch
    out = dict(batch)
    trimmed = {}
    for head, sp in batch["targets_sparse"].items():
        idx, val = sp["idx"], sp["val"]
        cap = idx.shape[-1]
        sentinel = constants.ANNOT_N_FRAMES * _HEAD_BINS[head]
        nnz_max = int((idx != sentinel).sum(axis=-1).max()) if cap else 0
        bucket = _WIRE_MIN_BUCKET
        while bucket < nnz_max:
            bucket *= 2
        if bucket < cap:
            trimmed[head] = {
                "idx": np.ascontiguousarray(idx[..., :bucket]),
                "val": np.ascontiguousarray(val[..., :bucket]),
                "cap": cap,
            }
        else:
            trimmed[head] = {"idx": idx, "val": val, "cap": cap}
    out["targets_sparse"] = trimmed
    return out


def pack_batch_audio(batch: Batch, pcm_transport: str = "auto") -> Batch:
    """Host-side wire preparation: replace int16 batch audio with its packed
    form when the measured transport picks the codec, and trim sparse-target
    padding off the wire. Run this where the loader runs (e.g. under
    `packed_batches`) so the CPU work stays off the step loop."""
    from basic_pitch_tpu.ops import pcmcodec, transport

    batch = _trim_sparse_for_wire(batch)
    audio = batch.get("audio")
    if (
        isinstance(audio, np.ndarray)
        and audio.dtype == np.int16
        and pcm_transport != "raw"
        and pcmcodec.available()
        and (
            pcm_transport == "codec"
            # serial cost model: the train feed's host CPU is saturated by
            # the loader, so pack time adds to the wall (transport.resolve)
            or transport.resolve("auto", serial=True) == "codec"
        )
    ):
        packed = pcmcodec.pack(np.ascontiguousarray(audio).reshape(-1))
        if packed.packed_bytes < audio.nbytes:
            out = dict(batch)
            out["audio_packed"] = (packed, audio.shape)
            del out["audio"]
            return out
    return batch


def packed_batches(batches: Iterator[Batch], pcm_transport: str = "auto") -> Iterator[Batch]:
    """Wrap a batch iterator with prefetch-thread wire preparation (audio
    packing + sparse-target trimming). Single-device transport only: mesh
    training shards host batches directly (`mesh_lib.shard_batch`)."""
    from basic_pitch_tpu.data.loader import _prefetch

    return _prefetch(
        (pack_batch_audio(b, pcm_transport) for b in batches), depth=2
    )


def needs_upload(batch: Batch) -> bool:
    """True when the batch is in wire form (packed audio and/or trimmed
    sparse targets) and must go through `upload_batch` before the step."""
    if "audio_packed" in batch:
        return True
    ts = batch.get("targets_sparse")
    return bool(ts) and any("cap" in sp for sp in ts.values())


@functools.lru_cache(maxsize=64)
def _pad_sparse_fn(cap: int, sentinel: int):
    """(B, bucket) wire idx/val -> (B, cap): restore the executable-cap
    shape on device (sentinel idx rows are scatter-dropped, zero vals)."""

    def run(idx, val):
        extra = cap - idx.shape[-1]
        pad = [(0, 0)] * (idx.ndim - 1) + [(0, extra)]
        return (
            jnp.pad(idx, pad, constant_values=sentinel),
            jnp.pad(val, pad),
        )

    return jax.jit(run)


def upload_batch(batch: Batch) -> Tuple[Batch, int]:
    """Ship one loader batch to the device explicitly; returns the device
    batch and the bytes that crossed the host->device link. Codec-packed
    audio reconstructs in HBM as the exact dequantized float32 samples
    (`materialize_batch` passes float32 audio through untouched); wire-
    trimmed sparse targets re-pad on device to the executable caps."""
    from basic_pitch_tpu.ops import pcmcodec

    if "audio_packed" in batch:
        packed, shape = batch["audio_packed"]
        rest = {k: v for k, v in batch.items() if k != "audio_packed"}
        nbytes = packed.packed_bytes
        audio_dev = pcmcodec.decode_to_device(
            packed, int(np.prod(shape))
        ).reshape(shape)
    else:
        rest = dict(batch)  # raw audio rides with the other leaves
        nbytes = 0
        audio_dev = None
    trimmed = rest.pop("targets_sparse", None)
    nbytes += sum(leaf.nbytes for leaf in jax.tree_util.tree_leaves(rest))
    dev = jax.device_put(rest)
    if audio_dev is not None:
        dev["audio"] = audio_dev
    if trimmed is not None:
        heads = {}
        for head, sp in trimmed.items():
            idx_dev, val_dev = jax.device_put((sp["idx"], sp["val"]))
            nbytes += sp["idx"].nbytes + sp["val"].nbytes
            cap = sp.get("cap", sp["idx"].shape[-1])
            if cap > sp["idx"].shape[-1]:
                sentinel = constants.ANNOT_N_FRAMES * _HEAD_BINS[head]
                idx_dev, val_dev = _pad_sparse_fn(cap, sentinel)(idx_dev, val_dev)
            heads[head] = {"idx": idx_dev, "val": val_dev}
        dev["targets_sparse"] = heads
    return dev, nbytes


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 1e-3
    # MXU matmul/conv precision for the TRAINING step only. Inference keeps
    # HIGHEST (the exact-parity gate, tools/precision_ab.json); training's
    # acceptance gate is held-out convergence, not bit-exactness, so the
    # faster passes are legitimate here when the comparator holds
    # (tools/train_precision_ab.json): "highest" (6-pass fp32 emulation),
    # "high" (3-pass), "default" (1-pass bf16 inputs, fp32 accumulate).
    precision: str = "highest"
    label_smoothing: float = losses.DEFAULT_LABEL_SMOOTHING
    weighted_onset_loss: bool = False
    positive_onset_weight: float = losses.DEFAULT_POSITIVE_WEIGHT
    bn_momentum: float = nmp.BN_MOMENTUM
    lr_reduction_factor: float = 0.5
    lr_patience: int = 10  # epochs without val improvement before LR cut
    lr_min_delta: float = 1e-4  # Keras ReduceLROnPlateau default
    lr_cooldown: int = 0
    min_lr: float = 0.0
    early_stop_patience: int = 25
    early_stop_min_delta: float = 0.0  # Keras EarlyStopping default
    steps_per_epoch: int = 100
    validation_steps: int = 10
    epochs: int = 500


@dataclasses.dataclass
class ReduceLROnPlateau:
    """Keras-exact plateau LR scheduler (`keras.callbacks.ReduceLROnPlateau`,
    as configured by the reference at `train.py:130`: patience=10, factor=0.5,
    min_delta=1e-4, cooldown=0).

    Semantics: an epoch improves iff ``current < best - min_delta``. During
    cooldown the wait counter is held at zero. A reduction fires when ``wait``
    reaches ``patience`` outside cooldown; it resets ``wait`` (but NOT ``best``)
    and starts the cooldown — so over a long flat plateau with cooldown=0 cuts
    happen every ``patience`` epochs, but any sub-min_delta wobble never resets
    the clock, unlike a naive best-epoch counter.
    """

    factor: float = 0.5
    patience: int = 10
    min_delta: float = 1e-4
    cooldown: int = 0
    min_lr: float = 0.0
    best: float = np.inf
    wait: int = 0
    cooldown_counter: int = 0

    def step(self, current: float, lr: float) -> Tuple[float, bool]:
        """Advance one epoch; returns (new_lr, reduced?)."""
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.wait = 0
        if current < self.best - self.min_delta:
            self.best = current
            self.wait = 0
        elif self.cooldown_counter <= 0:
            self.wait += 1
            if self.wait >= self.patience:
                self.cooldown_counter = self.cooldown
                self.wait = 0
                if lr > self.min_lr:
                    return max(lr * self.factor, self.min_lr), True
        return lr, False

    def state(self) -> Dict:
        return {"best": float(self.best), "wait": self.wait, "cooldown_counter": self.cooldown_counter}

    def load_state(self, state: Dict) -> None:
        self.best = float(state["best"])
        self.wait = int(state["wait"])
        self.cooldown_counter = int(state["cooldown_counter"])


@dataclasses.dataclass
class EarlyStopping:
    """Keras-exact early stopping (`keras.callbacks.EarlyStopping`, reference
    `train.py:129`: patience=25, min_delta=0). Improvement means
    ``current < best - min_delta``; stop once ``patience`` consecutive
    non-improving epochs have elapsed."""

    patience: int = 25
    min_delta: float = 0.0
    best: float = np.inf
    wait: int = 0

    def step(self, current: float) -> bool:
        """Advance one epoch; returns True when training should stop."""
        self.wait += 1
        if current < self.best - self.min_delta:
            self.best = current
            self.wait = 0
        return self.wait >= self.patience

    def state(self) -> Dict:
        return {"best": float(self.best), "wait": self.wait}

    def load_state(self, state: Dict) -> None:
        self.best = float(state["best"])
        self.wait = int(state["wait"])


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    # inject_hyperparams exposes the LR for plateau reduction
    return optax.inject_hyperparams(optax.adam)(learning_rate=config.learning_rate)


def _update_bn_stats(params, batch_stats, momentum: float):
    """Fold train-mode batch statistics into the moving averages."""
    new_params = dict(params)
    for bn_name, stats in batch_stats.items():
        if stats is None:
            continue
        mean, var = stats
        bn = dict(params[bn_name])
        bn["mean"] = momentum * bn["mean"] + (1.0 - momentum) * mean
        bn["var"] = momentum * bn["var"] + (1.0 - momentum) * var
        new_params[bn_name] = bn
    return new_params


_TRAIN_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def train_step_body(
    params: "Dict[str, Any]",
    opt_state: "optax.OptState",
    batch: Batch,
    optimizer: optax.GradientTransformation,
    config: TrainConfig,
    model_config: nmp.ModelConfig = nmp.DEFAULT_CONFIG,
) -> "tuple[Dict[str, Any], optax.OptState, Dict[str, jnp.ndarray]]":
    """One train step as a pure traceable function.

    Shared by `build_train_step` (one dispatch per step) and
    `build_multi_step` (a `lax.scan` of steps inside one executable, which
    amortizes the fixed per-dispatch latency — ~29 ms on the tunneled
    runtime, tools/dispatch_overhead.json)."""
    batch = materialize_batch(batch)

    def loss_fn(p):
        outputs, batch_stats = nmp.forward(
            p,
            batch["audio"],
            model_config,
            train=True,
            precision=_TRAIN_PRECISIONS[config.precision],
        )
        total, per_head = losses.total_loss(
            outputs,
            batch["targets"],
            batch.get("weights"),
            label_smoothing=config.label_smoothing,
            weighted_onset=config.weighted_onset_loss,
            positive_weight=config.positive_onset_weight,
            no_contours=model_config.no_contours,
        )
        return total, (per_head, batch_stats)

    (total, (per_head, batch_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    params = nmp.apply_unit_norm_constraint(params)
    params = _update_bn_stats(params, batch_stats, config.bn_momentum)
    metrics = {"loss": total, **{f"loss_{k}": v for k, v in per_head.items()}}
    return params, opt_state, metrics


def build_train_step(
    optimizer: optax.GradientTransformation,
    config: TrainConfig,
    model_config: nmp.ModelConfig = nmp.DEFAULT_CONFIG,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> Callable:
    """Returns jitted (params, opt_state, batch) -> (params, opt_state, metrics).

    With a mesh, the batch is sharded over its "data" axis and parameters are
    replicated; XLA inserts the gradient all-reduce.
    """
    # the train-step executable costs ~100 s to build through the tunneled
    # runtime; persist it like the inference programs do
    from basic_pitch_tpu.utils import runtime

    runtime.enable_compilation_cache()

    def step(params, opt_state, batch):
        return train_step_body(params, opt_state, batch, optimizer, config, model_config)

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1))

    batch_sharding = mesh_lib.batch_sharded(mesh)
    rep = mesh_lib.replicated(mesh)
    # a single sharding as a pytree prefix shards EVERY batch leaf on its
    # leading (batch) axis — dense targets and sparse COO triples alike
    return jax.jit(
        step,
        in_shardings=(rep, rep, batch_sharding),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1),
    )


def stack_batches(batches: Sequence[Batch]) -> Batch:
    """Stack k loader batches leaf-wise on a NEW leading axis (host numpy).

    The result feeds `build_multi_step`, which scans the k steps inside ONE
    executable — on a dispatch-latency-bound runtime this amortizes the
    fixed ~23 ms per-execute cost (tools/dispatch_overhead.json) and merges
    k uploads into one transfer. Sparse heads may be wire-trimmed to
    different pow2 buckets; they are re-padded to the group max here (the
    sentinel rows are scatter-dropped, so materialization is unchanged).
    Audio must still be raw (pack AFTER stacking: `pack_batch_audio` flattens
    whatever shape it gets)."""
    if any("audio_packed" in b for b in batches):
        raise ValueError("stack before pack_batch_audio, not after")
    first = batches[0]
    out: Batch = {"audio": np.stack([b["audio"] for b in batches])}
    if "targets" in first:
        out["targets"] = {
            k: np.stack([b["targets"][k] for b in batches]) for k in first["targets"]
        }
    if "targets_sparse" in first:
        heads = {}
        for head in first["targets_sparse"]:
            sps = [b["targets_sparse"][head] for b in batches]
            bucket = max(sp["idx"].shape[-1] for sp in sps)
            cap = max(sp.get("cap", sp["idx"].shape[-1]) for sp in sps)
            sentinel = constants.ANNOT_N_FRAMES * _HEAD_BINS[head]
            idx = np.stack([
                np.pad(sp["idx"], ((0, 0), (0, bucket - sp["idx"].shape[-1])),
                       constant_values=sentinel)
                for sp in sps
            ])
            val = np.stack([
                np.pad(sp["val"], ((0, 0), (0, bucket - sp["val"].shape[-1])))
                for sp in sps
            ])
            heads[head] = (
                {"idx": idx, "val": val, "cap": cap} if cap > bucket
                else {"idx": idx, "val": val}
            )
        out["targets_sparse"] = heads
    if "weights" in first:
        out["weights"] = {
            k: np.stack([b["weights"][k] for b in batches]) for k in first["weights"]
        }
    return out


def grouped_batches(batches: Iterator[Batch], k: int) -> Iterator[Batch]:
    """Group a loader batch stream into stacked k-step batches for
    `build_multi_step`. Compose as: loader -> grouped_batches(k) ->
    packed_batches -> fit(...)."""
    group: list = []
    for batch in batches:
        group.append(batch)
        if len(group) == k:
            yield stack_batches(group)
            group = []


def is_stacked(batch: Batch) -> bool:
    """True for a `stack_batches` result (leading step axis on every leaf)."""
    if "audio_packed" in batch:
        return len(batch["audio_packed"][1]) == 3
    audio = batch.get("audio")
    return audio is not None and audio.ndim == 3


def build_multi_step(
    optimizer: optax.GradientTransformation,
    config: TrainConfig,
    model_config: nmp.ModelConfig = nmp.DEFAULT_CONFIG,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> Callable:
    """Jitted (params, opt_state, stacked_batch) -> (params, opt_state, metrics):
    `lax.scan` of `train_step_body` over the leading step axis — semantically
    identical to k sequential `build_train_step` calls (tests/test_train.py),
    but ONE dispatch and ONE upload for the whole group. Metrics leaves come
    back with the (k,) step axis. With a mesh, each micro-batch is sharded on
    its batch axis (axis 1 of the stacked leaves) and parameters replicated."""
    from basic_pitch_tpu.utils import runtime

    runtime.enable_compilation_cache()

    def run(params, opt_state, batches):
        def body(carry, batch):
            p, o = carry
            p, o, metrics = train_step_body(p, o, batch, optimizer, config, model_config)
            return (p, o), metrics

        (params, opt_state), metrics = jax.lax.scan(body, (params, opt_state), batches)
        return params, opt_state, metrics

    if mesh is None:
        return jax.jit(run, donate_argnums=(0, 1))

    stacked_sharding = mesh_lib.stacked_batch_sharded(mesh)
    rep = mesh_lib.replicated(mesh)
    return jax.jit(
        run,
        in_shardings=(rep, rep, stacked_sharding),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1),
    )


def build_eval_step(
    config: TrainConfig,
    model_config: nmp.ModelConfig = nmp.DEFAULT_CONFIG,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> Callable:
    from basic_pitch_tpu.utils import runtime

    runtime.enable_compilation_cache()

    def step(params, batch):
        batch = materialize_batch(batch)
        outputs, _ = nmp.forward(params, batch["audio"], model_config, train=False)
        total, per_head = losses.total_loss(
            outputs,
            batch["targets"],
            batch.get("weights"),
            label_smoothing=config.label_smoothing,
            weighted_onset=config.weighted_onset_loss,
            positive_weight=config.positive_onset_weight,
            no_contours=model_config.no_contours,
        )
        return {"loss": total, **{f"loss_{k}": v for k, v in per_head.items()}}

    if mesh is None:
        return jax.jit(step)
    batch_sharding = mesh_lib.batch_sharded(mesh)
    rep = mesh_lib.replicated(mesh)
    return jax.jit(step, in_shardings=(rep, batch_sharding), out_shardings=rep)


def save_train_state(
    path: pathlib.Path,
    params: "Dict[str, Any]",
    opt_state: "optax.OptState",
    extra: Dict,
) -> None:
    """Full-state checkpoint (params + optimizer + bookkeeping) via orbax."""
    import orbax.checkpoint as ocp

    path = pathlib.Path(path).resolve()
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(
        path,
        {"params": jax.device_get(params), "opt_state": jax.device_get(opt_state), "extra": extra},
        force=True,
    )
    checkpointer.wait_until_finished()


def restore_train_state(
    path: pathlib.Path,
    params_template: "Dict[str, Any]",
    opt_state_template: "optax.OptState",
) -> "tuple[Dict[str, Any], optax.OptState, Dict]":
    """Restore a checkpoint written by `save_train_state`."""
    import orbax.checkpoint as ocp

    checkpointer = ocp.StandardCheckpointer()
    extra_templates = (
        {
            "epoch": 0,
            "best_val": 0.0,
            "lr": 0.0,
            "lr_plateau": {"best": 0.0, "wait": 0, "cooldown_counter": 0},
            "early_stop": {"best": 0.0, "wait": 0},
        },
        # legacy (round-1) single-counter layout
        {"epoch": 0, "best_val": 0.0, "epochs_since_best": 0, "lr": 0.0},
    )
    last_error = None
    for extra_template in extra_templates:
        template = {
            "params": jax.device_get(params_template),
            "opt_state": jax.device_get(opt_state_template),
            "extra": extra_template,
        }
        try:
            restored = checkpointer.restore(pathlib.Path(path).resolve(), template)
            return restored["params"], restored["opt_state"], restored["extra"]
        except Exception as exc:  # structure mismatch -> try the other layout
            last_error = exc
    raise last_error


def fit(
    train_iter: Iterator[Batch],
    val_iter: Iterator[Batch],
    output_dir: pathlib.Path,
    config: TrainConfig = TrainConfig(),
    model_config: nmp.ModelConfig = nmp.DEFAULT_CONFIG,
    init: Optional[Dict] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
    seed: int = 0,
    callbacks: Tuple[Callable, ...] = (),
    log: Callable[[str], None] = print,
    resume: bool = True,
) -> Dict:
    """Keras-fit-like driver with plateau LR reduction, early stopping, and
    best/per-epoch checkpoints (`train.py:126-168` behaviors), plus full
    orbax state checkpointing with automatic resume — which the reference
    lacks entirely (SURVEY §5: "No resume logic").

    Callbacks are called as cb(epoch, params, train_metrics, val_metrics).
    Returns the best parameters.

    Multi-host: with a process-spanning mesh (`parallel/distributed`),
    ``train_iter`` must yield this host's LOCAL batch slice (see
    `data/loader.prepare_datasets(num_shards=..., shard_index=...)`) and
    ``val_iter`` identical host-global batches on every process; scheduler
    decisions then agree everywhere, and only process 0 writes checkpoints
    and logs.
    """
    from basic_pitch_tpu.parallel import distributed as dist
    from basic_pitch_tpu.utils import hostmem

    hostmem.tune_host_allocator()  # warm-heap reuse of batch/pack buffers
    multiproc = mesh is not None and dist.spans_processes(mesh)
    is_main = not multiproc or jax.process_index() == 0
    if multiproc:
        raw_log = log
        log = (lambda msg: raw_log(msg)) if is_main else (lambda msg: None)

    output_dir = pathlib.Path(output_dir)
    if is_main:
        (output_dir / "checkpoints").mkdir(parents=True, exist_ok=True)
    state_dir = output_dir / "train_state"

    params = init if init is not None else nmp.init_params(jax.random.PRNGKey(seed), model_config)
    optimizer = make_optimizer(config)
    opt_state = optimizer.init(params)

    lr_plateau = ReduceLROnPlateau(
        factor=config.lr_reduction_factor,
        patience=config.lr_patience,
        min_delta=config.lr_min_delta,
        cooldown=config.lr_cooldown,
        min_lr=config.min_lr,
    )
    early_stop = EarlyStopping(
        patience=config.early_stop_patience, min_delta=config.early_stop_min_delta
    )
    best_val = np.inf
    lr = config.learning_rate
    start_epoch = 0
    if resume and state_dir.exists():
        params, opt_state, extra = restore_train_state(state_dir, params, opt_state)
        start_epoch = int(extra["epoch"]) + 1
        best_val = float(extra["best_val"])
        lr = float(extra["lr"])
        # scheduler state: exact fields when present, degraded reconstruction
        # from the legacy single counter otherwise
        if "lr_plateau" in extra:
            lr_plateau.load_state(extra["lr_plateau"])
            early_stop.load_state(extra["early_stop"])
        else:
            legacy_wait = int(extra.get("epochs_since_best", 0))
            lr_plateau.best = early_stop.best = best_val
            lr_plateau.wait = legacy_wait % max(config.lr_patience, 1)
            early_stop.wait = legacy_wait
        log(f"resumed from {state_dir} at epoch {start_epoch} (best_val={best_val:.4f})")

    if multiproc:
        params = dist.replicate(mesh, jax.device_get(params))
        opt_state = dist.replicate(mesh, jax.device_get(opt_state))
    elif mesh is not None:
        params = mesh_lib.replicate(mesh, params)
        opt_state = mesh_lib.replicate(mesh, opt_state)

    train_step = build_train_step(optimizer, config, model_config, mesh)
    multi_step = None  # built lazily on the first stacked batch
    eval_step = build_eval_step(config, model_config, mesh)
    # host copy: the live `params` buffers are donated by the first train_step,
    # and on resume the best checkpoint (if any) beats the latest one
    best_ckpt = output_dir / "model.best.npz"
    if start_epoch > 0 and best_ckpt.exists():
        best_params = params_io.load_params(best_ckpt)
    else:
        best_params = jax.device_get(params)

    for epoch in range(start_epoch, config.epochs):
        t0 = time.time()
        train_metrics = []
        steps_done = 0
        while steps_done < config.steps_per_epoch:
            batch = next(train_iter)
            stacked = is_stacked(batch)
            if multiproc:  # train batches arrive as this host's local slice
                if stacked:
                    raise NotImplementedError(
                        "stacked (grouped_batches) training is single-process; "
                        "multi-host runs feed per-step batches"
                    )
                batch = dist.global_batch(mesh, batch)
            elif mesh is not None:
                if needs_upload(batch):
                    batch, _ = upload_batch(batch)
                batch = (
                    mesh_lib.shard_stacked_batch(mesh, batch) if stacked
                    else mesh_lib.shard_batch(mesh, batch)
                )
            elif needs_upload(batch):
                # wire-form batch from `packed_batches` (codec audio and/or
                # trimmed sparse targets): reconstruct in HBM before the step
                batch, _ = upload_batch(batch)
            if stacked:
                # a grouped_batches stream: scan all k steps in ONE dispatch
                # (fixed per-execute latency is ~23 ms on tunneled runtimes,
                # tools/dispatch_overhead.json)
                if multi_step is None:
                    multi_step = build_multi_step(optimizer, config, model_config, mesh)
                params, opt_state, metrics = multi_step(params, opt_state, batch)
                steps_done += int(next(iter(jax.tree.leaves(metrics))).shape[0])
            else:
                params, opt_state, metrics = train_step(params, opt_state, batch)
                steps_done += 1
            train_metrics.append(metrics)
        val_metrics = []
        for _ in range(config.validation_steps):
            batch = next(val_iter)
            if multiproc:  # val batches are host-global and identical
                batch = dist.global_batch(mesh, dist.local_slice(batch))
            elif mesh is not None:
                batch = mesh_lib.shard_batch(mesh, batch)
            elif needs_upload(batch):  # wire-form val batches (packed_batches)
                batch, _ = upload_batch(batch)
            val_metrics.append(eval_step(params, batch))

        train_loss = float(
            np.mean(
                np.concatenate(
                    [np.atleast_1d(m["loss"]) for m in jax.device_get(train_metrics)]
                )
            )
        )
        val_loss = float(np.mean([m["loss"] for m in jax.device_get(val_metrics)]))
        log(
            f"epoch {epoch}: train_loss={train_loss:.4f} val_loss={val_loss:.4f} "
            f"lr={lr:.2e} ({time.time() - t0:.1f}s)"
        )

        if is_main:
            params_io.save_params(
                output_dir / "checkpoints" / f"model.{epoch:02d}.npz", jax.device_get(params)
            )
        if val_loss < best_val:
            best_val = val_loss
            best_params = jax.device_get(params)
            if is_main:
                params_io.save_params(output_dir / "model.best.npz", best_params)

        for cb in callbacks:
            cb(epoch, params, {"loss": train_loss}, {"loss": val_loss})

        lr, reduced = lr_plateau.step(val_loss, lr)
        if reduced:
            # val_loss is identical on every process, so the reduction fires
            # everywhere in the same epoch; the new LR must be a
            # process-spanning replicated array to re-enter the sharded step
            new_lr = (
                dist.replicate(mesh, np.float32(lr)) if multiproc else jnp.asarray(lr)
            )
            opt_state.hyperparams["learning_rate"] = new_lr
            log(f"  reducing learning rate to {lr:.2e}")
        stop = early_stop.step(val_loss)

        if is_main:
            save_train_state(
                state_dir,
                params,
                opt_state,
                {
                    "epoch": epoch,
                    "best_val": float(best_val),
                    "lr": float(lr),
                    "lr_plateau": lr_plateau.state(),
                    "early_stop": early_stop.state(),
                },
            )

        if stop:
            log(f"  early stopping at epoch {epoch}")
            break

    return best_params
