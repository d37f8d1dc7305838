"""Multi-host self-check: one process of an N-process sharded train step.

Runs the FULL training step (dense batch and device-rasterized sparse
batch) on a mesh spanning every process's devices, with the gradient
`psum` crossing process boundaries (gloo collectives on the CPU backend).
Prints one JSON line with the losses so a driver — `tests/test_multihost.py`
or `__graft_entry__.dryrun_multichip(n, n_processes=...)` — can assert:

* every process reports the SAME loss (the cross-process all-reduce ran
  and agreed), and
* the loss equals a single-process run over the same global batch on the
  same number of devices (the process boundary changed nothing numeric).

Launch (one per process):

    python -m basic_pitch_tpu.parallel.selfcheck \
        --process-id k --num-processes n --port 8476 \
        --devices-per-process 4 --global-batch 8
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def synthetic_global_batch(global_batch: int, seed: int = 0) -> dict:
    """Deterministic dense training batch, identical on every process."""
    from basic_pitch_tpu import constants

    rng = np.random.RandomState(seed)
    frames = constants.ANNOT_N_FRAMES
    return {
        "audio": (rng.randn(global_batch, constants.AUDIO_N_SAMPLES) * 0.1).astype(
            np.float32
        ),
        "targets": {
            "contour": rng.rand(global_batch, frames, 264).astype(np.float32),
            "note": rng.rand(global_batch, frames, 88).astype(np.float32),
            "onset": (rng.rand(global_batch, frames, 88) > 0.95).astype(np.float32),
        },
        "weights": {
            k: np.ones(global_batch, np.float32) for k in ("contour", "note", "onset")
        },
    }


def synthetic_sparse_items(global_batch: int, seed: int = 1) -> list:
    """Loader-shaped items for the device-rasterized (sparse-COO) transport."""
    from basic_pitch_tpu import constants

    rng = np.random.RandomState(seed)
    items = []
    for _ in range(global_batch):
        pcm = rng.randint(-32768, 32768, constants.AUDIO_N_SAMPLES)
        targets = {}
        for head, bins in (("onset", 88), ("note", 88), ("contour", 264)):
            m = np.zeros((constants.ANNOT_N_FRAMES, bins), np.float32)
            t = rng.randint(0, constants.ANNOT_N_FRAMES, 50)
            f = rng.randint(0, bins, 50)
            m[t, f] = rng.rand(50).astype(np.float32)
            targets[head] = m
        items.append(
            {
                "audio": (pcm.astype(np.float32) / 32768.0).astype(np.float32),
                "targets": targets,
                "weights": {k: 1.0 for k in ("onset", "note", "contour")},
            }
        )
    return items


def run(
    process_id: int,
    num_processes: int,
    port: int,
    devices_per_process: int,
    global_batch: int,
) -> dict:
    from basic_pitch_tpu.parallel import distributed as dist

    dist.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
        cpu_devices_per_process=devices_per_process,
    )
    import jax

    from basic_pitch_tpu.data import loader as data_loader
    from basic_pitch_tpu.models import nmp
    from basic_pitch_tpu.parallel import mesh as mesh_lib
    from basic_pitch_tpu.train import loop as train_loop

    assert jax.process_count() == num_processes
    mesh = dist.global_mesh()
    n_global = mesh.devices.size
    assert n_global == num_processes * devices_per_process, (
        f"mesh has {n_global} devices, expected {num_processes}x{devices_per_process}"
    )

    config = train_loop.TrainConfig()
    optimizer = train_loop.make_optimizer(config)
    params_host = nmp.init_params(jax.random.PRNGKey(0))  # same on every process
    params = dist.replicate(mesh, params_host)
    rep = mesh_lib.replicated(mesh)
    opt_state = jax.jit(optimizer.init, out_shardings=rep)(params)
    step = train_loop.build_train_step(optimizer, config, mesh=mesh)

    # dense batch: every process synthesizes the same global batch and
    # contributes its own slice — the shard layout across devices is
    # IDENTICAL to a single-process run on n_global devices
    dense = synthetic_global_batch(global_batch)
    batch = dist.global_batch(mesh, dist.local_slice(dense))
    params, opt_state, metrics = step(params, opt_state, batch)
    loss_dense = float(np.asarray(jax.device_get(metrics["loss"])))

    # device-rasterized sparse transport over the same mesh
    items = synthetic_sparse_items(global_batch)
    per = dist.local_batch_size(global_batch)
    local_items = items[process_id * per : (process_id + 1) * per]
    sparse_local = data_loader._collate_device(local_items)
    batch = dist.global_batch(mesh, sparse_local)
    params, opt_state, metrics = step(params, opt_state, batch)
    loss_sparse = float(np.asarray(jax.device_get(metrics["loss"])))

    result = {
        "process_id": process_id,
        "process_count": int(jax.process_count()),
        "global_devices": int(n_global),
        "loss_dense": loss_dense,
        "loss_sparse": loss_sparse,
        "platform": jax.devices()[0].platform,
    }
    dist.shutdown()
    return result


def main(argv: "list[str] | None" = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--devices-per-process", type=int, default=4)
    ap.add_argument("--global-batch", type=int, default=8)
    ns = ap.parse_args(argv)
    result = run(
        ns.process_id, ns.num_processes, ns.port, ns.devices_per_process, ns.global_batch
    )
    print("SELFCHECK " + json.dumps(result), flush=True)


if __name__ == "__main__":
    sys.exit(main())
