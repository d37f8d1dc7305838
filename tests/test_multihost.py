"""Multi-host training path (SURVEY §2.6: `jax.distributed` + process-
spanning collectives).

Spawns REAL separate processes (CPU backend, gloo collectives), each
owning 4 virtual devices, and runs the full sharded train step — dense and
device-rasterized sparse batches — over the 2x4-device mesh. Asserts the
cross-process gradient psum agrees between processes AND matches a
single-process run on the same 8 devices with the same global batch.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _clean_env():
    env = dict(os.environ)
    # the workers pin their own platform/device-count via jax config; the
    # conftest's XLA_FLAGS virtual-device override must not fight it
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _spawn(process_id, num_processes, port, devices, global_batch):
    return subprocess.Popen(
        [
            sys.executable, "-m", "basic_pitch_tpu.parallel.selfcheck",
            "--process-id", str(process_id),
            "--num-processes", str(num_processes),
            "--port", str(port),
            "--devices-per-process", str(devices),
            "--global-batch", str(global_batch),
        ],
        cwd=REPO,
        env=_clean_env(),
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )


def _collect(proc, timeout=600):
    out, _ = proc.communicate(timeout=timeout)
    assert proc.returncode == 0, f"worker failed:\n{out[-4000:]}"
    for line in out.splitlines():
        if line.startswith("SELFCHECK "):
            return json.loads(line[len("SELFCHECK "):])
    raise AssertionError(f"no SELFCHECK line in worker output:\n{out[-4000:]}")


@pytest.mark.slow
def test_two_process_sharded_train_step_matches_single_process():
    global_batch = 8
    # single-process reference: same 8 devices, same global batch
    ref = _collect(_spawn(0, 1, _free_port(), 8, global_batch))
    assert ref["process_count"] == 1 and ref["global_devices"] == 8
    assert ref["platform"] == "cpu"

    port = _free_port()
    workers = [_spawn(i, 2, port, 4, global_batch) for i in range(2)]
    results = [_collect(w) for w in workers]

    for r in results:
        assert r["process_count"] == 2
        assert r["global_devices"] == 8  # the mesh spans both processes
    # the cross-process psum agreed: identical loss on both processes
    assert results[0]["loss_dense"] == results[1]["loss_dense"]
    assert results[0]["loss_sparse"] == results[1]["loss_sparse"]
    # and the process boundary changed nothing numeric vs single-process
    assert abs(results[0]["loss_dense"] - ref["loss_dense"]) < 1e-5
    assert abs(results[0]["loss_sparse"] - ref["loss_sparse"]) < 1e-5
    for r in results + [ref]:
        import math

        assert math.isfinite(r["loss_dense"]) and math.isfinite(r["loss_sparse"])
