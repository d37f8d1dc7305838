"""Multi-host (multi-process) runtime: `jax.distributed` plumbing.

SURVEY §2.6's stated plan for the TPU build is "`jax.distributed` +
compiler-emitted collectives over ICI within a slice and DCN across
slices". This module is that plumbing: process-group initialization, a
mesh spanning every process's devices, and the host-local <-> global array
glue the training loop and loader use. The compute code never changes —
`train/loop.build_train_step(mesh=...)` works identically on a one-process
mesh and a process-spanning one, because XLA derives the (now
cross-process) gradient `psum` from the same sharding annotations.

Launch pattern (one process per host; TPU pods set most of this up via the
cluster environment, so bare `initialize()` usually suffices there):

    from basic_pitch_tpu.parallel import distributed as dist
    dist.initialize("10.0.0.1:8476", num_processes=4, process_id=k)
    mesh = dist.global_mesh()                 # spans all 4 processes
    ...
    local = next(loader)                      # this host's batch slice
    batch = dist.global_batch(mesh, local)    # process-spanning array
    params, opt_state, metrics = train_step(params, opt_state, batch)

CPU-backend development/testing: pass ``cpu_devices_per_process`` to get N
virtual devices per process with gloo cross-process collectives — this is
how ``tests/test_multihost.py`` and the multichip dryrun prove the
process-spanning path without hardware (`python -m
basic_pitch_tpu.parallel.selfcheck`).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from basic_pitch_tpu.parallel import mesh as mesh_lib


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    cpu_devices_per_process: Optional[int] = None,
) -> None:
    """Join (or start, for process 0) the distributed process group.

    Thin, idempotent wrapper over `jax.distributed.initialize`. Must run
    BEFORE any other jax call initializes the backend. With all arguments
    omitted, jax auto-detects managed cluster environments (TPU pods,
    SLURM, ...). ``num_processes == 1`` (or all-None outside a cluster) is
    a no-op so single-host code paths need no special-casing.

    Args:
        cpu_devices_per_process: pin jax to the CPU platform with this many
            local devices and gloo cross-process collectives — the
            hardware-free test configuration.
    """
    import jax

    if cpu_devices_per_process is not None:
        # the hosted TPU plugin ignores JAX_PLATFORMS; pin via config
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", int(cpu_devices_per_process))
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if num_processes is not None and int(num_processes) <= 1:
        return
    if coordinator_address is None and num_processes is None and process_id is None:
        # cluster auto-detection; outside a managed environment this raises,
        # which is the right error for a bare single-host run
        jax.distributed.initialize()
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def shutdown() -> None:
    import jax

    if jax.process_count() > 1:
        jax.distributed.shutdown()


def global_mesh(axis: str = mesh_lib.DATA_AXIS) -> "jax.sharding.Mesh":
    """1-D mesh over ALL devices of ALL processes (after `initialize`)."""
    import jax

    return mesh_lib.make_mesh(jax.devices(), axis=axis)


def spans_processes(mesh: "jax.sharding.Mesh") -> bool:
    """Does this mesh include devices owned by other processes?"""
    import jax

    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def local_batch_size(global_batch_size: int) -> int:
    """This process's share of a global batch (must divide evenly)."""
    import jax

    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} does not divide across {n} processes"
        )
    return global_batch_size // n


def local_slice(tree: object, global_batch_size: Optional[int] = None) -> object:
    """This process's rows of a host-global batch pytree (for tests/tools
    that synthesize the full batch everywhere; real loaders produce local
    slices directly via their shard arguments)."""
    import jax

    def slc(x):
        x = np.asarray(x)
        b = x.shape[0] if global_batch_size is None else global_batch_size
        per = local_batch_size(b)
        start = jax.process_index() * per
        return x[start : start + per]

    return jax.tree.map(slc, tree)


def global_batch(mesh: "jax.sharding.Mesh", local_tree: object) -> object:
    """Assemble a process-spanning, batch-sharded global array pytree from
    this process's LOCAL batch slice (global batch = concatenation of every
    process's slice in process order). Single-process meshes accept the
    full batch and behave like `mesh_lib.shard_batch`."""
    import jax

    sharding = mesh_lib.batch_sharded(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_tree,
    )


def replicate(mesh: "jax.sharding.Mesh", tree: object) -> object:
    """Replicate host values (identical on every process) across a
    process-spanning mesh."""
    import jax

    sharding = mesh_lib.replicated(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        tree,
    )
