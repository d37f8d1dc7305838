"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic
(`basic_pitch_tpu.parallel`) is exercised without TPU hardware. The platform
must be pinned before JAX initializes its backends, hence the top-level
environment mutation here. Tests marked ``tpu`` only run when real hardware
is requested via RUN_TPU_TESTS=1.
"""

import os

import pytest

os.environ.setdefault("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

# the hosted TPU plugin ignores JAX_PLATFORMS; pin explicitly
if os.environ.get("RUN_TPU_TESTS", "0") != "1":
    jax.config.update("jax_platforms", "cpu")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RUN_TPU_TESTS", "0") == "1":
        return
    skip_tpu = pytest.mark.skip(reason="TPU tests disabled (set RUN_TPU_TESTS=1)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)


@pytest.fixture(scope="session")
def nmp_params():
    from basic_pitch_tpu.models import params

    return params.load_params()
