"""Test configuration: force CPU backend with 8 virtual devices.

Tests must run without TPU hardware. Multi-device sharding behavior is
exercised on a virtual 8-device CPU mesh (the same mechanism the driver
uses for `dryrun_multichip`).

This file must set env vars BEFORE jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize registers the axon TPU backend at
# interpreter start and programmatically sets jax_platforms="axon,cpu",
# which overrides the env var — force it back to cpu before any backend
# is initialized.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture()
def rng(request):
    # Function-scoped and seeded from the test name: data is reproducible
    # for every test regardless of which subset of the suite runs (a
    # session-scoped stream made tests pass/fail depending on run order).
    import zlib

    seed = zlib.crc32(request.node.name.encode())  # stable across runs
    return np.random.default_rng(seed)
