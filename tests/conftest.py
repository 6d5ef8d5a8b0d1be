"""Test configuration: force CPU with 8 virtual devices so mesh/sharding
tests run without TPU hardware (standard JAX fake-multi-device trick).

NOTE: the environment ships a sitecustomize that imports jax and registers
an 'axon' TPU backend in EVERY python process before conftest runs, and it
re-exports JAX_PLATFORMS=axon — so plain env-var overrides are too late.
Backends are still uninitialised at that point, so
`jax.config.update("jax_platforms", "cpu")` works; XLA_FLAGS is read at
first backend init, so appending the device-count flag here still works too.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

# ECG_TEST_TPU=1 keeps the real backend so the TPU-gated on-hardware kernel
# tests (tests/test_tpu_kernels.py) can run: e.g.
#   ECG_TEST_TPU=1 python -m pytest tests/test_tpu_kernels.py -q
# Everything else forces CPU (8 virtual devices for the mesh tests).
if os.environ.get("ECG_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
