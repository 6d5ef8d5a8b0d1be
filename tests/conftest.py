"""Test configuration: force CPU with 8 virtual devices so mesh/sharding
tests run without TPU hardware (standard JAX fake-multi-device trick)."""

import os

# NOTE: must be a hard override — the environment ships a sitecustomize that
# exports JAX_PLATFORMS=axon (TPU tunnel) before conftest runs.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
