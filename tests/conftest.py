"""Test configuration: run all tests on a virtual 8-device CPU mesh.

SURVEY.md §4: CPU-device jax tests emulate multi-device via
xla_force_host_platform_device_count. Note the axon TPU plugin (when present)
overrides JAX_PLATFORMS through jax.config at interpreter startup, so forcing
CPU must go through jax.config.update as well, before any backend is used.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
