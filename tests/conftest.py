"""Test environment: CPU backend, 8 virtual devices, float64 parity mode.

jax is pre-imported at interpreter startup by the site hook, so env vars are
not reliable here — we force the platform via jax.config. XLA_FLAGS still
works because the backend client is not created until first use.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
