"""Test environment: CPU backend, 8 virtual devices, float64 parity mode.

jax is pre-imported at interpreter startup by the site hook, so env vars are
not reliable here — we force the platform via jax.config. XLA_FLAGS still
works because the backend client is not created until first use.

TPU-compiled coverage: ``GFS_TEST_TPU=1 pytest tests/ -m tpu`` on a machine
with the chip skips the CPU forcing and runs the ``@pytest.mark.tpu`` tests
(tests/test_tpu_compiled.py) against the real compiled Pallas/distributed
paths. Without the env var the suite stays CPU/f64 and tpu-marked tests
auto-skip.
"""

import os

TPU_MODE = os.environ.get("GFS_TEST_TPU") == "1"

if not TPU_MODE:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax

if not TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: compiled-on-TPU test (GFS_TEST_TPU=1 + real chip)"
    )


def pytest_collection_modifyitems(config, items):
    if TPU_MODE:
        return
    skip = pytest.mark.skip(reason="TPU-compiled test (set GFS_TEST_TPU=1 on a chip)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
