"""Test configuration: force an 8-virtual-device CPU platform.

This is the standard JAX trick for exercising pjit/Mesh/GSPMD code without
TPU hardware (see SURVEY.md §4). XLA_FLAGS must be set before jax imports;
the platform override must go through jax.config (the environment here pins
JAX_PLATFORMS at interpreter startup). Real-TPU runs (bench.py) never import
this file.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
