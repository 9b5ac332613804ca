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
    _flags += " --xla_force_host_platform_device_count=8"
# NB: do NOT add --xla_backend_optimization_level=0 here — it makes training
# numerically unstable (NaNs within 2 epochs on the smoke train).
os.environ["XLA_FLAGS"] = _flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite compiles many large graphs; on the
# 1-vCPU CI host this cuts repeat runs from ~10min to seconds.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
