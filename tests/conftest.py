"""Test configuration: run on CPU with 8 fake devices (the standard JAX
way to exercise mesh/sharding code without a pod) and float64 enabled for
tolerance-based oracle comparisons."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the session env presets axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# sitecustomize (axon) imports jax at interpreter startup, so the env vars
# above can be too late — force the platform through the config API too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: Matern/derivative graphs are expensive to build
# on the 2-vCPU test box; cache them across pytest runs
jax.config.update("jax_compilation_cache_dir", "/tmp/cfjax_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
