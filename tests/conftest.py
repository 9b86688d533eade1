"""Test configuration: force an 8-device virtual CPU platform so sharding /
collective tests run without TPU hardware.  Must run before jax is imported
anywhere."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Persistent compilation cache: the build machine has a single CPU core, so
# re-compiles dominate test time without it.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment's sitecustomize force-registers a remote TPU backend and
# pins jax_platforms to it, overriding the env var — undo that so tests run
# on the local 8-device virtual CPU platform.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
