"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 devices (the driver separately dry-runs the multichip
path via ``__graft_entry__.dryrun_multichip``).

Note: ``jax`` is pre-imported at interpreter startup in this image, so the
platform must be switched via ``jax.config`` (env vars are too late), but
XLA_FLAGS is still read lazily at first backend initialization.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: several heavy tests (GNN training,
# 16q statevector, frame-engine parity) are compile-dominated on CPU, and
# their programs are identical run-to-run. A warm cache cuts repeat suite
# runs substantially; a cold run only pays the (small) write overhead.
jax.config.update("jax_compilation_cache_dir", "/tmp/mlqem_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
