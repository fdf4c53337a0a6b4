"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding (DP mesh, collectives, SyncBN-via-jit) is validated on
host CPU devices so the suite runs anywhere; the real TPU path is exercised by
`bench.py` and `__graft_entry__.py`.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment may pin JAX_PLATFORMS to a TPU plugin (e.g. axon); the env
# var alone does not override it, so force the CPU backend via jax.config.
jax.config.update("jax_platforms", os.environ.get("TRIS_TEST_PLATFORM", "cpu"))
# Parity tests compare against fp32 torch; keep fp32 matmuls exact.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    assert jax.device_count() >= 8 or os.environ.get("TRIS_TEST_PLATFORM"), (
        "expected 8 virtual CPU devices for sharding tests"
    )


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
