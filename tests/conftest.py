"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding (DP mesh, collectives, SyncBN-via-jit) is validated on
host CPU devices so the suite runs anywhere; the real TPU path is exercised by
`bench.py` and `__graft_entry__.py`.
"""

import os

os.environ["JAX_PLATFORMS"] = os.environ.get("TRIS_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
