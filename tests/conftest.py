"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a virtual 8-device CPU mesh (no TPU pod is
needed for correctness); bench.py / the CLI run on real TPU hardware instead.
This must run before jax is imported anywhere in the test process.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(__file__))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def proof_bytes() -> bytes:
    with open("/root/reference/proof.bin", "rb") as f:
        return f.read()
