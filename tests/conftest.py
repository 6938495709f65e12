"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding tests use jax.sharding.Mesh over these virtual devices;
the same code paths run on real TPU slices unchanged.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def mesh8():
    import numpy as np
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    with Mesh(devs, ("dp", "tp")) as m:
        yield m
