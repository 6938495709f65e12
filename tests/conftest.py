"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding tests use jax.sharding.Mesh over these virtual devices;
the same code paths run on real TPU slices unchanged.
"""

import os

# DMX_TEST_TPU=1 lets TPU-marked tests run on the real chip (one process at a
# time — the tunnel is a single exclusive lease); default is CPU-only.
_USE_TPU = os.environ.get("DMX_TEST_TPU") == "1"
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The deployment forces the 'axon' TPU platform into jax_platforms regardless
# of the env var; tests must NOT touch the (single, exclusively-leased) TPU
# tunnel, so pin the config explicitly to CPU before any backend init.
if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: reruns of the suite skip recompilation
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@pytest.fixture
def mesh8():
    import numpy as np
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    with Mesh(devs, ("dp", "tp")) as m:
        yield m
