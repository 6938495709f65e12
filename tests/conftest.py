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

# Persistent compilation cache: reruns of the suite skip recompilation.
# The dir is SPLIT by platform context: a DMX_TEST_TPU=1 process (axon
# plugin loaded) compiles its host-CPU executables with different target
# options (+prefer-no-scatter/-gather), and a CPU-only process that later
# loads such an entry gets a machine-features-mismatched AOT executable —
# the root cause of the order-dependent r4
# test_softmax_approx_replaces_value_keeps_grad failure (the old shared
# /tmp/jax_test_cache is abandoned as contaminated).
jax.config.update(
    "jax_compilation_cache_dir",
    "/tmp/jax_test_cache_tpu" if _USE_TPU else "/tmp/jax_test_cache_cpu",
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@pytest.fixture(autouse=True)
def _restore_inference_mode():
    """bench.build / examples call ops.compress.set_inference_mode(True) —
    a GLOBAL DmxModule class flag.  A test that exercises them must not
    leak it into later tests (the true cause of the r4 order-dependent
    test_softmax_approx_replaces_value_keeps_grad failure: under
    inference_mode, approximated ops skip the approximation_error
    recording by design)."""
    from dmx_compressor_tpu.nn.core import DmxModule

    prev = DmxModule.inference_mode
    yield
    DmxModule.inference_mode = prev


@pytest.fixture
def mesh8():
    import numpy as np
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    with Mesh(devs, ("dp", "tp")) as m:
        yield m
