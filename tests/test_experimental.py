"""Alternative conv lowerings (nn/experimental.py): unfold vs scatter vs
gather equivalence, against the standard conv, under SAME and BASIC
(reference experimental.py:8-315, 316-460+; VERDICT r1 missing #4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from dmx_compressor_tpu.nn import modules as dmxnn
from dmx_compressor_tpu.nn.experimental import (
    Conv1dScatter,
    Conv1dUnfold,
    Conv2dGather,
    Conv2dUnfold,
)

RNG = np.random.default_rng(0)

BASIC_CONV = dict(
    input_formats=["BFP[8|8]{64}(SN)"],
    weight_format="BFP[8|8]{64}(SN)",
    output_formats=["FP[1|5|10,15](FN)"],
)


def _conv1d(k=5, stride=2, padding=3, dilation=1, C=6, O=16):
    conv = dmxnn.Conv1d(C, O, k, stride=stride, padding=padding,
                        dilation=dilation, rngs=nnx.Rngs(0))
    conv.weight.value = jnp.asarray(RNG.standard_normal(conv.weight.value.shape) * 0.2,
                                    jnp.float32)
    conv.bias.value = jnp.asarray(RNG.standard_normal(conv.bias.value.shape) * 0.1,
                                  jnp.float32)
    return conv


def _conv2d(k=3, stride=2, padding=1, C=6, O=16):
    conv = dmxnn.Conv2d(C, O, k, stride=stride, padding=padding, rngs=nnx.Rngs(1))
    conv.weight.value = jnp.asarray(RNG.standard_normal(conv.weight.value.shape) * 0.2,
                                    jnp.float32)
    conv.bias.value = jnp.asarray(RNG.standard_normal(conv.bias.value.shape) * 0.1,
                                  jnp.float32)
    return conv


class TestConv1dScatter:
    @pytest.mark.parametrize("stride,dilation", [(1, 1), (2, 1), (1, 2)])
    def test_matches_unfold_and_conv(self, stride, dilation):
        conv = _conv1d(stride=stride, dilation=dilation)
        unfold = Conv1dUnfold.from_conv(conv)
        scatter = Conv1dScatter.from_conv(conv)
        x = jnp.asarray(RNG.standard_normal((2, 6, 23)), jnp.float32)
        ref = np.asarray(conv(x))
        u = np.asarray(unfold(x))
        s = np.asarray(scatter(x))
        np.testing.assert_allclose(u, ref, rtol=1e-5, atol=1e-5)
        # scatter accumulates per-tap partials: same products, different
        # f32 summation order than the single unfold contraction
        np.testing.assert_allclose(s, u, rtol=1e-5, atol=1e-5)

    def test_basic_mode_cast_sites_match_unfold(self):
        conv = _conv1d(k=4, stride=1, padding=0, C=16)  # C*k = 64: one block
        unfold = Conv1dUnfold.from_conv(conv)
        scatter = Conv1dScatter.from_conv(conv)
        unfold.configure(dict(BASIC_CONV))
        scatter.configure(dict(BASIC_CONV))
        x = jnp.asarray(RNG.standard_normal((2, 16, 19)), jnp.float32)
        # identical patch-row element order -> identical BFP blocks; only
        # matmul accumulation order differs
        np.testing.assert_allclose(
            np.asarray(scatter(x)), np.asarray(unfold(x)), rtol=1e-5, atol=1e-5
        )


class TestConv2dGather:
    @pytest.mark.parametrize("stride,padding", [(1, 1), (2, 0), (2, 1)])
    def test_matches_unfold_and_conv(self, stride, padding):
        conv = _conv2d(stride=stride, padding=padding)
        unfold = Conv2dUnfold.from_conv(conv)
        gather = Conv2dGather.from_conv(conv)
        x = jnp.asarray(RNG.standard_normal((2, 6, 13, 11)), jnp.float32)
        ref = np.asarray(conv(x))
        u = np.asarray(unfold(x))
        g = np.asarray(gather(x))
        np.testing.assert_allclose(u, ref, rtol=1e-5, atol=1e-5)
        # identical element ordering and a single contraction: bit-equal
        np.testing.assert_array_equal(g, u)

    def test_basic_mode_bit_equal_to_unfold(self):
        conv = _conv2d()
        unfold = Conv2dUnfold.from_conv(conv)
        gather = Conv2dGather.from_conv(conv)
        unfold.configure(dict(BASIC_CONV))
        gather.configure(dict(BASIC_CONV))
        x = jnp.asarray(RNG.standard_normal((2, 6, 12, 12)), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(gather(x)), np.asarray(unfold(x))
        )
