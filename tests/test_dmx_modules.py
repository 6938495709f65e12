"""Dmx module equivalence at SAME format and quantized behavior
(reference tests/test_linear.py, test_dmx_modules.py strategies)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

import dmx_compressor_tpu as dmx
from dmx_compressor_tpu import nn as dmxnn

RNG = np.random.default_rng(0)


def randf(*shape):
    return jnp.asarray(RNG.standard_normal(shape).astype(np.float32))


@pytest.mark.parametrize("bias", [True, False])
@pytest.mark.parametrize("bs,cin,cout", [(1, 16, 8), (4, 64, 32)])
def test_linear_same_matches_raw(bias, bs, cin, cout):
    raw = nnx.Linear(cin, cout, use_bias=bias, rngs=nnx.Rngs(0))
    mod = dmxnn.Linear.from_raw(raw)
    x = randf(bs, cin)
    got = np.asarray(mod(x))
    want = np.asarray(raw(x))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_linear_same_backward():
    raw = nnx.Linear(16, 8, rngs=nnx.Rngs(0))
    mod = dmxnn.Linear.from_raw(raw)
    x = randf(4, 16)
    g1 = jax.grad(lambda t: jnp.sum(mod(t) ** 2))(x)
    g2 = jax.grad(lambda t: jnp.sum(raw(t) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_linear_bfp_quantizes():
    mod = dmxnn.Linear(64, 32)
    mod.configure(
        dict(
            input_formats=[dmx.format.BFP16_64],
            weight_format=dmx.format.BFP16_64,
            bias_format=dmx.format.BFP32_1,
            output_formats=[dmx.format.FLOAT16],
        )
    )
    x = randf(4, 64)
    y = np.asarray(mod(x))
    # output must land on the FLOAT16 grid
    assert np.allclose(y, np.asarray(jnp.asarray(y, jnp.float16), np.float32), atol=1e-3)
    # quantized result close to exact but not identical
    y_exact = np.asarray(x @ mod.weight.value.T + mod.bias.value)
    assert 0 < np.abs(y - y_exact).max() < 0.3


def test_linear_accum_cast_path():
    mod = dmxnn.Linear(16, 8)
    mod.configure(dict(accum_format=dmx.format.FLOAT16))
    x = randf(2, 16)
    y = np.asarray(mod(x))
    assert y.shape == (2, 8)


def test_conv2d_same_matches_raw():
    raw = nnx.Conv(3, 8, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)), rngs=nnx.Rngs(0))
    mod = dmxnn.Conv2d.from_raw(raw)
    # from_raw preserves nnx.Conv's NHWC calling convention
    x = randf(2, 8, 8, 3)
    got = np.asarray(mod(x))
    want = np.asarray(raw(x))
    np.testing.assert_allclose(got, want, atol=1e-4)

    # direct construction is NCHW (torch/reference convention)
    mod2 = dmxnn.Conv2d(3, 8, (3, 3), padding=1)
    y = mod2(randf(2, 3, 8, 8))
    assert y.shape == (2, 8, 8, 8)


def test_embedding_same():
    raw = nnx.Embed(100, 16, rngs=nnx.Rngs(0))
    mod = dmxnn.Embedding.from_raw(raw)
    ids = jnp.asarray([[1, 5, 99]])
    np.testing.assert_allclose(
        np.asarray(mod(ids)), np.asarray(raw(ids)), atol=1e-6
    )


def test_layernorm_same():
    raw = nnx.LayerNorm(32, rngs=nnx.Rngs(0))
    mod = dmxnn.LayerNorm.from_raw(raw)
    x = randf(4, 32)
    np.testing.assert_allclose(np.asarray(mod(x)), np.asarray(raw(x)), atol=1e-5)


def test_rmsnorm_same():
    raw = nnx.RMSNorm(32, rngs=nnx.Rngs(0))
    mod = dmxnn.RMSNorm.from_raw(raw)
    x = randf(4, 32)
    np.testing.assert_allclose(np.asarray(mod(x)), np.asarray(raw(x)), atol=1e-5)


def test_softmax_approx_replaces_value_keeps_grad():
    mod = dmxnn.Softmax(dim=-1)
    mod.configure(dict(approximation_function=dmx.default_approx.SOFTMAX))
    x = randf(4, 16)
    y = np.asarray(mod(x))
    y_exact = np.asarray(jax.nn.softmax(x, axis=-1))
    assert not np.allclose(y, y_exact, atol=1e-7)  # approximation applied
    assert np.allclose(y, y_exact, atol=1e-2)  # but accurate
    assert mod.approximation_error is not None
    # gradient flows through the exact op
    g = jax.grad(lambda t: jnp.sum(mod(t)[:, 0]))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_resadd_mul_matmul():
    a, b = randf(4, 8), randf(4, 8)
    np.testing.assert_allclose(
        np.asarray(dmxnn.ResAdd()(a, b)), np.asarray(a + b), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(dmxnn.Mul()(a, b)), np.asarray(a * b), atol=1e-7
    )
    m1, m2 = randf(4, 8), randf(8, 4)
    np.testing.assert_allclose(
        np.asarray(dmxnn.ActActMatMul()(m1, m2)), np.asarray(m1 @ m2), atol=1e-5
    )


def test_sdpa_matches_exact():
    """Compound SDPA equals exact attention at SAME format for all kwarg
    combos (reference tests/test_sdpa.py:16-40)."""
    from dmx_compressor_tpu import rawnn

    sdpa = dmxnn.ScaledDotProductAttention()
    raw = rawnn.ScaledDotProductAttention()
    q, k, v = randf(2, 3, 8, 16), randf(2, 3, 8, 16), randf(2, 3, 8, 16)
    # NOTE: the compound scales (logits + mask) while exact SDPA scales only
    # the logits (reference torch_modules.py:145-160), so float masks must be
    # 0/-10000-style for the two to agree.
    hard_mask = jnp.where(jnp.asarray(RNG.random((8, 8)) > 0.3), 0.0, -10000.0).astype(jnp.float32)
    for kwargs in [
        {},
        {"is_causal": True},
        {"attn_mask": hard_mask},
        {"scale": 0.3},
    ]:
        got = np.asarray(sdpa(q, k, v, **kwargs))
        want = np.asarray(raw(q, k, v, **kwargs))
        np.testing.assert_allclose(got, want, atol=2e-3)


def test_rope_module():
    rope = dmxnn.RotaryEmbedding(dim=16)
    apply_rope = dmxnn.ApplyRotaryPosEmb()
    x = randf(1, 4, 16)
    pos = jnp.arange(4)[None, :]
    cos, sin = rope(x, pos)
    q, k = randf(1, 2, 4, 16), randf(1, 2, 4, 16)
    qe, ke = apply_rope(q, k, cos, sin)
    assert qe.shape == q.shape and ke.shape == k.shape
    # position 0 is identity rotation
    np.testing.assert_allclose(np.asarray(qe[0, :, 0]), np.asarray(q[0, :, 0]), atol=1e-5)


def test_weight_sparsity_in_linear():
    mod = dmxnn.Linear(16, 8)
    mod.configure(dict(weight_sparseness=dmx.sparseness.BTK8_4_LD))
    w_eff = np.asarray(mod.effective_weight)
    nz_per_block = (w_eff.reshape(8, 2, 8) != 0).sum(-1)
    assert (nz_per_block <= 4).all()


def test_fold_weight_and_bias():
    """Folding casts into parameters preserves behavior
    (reference tests/test_fold_weights_and_biases.py)."""
    mod = dmxnn.Linear(64, 8)
    mod.configure(
        dict(weight_format=dmx.format.BFP16_64, bias_format=dmx.format.BFP32_1)
    )
    x = randf(2, 64)
    before = np.asarray(mod(x))
    mod.fold_weight_and_bias()
    from dmx_compressor_tpu.numerics.format import Same

    assert isinstance(mod.weight_format, Same)
    after = np.asarray(mod(x))
    np.testing.assert_allclose(before, after, atol=1e-6)


def test_flop_counting():
    mod = dmxnn.Linear(16, 8)
    with mod.counting_flops():
        mod(randf(4, 16))
    assert mod.flops == 4 * 16 * 8
    assert mod.bops == 4 * 16 * 8 * 32 * 32  # SAME format = fp32 bits
