"""Flash attention: reference parity (kernel runs off-TPU via the jnp path;
the pallas path is exercised on TPU by bench/integration runs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dmx_compressor_tpu.ops.flash_attention import (
    flash_attention,
    flash_attention_ref,
)

RNG = np.random.default_rng(0)


def randf(*shape):
    return jnp.asarray(RNG.standard_normal(shape).astype(np.float32))


def _sdpa_naive(q, k, v, bias=None, scale=None, causal=False):
    D = q.shape[-1]
    scale = D**-0.5 if scale is None else scale
    logits = np.einsum("...ld,...sd->...ls", np.asarray(q), np.asarray(k)) * scale
    if bias is not None:
        logits = logits + np.asarray(bias)
    if causal:
        L, S = logits.shape[-2:]
        mask = np.tril(np.ones((L, S), bool), k=S - L)
        logits = np.where(mask, logits, -1e30)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    return np.einsum("...ls,...sd->...ld", w, np.asarray(v))


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("L,S", [(16, 16), (8, 24)])
def test_flash_ref_matches_naive(causal, L, S):
    q, k, v = randf(2, 3, L, 64), randf(2, 3, S, 64), randf(2, 3, S, 64)
    got = np.asarray(flash_attention_ref(q, k, v, causal=causal))
    want = _sdpa_naive(q, k, v, causal=causal)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_flash_with_bias():
    q, k, v = randf(1, 2, 16, 32), randf(1, 2, 16, 32), randf(1, 2, 16, 32)
    bias = jnp.where(jnp.asarray(RNG.random((16, 16)) > 0.5), 0.0, -1e30).astype(
        jnp.float32
    )
    got = np.asarray(flash_attention(q, k, v, bias=bias, use_pallas=False))
    want = _sdpa_naive(q, k, v, bias=np.asarray(bias))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu", reason="pallas kernel needs TPU"
)
@pytest.mark.parametrize("causal", [False, True])
def test_flash_pallas_matches_ref_on_tpu(causal):
    q, k, v = randf(2, 4, 256, 64), randf(2, 4, 256, 64), randf(2, 4, 256, 64)
    got = np.asarray(flash_attention(q, k, v, causal=causal, use_pallas=True))
    want = np.asarray(flash_attention_ref(q, k, v, causal=causal))
    # kernel matmuls run on the MXU's bf16 multiplier (standard attention
    # practice); the reference is fp32-exact
    np.testing.assert_allclose(got, want, atol=1e-2, rtol=2e-2)
