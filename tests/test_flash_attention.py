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


class TestFlashPrefillRouting:
    """Roadmap §2c: flash prefill routing for every decoder family."""

    def _check(self, model, x, atol=1e-5):
        import jax.numpy as jnp

        full = np.asarray(model(x))
        # cached prefill: flash route fills the cache; decode must continue
        # bit-consistently from it
        caches = model.init_cache(x.shape[0], x.shape[1] + 1)
        pre = np.asarray(model(x[:, :-1], caches=caches, position_offset=0))
        np.testing.assert_allclose(pre, full[:, :-1], atol=atol)
        step = np.asarray(
            model(x[:, -1:], caches=caches, position_offset=x.shape[1] - 1)
        )
        np.testing.assert_allclose(step[:, 0], full[:, -1], atol=2e-3)

    def test_llama_gqa(self):
        from flax import nnx

        from dmx_compressor_tpu.models.llama import LlamaConfig, LlamaForCausalLM

        cfg = LlamaConfig.tiny()
        model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
        x = np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 12)).astype("int32")
        self._check(model, x)

    def test_gpt2(self):
        from flax import nnx

        from dmx_compressor_tpu.models.gpt2 import GPT2Config, GPT2LMHeadModel

        cfg = GPT2Config.tiny()
        model = GPT2LMHeadModel(cfg, rngs=nnx.Rngs(0))
        x = np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 12)).astype("int32")
        self._check(model, x)

    def test_basic_mode_does_not_flash(self):
        """Non-transparent SDPA (BASIC casts) must keep the masked fake-quant
        path: BASIC logits unchanged by the routing addition."""
        from flax import nnx

        from dmx_compressor_tpu.modeling.model import DmxModel
        from dmx_compressor_tpu.models.llama import LlamaConfig, LlamaForCausalLM
        from dmx_compressor_tpu.ops.flash_attention import sdpa_transparent

        cfg = LlamaConfig.tiny()
        model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
        dm = DmxModel.from_raw(model)
        dm.to_basic_mode()
        assert not sdpa_transparent(model.model.layers[0].self_attn.sdpa)
        x = np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 16)).astype("int32")
        q = np.asarray(dm(x))
        assert np.isfinite(q).all()

    def test_chunked_prefill_matches_full(self):
        """offset>0 chunked prefill (cache prefix + fresh suffix via the
        causal-diagonal flash path) continues exactly from an offset-0
        prefill."""
        from flax import nnx

        from dmx_compressor_tpu.models.llama import LlamaConfig, LlamaForCausalLM

        cfg = LlamaConfig.tiny()
        model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
        x = np.random.RandomState(1).randint(
            0, cfg.vocab_size, (2, 12)
        ).astype("int32")
        full = np.asarray(model(x))
        caches = model.init_cache(2, 12)
        model(x[:, :4], caches=caches, position_offset=0)
        chunk = np.asarray(model(x[:, 4:8], caches=caches, position_offset=4))
        np.testing.assert_allclose(chunk, full[:, 4:8], atol=1e-5)
        step = np.asarray(model(x[:, 8:12], caches=caches, position_offset=8))
        np.testing.assert_allclose(step, full[:, 8:12], atol=1e-5)
