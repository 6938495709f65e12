"""cached_attend (ops/flash_decode.py): the shared cached-attention tail
used by the Llama/Gemma/Qwen3/GPT-2/Mistral/Whisper families.

Covers the two properties VERDICT r1 demanded of every family (previously
only OPT had them):
- routing: transparent T==1 decode rides the flash-decode kernels (fp and
  int8) with unchanged numerics vs the einsum reference paths;
- the SDPA numerics contract: BASIC mode + int8 KV storage must apply the
  compound SDPA's cast/surrogate pipeline to DEQUANTIZED values, never the
  exact-softmax quantized_sdpa fast path (reference cast-point contract
  torch_modules.py:129-168).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from dmx_compressor_tpu.ops import flash_decode as fd

RNG = np.random.default_rng(0)


def _decode_logits(model, ids, n_steps, caches):
    logits = model(ids, caches=caches, position_offset=0)
    outs = [logits[:, -1]]
    tok = jnp.argmax(logits[:, -1], axis=-1)[:, None].astype(jnp.int32)
    for i in range(n_steps):
        logits = model(tok, caches=caches, position_offset=ids.shape[1] + i)
        outs.append(logits[:, -1])
        tok = jnp.argmax(logits[:, -1], axis=-1)[:, None].astype(jnp.int32)
    return jnp.stack(outs)


def _tiny(family):
    if family == "llama":
        from dmx_compressor_tpu.models.llama import LlamaConfig, LlamaForCausalLM

        return LlamaForCausalLM(LlamaConfig.tiny(), rngs=nnx.Rngs(0))
    if family == "gpt2":
        from dmx_compressor_tpu.models.gpt2 import GPT2Config, GPT2LMHeadModel

        return GPT2LMHeadModel(GPT2Config.tiny(), rngs=nnx.Rngs(0))
    if family == "qwen3":
        from dmx_compressor_tpu.models.qwen3 import Qwen3Config, Qwen3ForCausalLM

        return Qwen3ForCausalLM(Qwen3Config.tiny(), rngs=nnx.Rngs(0))
    if family == "gemma":
        from dmx_compressor_tpu.models.gemma import GemmaConfig, GemmaForCausalLM

        return GemmaForCausalLM(GemmaConfig.tiny(), rngs=nnx.Rngs(0))
    raise KeyError(family)


def _spy_kernels(monkeypatch):
    """Force the viability gate on (interpret-mode kernels stand in for the
    TPU) and record which flash-decode kernel ran."""
    calls = []
    orig_fp, orig_int8 = fd.flash_decode, fd.flash_decode_int8

    def spy(fn):
        def wrapped(*a, **kw):
            calls.append(fn.__name__)
            return fn(*a, use_pallas=True, interpret=True, **kw)

        return wrapped

    monkeypatch.setattr(fd, "flash_decode_viable",
                        lambda S, block_k=128, kind="fp":
                        S % min(block_k, S) == 0)
    monkeypatch.setattr(fd, "flash_decode", spy(orig_fp))
    monkeypatch.setattr(fd, "flash_decode_int8", spy(orig_int8))
    return calls


@pytest.mark.parametrize("family", ["llama", "gpt2", "qwen3", "gemma"])
@pytest.mark.parametrize("quantized", [False, True])
def test_family_decode_routes_through_flash_decode(monkeypatch, family,
                                                   quantized):
    model = _tiny(family)
    vocab = model.cfg.vocab_size
    ids = jnp.asarray(RNG.integers(1, vocab, (1, 7)), jnp.int32)
    want = _decode_logits(model, ids, 3,
                          model.init_cache(1, 32, quantized=quantized))

    calls = _spy_kernels(monkeypatch)
    got = _decode_logits(model, ids, 3,
                         model.init_cache(1, 32, quantized=quantized))
    expect = "flash_decode_int8" if quantized else "flash_decode"
    assert expect in calls, f"route not taken: {calls}"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-4)


def test_whisper_decode_routes_through_flash_decode(monkeypatch):
    from dmx_compressor_tpu.models.whisper import (
        WhisperConfig,
        WhisperForConditionalGeneration,
    )

    model = WhisperForConditionalGeneration(WhisperConfig.tiny(),
                                            rngs=nnx.Rngs(0))
    feats = jnp.asarray(
        RNG.standard_normal((1, 16, 100)).astype(np.float32)
    )
    enc = model.model.encoder(feats)

    def decode(caches):
        ids = jnp.asarray([[1, 2, 3]], jnp.int32)
        logits = model.decode(ids, enc, caches=caches, position_offset=0)
        outs = [logits[:, -1]]
        for i in range(3):
            tok = jnp.argmax(logits[:, -1], axis=-1)[:, None].astype(jnp.int32)
            logits = model.decode(tok, enc, caches=caches,
                                  position_offset=3 + i)
            outs.append(logits[:, -1])
        return jnp.stack(outs)

    want = decode(model.init_cache(1, 32))
    calls = _spy_kernels(monkeypatch)
    got = decode(model.init_cache(1, 32))
    assert "flash_decode" in calls, f"route not taken: {calls}"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-4)


def test_mistral_sliding_window_keeps_banded_path(monkeypatch):
    """plain_causal=False (sliding window) must NOT use the flash-decode
    kernels — their length-mask encodes only the plain causal form."""
    from dmx_compressor_tpu.models.mistral import (
        MistralConfig,
        MistralForCausalLM,
    )

    model = MistralForCausalLM(MistralConfig.tiny(), rngs=nnx.Rngs(0))
    ids = jnp.asarray(RNG.integers(1, 512, (1, 20)), jnp.int32)
    want = _decode_logits(model, ids, 3, model.init_cache(1, 32))

    calls = _spy_kernels(monkeypatch)
    got = _decode_logits(model, ids, 3, model.init_cache(1, 32))
    assert calls == [], f"banded mask must not ride flash decode: {calls}"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("family", ["llama", "gpt2"])
def test_basic_mode_int8_cache_applies_sdpa_pipeline(monkeypatch, family):
    """BASIC + quantized KV: exact-softmax fast paths must not be taken;
    numerics must equal the modular compound-SDPA pipeline on identical
    dequantized cache state."""
    from dmx_compressor_tpu.modeling.model import DmxModel
    from dmx_compressor_tpu.ops import kv_cache as kvc
    from dmx_compressor_tpu.ops.compress import compress_for_inference

    model = _tiny(family)
    dm = DmxModel.from_raw(model)
    dm.to_basic_mode()
    compress_for_inference(dm)

    vocab = model.cfg.vocab_size
    ids = jnp.asarray(RNG.integers(1, vocab, (1, 7)), jnp.int32)
    tok = jnp.ones((1, 1), jnp.int32)

    def boom(*a, **kw):
        raise AssertionError("quantized_sdpa bypassed the BASIC contract")

    monkeypatch.setattr(kvc, "quantized_sdpa", boom)
    monkeypatch.setattr(fd, "flash_decode_int8", boom)

    qcaches = model.init_cache(1, 32, quantized=True)
    model(ids, caches=qcaches, position_offset=0)
    got = model(tok, caches=qcaches, position_offset=7)

    # reference: force the fused BASIC decode kernel off — the modular
    # pipeline on the same quantized state must produce the same values
    import dmx_compressor_tpu.ops.basic_attention as ba

    qcaches2 = model.init_cache(1, 32, quantized=True)
    model(ids, caches=qcaches2, position_offset=0)
    monkeypatch.setattr(ba, "basic_sdpa_shape", lambda *a, **kw: None)
    want = model(tok, caches=qcaches2, position_offset=7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-4)
