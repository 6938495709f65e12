"""Mistral fused BASIC decode (sliding-window mask through the fused SDPA)
vs the modular module pipeline — Mistral shares LlamaDecoderLayer, so the
family fused step engages as soon as the banded-mask dispatch allows it
(r4: the fused SDPA applies masks additively, so the window is exact)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from dmx_compressor_tpu.modeling.model import DmxModel
from dmx_compressor_tpu.models.mistral import MistralConfig, MistralForCausalLM
from dmx_compressor_tpu.ops.compress import (
    compress_for_inference,
    set_inference_mode,
)


@pytest.fixture(autouse=True)
def _inference_mode():
    set_inference_mode(True)
    yield
    set_inference_mode(False)


def _cfg(sliding_window=16):
    # head_dim 64 (== BASIC BFP block size), GQA 2:1, short banded window
    return MistralConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_key_value_heads=1,
        max_position_embeddings=256,
        sliding_window=sliding_window,
    )


def _basic_model(defuse=False, sliding_window=16):
    cfg = _cfg(sliding_window)
    model = MistralForCausalLM(cfg, rngs=nnx.Rngs(0))
    dm = DmxModel.from_raw(model)
    dm.to_basic_mode()
    compress_for_inference(dm, keep_originals=defuse)
    if defuse:
        for layer in model.model.layers:
            del layer.self_attn.qkv_merged
            del layer.mlp.gateup_merged
    return cfg, model


@pytest.mark.parametrize("sliding_window", [16, None])
def test_fused_decode_matches_modular(sliding_window):
    cfg, fused = _basic_model(sliding_window=sliding_window)
    _, modular = _basic_model(defuse=True, sliding_window=sliding_window)

    B, P = 2, 64
    ids = jax.random.randint(jax.random.key(11), (B, P), 0, cfg.vocab_size)
    tok = jnp.ones((B, 1), jnp.int32)

    mono = modular.init_cache(B, P + 64)
    modular(ids, caches=mono, position_offset=0)
    want = modular(tok, caches=mono, position_offset=P)

    calls = []
    from dmx_compressor_tpu.ops import basic_layer as bl

    orig = bl.fused_llama_family_step

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    caches = fused.init_cache(B, P + 64)
    fused(ids, caches=caches, position_offset=0)
    bl.fused_llama_family_step = spy
    try:
        got = fused(tok, caches=caches, position_offset=P)
    finally:
        bl.fused_llama_family_step = orig
    assert calls, "fused step did not engage"
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-4
    )


def test_banded_mask_actually_masks():
    """The window changes the answer (guards against a trivially-passing
    parity test where the window covers the whole context)."""
    cfg, banded = _basic_model(sliding_window=16)
    _, full = _basic_model(sliding_window=None)

    B, P = 1, 64
    ids = jax.random.randint(jax.random.key(13), (B, P), 0, cfg.vocab_size)
    tok = jnp.ones((B, 1), jnp.int32)

    cb = banded.init_cache(B, P + 8)
    banded(ids, caches=cb, position_offset=0)
    got_b = banded(tok, caches=cb, position_offset=P)

    cf = full.init_cache(B, P + 8)
    full(ids, caches=cf, position_offset=0)
    got_f = full(tok, caches=cf, position_offset=P)
    assert float(jnp.max(jnp.abs(got_b - got_f))) > 1e-3
