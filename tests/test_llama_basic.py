"""Llama-family fused BASIC decode (GQA + split-KV) vs the modular module
pipeline — the round-3 generalization of OPT's fused decode path
(VERDICT r2 #3: split-KV invariant-cast decode beyond OPT)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from dmx_compressor_tpu.modeling.model import DmxModel
from dmx_compressor_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from dmx_compressor_tpu.ops.compress import (
    compress_for_inference,
    set_inference_mode,
)


@pytest.fixture(autouse=True)
def _inference_mode():
    set_inference_mode(True)
    yield
    set_inference_mode(False)


def _cfg():
    # head_dim 64 (== the BASIC BFP block size) with GQA 2:1
    return LlamaConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_key_value_heads=1,
        max_position_embeddings=256,
    )


def _basic_model(defuse: bool = False):
    cfg = _cfg()
    model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
    dm = DmxModel.from_raw(model)
    dm.to_basic_mode()
    compress_for_inference(dm, keep_originals=defuse)
    if defuse:
        # drop the merged projections: basic_llama_layer_plan returns None
        # and every op runs through its modular DmxModule pipeline
        for layer in model.model.layers:
            del layer.self_attn.qkv_merged
            del layer.mlp.gateup_merged
    return cfg, model


class TestLlamaFusedBasicDecode:
    def test_plan_detected_after_compress(self):
        from dmx_compressor_tpu.ops.basic_layer import basic_llama_layer_plan

        _, model = _basic_model()
        plan = basic_llama_layer_plan(model.model.layers[0])
        assert plan is not None
        assert plan.wl == 8 and plan.block == 64

    def test_fused_split_decode_matches_modular(self):
        cfg, fused = _basic_model()
        _, modular = _basic_model(defuse=True)

        B, P = 2, 64
        ids = jax.random.randint(jax.random.key(3), (B, P), 0, cfg.vocab_size)
        tok = jnp.ones((B, 1), jnp.int32)

        mono = modular.init_cache(B, P + 64)
        modular(ids, caches=mono, position_offset=0)
        want = modular(tok, caches=mono, position_offset=P)

        split = fused.init_cache(B, P + 64, split_base_len=P)
        fused(ids, caches=split, position_offset=0)
        got = fused(tok, caches=split, position_offset=P)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-4
        )

    def test_precast_base_matches_inline_cast(self):
        from dmx_compressor_tpu.ops.split_decode import prepare_split_decode

        cfg, model = _basic_model()
        B, P = 2, 64
        ids = jax.random.randint(jax.random.key(5), (B, P), 0, cfg.vocab_size)
        tok = 2 * jnp.ones((B, 1), jnp.int32)

        inline = model.init_cache(B, P + 64, split_base_len=P)
        model(ids, caches=inline, position_offset=0)
        want = model(tok, caches=inline, position_offset=P)

        pre = model.init_cache(B, P + 64, split_base_len=P)
        model(ids, caches=pre, position_offset=0)
        prepare_split_decode(model, pre)  # family-independent walker
        assert pre[0].base_cast_key == (8, 64)
        got = model(tok, caches=pre, position_offset=P)
        # bf16 holds <= 8-mantissa-bit cast values exactly: bit-identical
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
        )

    def test_merged_projections_bit_exact_in_weights_mode(self):
        # merge_parallel_linears on GQA widths (q 128->128, k/v 128->64)
        cfg = _cfg()
        a = LlamaForCausalLM(cfg, rngs=nnx.Rngs(1))
        dma = DmxModel.from_raw(a)
        dma.to_basic_mode()
        compress_for_inference(dma)
        b = LlamaForCausalLM(cfg, rngs=nnx.Rngs(1))
        dmb = DmxModel.from_raw(b)
        dmb.to_basic_mode()
        compress_for_inference(dmb, keep_originals=True)
        for layer in b.model.layers:
            del layer.self_attn.qkv_merged
            del layer.mlp.gateup_merged
        ids = jax.random.randint(jax.random.key(9), (2, 16), 0, cfg.vocab_size)
        la = a(ids)
        lb = b(ids)
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
