"""Gemma / Qwen3 fused BASIC decode vs the modular module pipeline — the
round-4 extension of the Llama-family fused step (VERDICT r3 next #6:
(1+w) RMSNorm and q/k-norm variants on basic_llama_layer_plan /
fused_llama_family_step)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from dmx_compressor_tpu.modeling.model import DmxModel
from dmx_compressor_tpu.models.gemma import GemmaConfig, GemmaForCausalLM
from dmx_compressor_tpu.models.qwen3 import Qwen3Config, Qwen3ForCausalLM
from dmx_compressor_tpu.ops.compress import (
    compress_for_inference,
    set_inference_mode,
)


@pytest.fixture(autouse=True)
def _inference_mode():
    set_inference_mode(True)
    yield
    set_inference_mode(False)


def _gemma_cfg(head_dim=64):
    # head_dim == the BASIC BFP block size so the fused SDPA engages;
    # decoupled from hidden/heads (= 32) on purpose, GQA 2:1
    return GemmaConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_key_value_heads=1,
        head_dim=head_dim,
        max_position_embeddings=256,
    )


def _qwen3_cfg(head_dim=64):
    return Qwen3Config(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_key_value_heads=1,
        head_dim=head_dim,
        max_position_embeddings=256,
        tie_word_embeddings=True,
    )


def _basic_model(family, defuse=False, head_dim=64):
    if family == "gemma":
        cfg = _gemma_cfg(head_dim)
        model = GemmaForCausalLM(cfg, rngs=nnx.Rngs(0))
    else:
        cfg = _qwen3_cfg(head_dim)
        model = Qwen3ForCausalLM(cfg, rngs=nnx.Rngs(0))
    dm = DmxModel.from_raw(model)
    dm.to_basic_mode()
    compress_for_inference(dm, keep_originals=defuse)
    if defuse:
        # drop the merged projections: the layer plan returns None and
        # every op runs through its modular DmxModule pipeline
        for layer in model.model.layers:
            del layer.self_attn.qkv_merged
            del layer.mlp.gateup_merged
    return cfg, model


class TestGemmaFusedBasicDecode:
    def test_plan_detected_after_compress(self):
        from dmx_compressor_tpu.ops.basic_layer import (
            basic_gemma_layer_plan,
            basic_llama_layer_plan,
        )

        _, model = _basic_model("gemma")
        layer = model.model.layers[0]
        plan = basic_gemma_layer_plan(layer)
        assert plan is not None
        assert plan.wl == 8 and plan.block == 64
        assert plan.gemma_norm and plan.act == "gelu_tanh"
        assert plan.qk_norm_eps is None
        # the plain-Llama plan must NOT claim a Gemma layer: its (1+w)
        # norms and GELU would be executed with Llama numerics
        assert basic_llama_layer_plan(layer) is None

    @pytest.mark.parametrize("head_dim", [64, 32, 128, 256])
    def test_fused_decode_matches_modular(self, head_dim):
        cfg, fused = _basic_model("gemma", head_dim=head_dim)
        _, modular = _basic_model("gemma", defuse=True, head_dim=head_dim)

        B, P = 2, 64
        ids = jax.random.randint(jax.random.key(3), (B, P), 0, cfg.vocab_size)
        tok = jnp.ones((B, 1), jnp.int32)

        mono = modular.init_cache(B, P + 64)
        modular(ids, caches=mono, position_offset=0)
        want = modular(tok, caches=mono, position_offset=P)

        caches = fused.init_cache(B, P + 64)
        fused(ids, caches=caches, position_offset=0)
        got = fused(tok, caches=caches, position_offset=P)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-4
        )

    @pytest.mark.parametrize("head_dim", [64, 256])
    def test_fused_split_decode_matches_modular(self, head_dim):
        # 256 = Gemma's real head_dim: 4 BFP blocks per head row ride the
        # split-cache fused SDPA (incl. the precomputed base casts)
        cfg, fused = _basic_model("gemma", head_dim=head_dim)
        _, modular = _basic_model("gemma", defuse=True, head_dim=head_dim)

        B, P = 2, 64
        ids = jax.random.randint(jax.random.key(5), (B, P), 0, cfg.vocab_size)
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


class TestQwen3FusedBasicDecode:
    def test_plan_detected_after_compress(self):
        from dmx_compressor_tpu.ops.basic_layer import (
            basic_llama_layer_plan,
            basic_qwen3_layer_plan,
        )

        cfg, model = _basic_model("qwen3")
        layer = model.model.layers[0]
        plan = basic_qwen3_layer_plan(layer)
        assert plan is not None
        assert plan.wl == 8 and plan.block == 64
        assert not plan.gemma_norm and plan.act == "silu"
        assert plan.qk_norm_eps == cfg.rms_norm_eps
        # a plain-Llama plan on a Qwen3 layer would silently skip q/k norms
        # if dispatched; the Llama checker itself accepts the layer shape,
        # so the qwen3 plan (with qk_norm_eps set) must be what the layer
        # dispatches — asserted by the parity tests below.
        assert basic_llama_layer_plan(layer) is not None

    @pytest.mark.parametrize("head_dim", [64, 32, 128, 256])
    def test_fused_decode_matches_modular(self, head_dim):
        cfg, fused = _basic_model("qwen3", head_dim=head_dim)
        _, modular = _basic_model("qwen3", defuse=True, head_dim=head_dim)

        B, P = 2, 64
        ids = jax.random.randint(jax.random.key(7), (B, P), 0, cfg.vocab_size)
        tok = jnp.ones((B, 1), jnp.int32)

        mono = modular.init_cache(B, P + 64)
        modular(ids, caches=mono, position_offset=0)
        want = modular(tok, caches=mono, position_offset=P)

        caches = fused.init_cache(B, P + 64)
        fused(ids, caches=caches, position_offset=0)
        got = fused(tok, caches=caches, position_offset=P)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-4
        )

    def test_sliding_window_fused_matches_modular(self):
        """Banded (sliding-window) masks ride the fused step too: the fused
        SDPA applies the mask additively, so the window is exact."""

        def build(defuse):
            cfg = _qwen3_cfg()
            cfg.sliding_window = 16
            model = Qwen3ForCausalLM(cfg, rngs=nnx.Rngs(0))
            dm = DmxModel.from_raw(model)
            dm.to_basic_mode()
            compress_for_inference(dm, keep_originals=defuse)
            if defuse:
                for layer in model.model.layers:
                    del layer.self_attn.qkv_merged
                    del layer.mlp.gateup_merged
            return cfg, model

        cfg, fused = build(False)
        _, modular = build(True)
        B, P = 2, 64
        ids = jax.random.randint(jax.random.key(9), (B, P), 0, cfg.vocab_size)
        tok = jnp.ones((B, 1), jnp.int32)

        calls = []
        from dmx_compressor_tpu.ops import basic_layer as bl

        orig = bl.fused_llama_family_step

        def spy(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        mono = modular.init_cache(B, P + 64)
        modular(ids, caches=mono, position_offset=0)
        want = modular(tok, caches=mono, position_offset=P)

        caches = fused.init_cache(B, P + 64)
        fused(ids, caches=caches, position_offset=0)
        bl.fused_llama_family_step = spy
        try:
            got = fused(tok, caches=caches, position_offset=P)
        finally:
            bl.fused_llama_family_step = orig
        assert calls, "fused step did not engage on the banded mask"
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-4
        )


def test_gemma_rmsnorm_surrogate_uses_one_plus_weight():
    """BASIC-configured GemmaRMSNorm: the RMS_NORM[vsimd] surrogate must
    apply Gemma's (1+w) semantics (r4 fix: the surrogate multiplies by its
    weight argument directly; with Gemma weights init at 0 the unfixed
    module scaled its output by ~0)."""
    from dmx_compressor_tpu.nn import modules as dmxnn
    from dmx_compressor_tpu.nn.core import DmxModule

    m = dmxnn.GemmaRMSNorm(64, eps=1e-6)
    rng = np.random.default_rng(0)
    m.weight.value = jnp.asarray(rng.standard_normal(64) * 0.1, jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 64)), jnp.float32)
    exact = m.functional_forward(x, (64,), m.weight.value, 1e-6)
    m.approximator.set_function("RMS_NORM[vsimd]{}()")
    try:
        DmxModule.inference_mode = True
        got = m(x)
    finally:
        DmxModule.inference_mode = False
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(exact), rtol=1e-5, atol=1e-6
    )


class TestFusedRMSHead:
    """Final-RMSNorm + LM-head fusion (ops/basic_layer.fused_rms_head) vs
    the modular lm_head(norm(h)) tail, per family."""

    @pytest.mark.parametrize("family", ["qwen3", "gemma"])
    def test_fused_head_matches_modular_tail(self, family, monkeypatch):
        import dmx_compressor_tpu.ops.basic_layer as BL

        cfg, fused = _basic_model(family)
        _, plain = _basic_model(family)

        B, P = 2, 64
        ids = jax.random.randint(jax.random.key(11), (B, P), 0, cfg.vocab_size)
        tok = jnp.ones((B, 1), jnp.int32)

        c1 = fused.init_cache(B, P + 8)
        fused(ids, caches=c1, position_offset=0)
        # the fused path must actually engage for this test to mean anything
        gflag = family == "gemma"
        assert BL.basic_rms_head_plan(
            fused.model.norm, fused.lm_head, gemma_norm=gflag
        ) is not None
        got = fused(tok, caches=c1, position_offset=P)

        # identical weights (same rngs seed), fused head disabled
        monkeypatch.setattr(BL, "basic_rms_head_plan", lambda *a, **k: None)
        c2 = plain.init_cache(B, P + 8)
        plain(ids, caches=c2, position_offset=0)
        want = plain(tok, caches=c2, position_offset=P)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-4
        )
