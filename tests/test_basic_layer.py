"""Layer mega-kernels (ops/basic_layer.py) vs the modular BASIC pipeline.

Runs in Pallas interpret mode on the CPU test mesh; bench runs exercise the
same code under Mosaic on the real chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from dmx_compressor_tpu.nn import modules as dmxnn
from dmx_compressor_tpu.numerics.cast import CastTo
from dmx_compressor_tpu.ops.basic_layer import (
    basic_layer_plan,
    fused_ln_linear,
)
from dmx_compressor_tpu.ops.basic_linear import fused_basic_linear
from dmx_compressor_tpu.ops.bfp_pack import bfp_pack
from dmx_compressor_tpu.ops.compress import set_inference_mode

BFP16_64 = "BFP[8|8]{64}(SN)"
FLOAT16 = "FP[1|5|10,15](FN)"


def _rand(key, shape, scale=1.0):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32) * scale


@pytest.fixture(autouse=True)
def _inference_mode():
    set_inference_mode(True)
    yield
    set_inference_mode(False)


def modular_chain(x, w, b, ln_w, ln_b, eps, residual=None, relu=False):
    """The module pipeline the kernel replaces, expressed with live modules."""
    from dmx_compressor_tpu.functional import simd_ops

    fp16_in = CastTo(format=FLOAT16)
    if residual is not None:
        ra = dmxnn.ResAdd()
        ra.configure(dict(input_formats=[FLOAT16, FLOAT16],
                          output_formats=[FLOAT16]))
        x = ra(x, residual)
    pre = x
    ln_in = CastTo(format=FLOAT16)
    ln_out = CastTo(format=FLOAT16)
    h = ln_out(
        simd_ops.layer_norm(ln_in(x), (x.shape[-1],), ln_w, ln_b, eps)
    )
    in_cast = CastTo(format=BFP16_64, block_dim=-1)
    out_cast = CastTo(format=FLOAT16)
    y = jnp.matmul(
        in_cast(h).astype(jnp.bfloat16),
        w.astype(jnp.bfloat16).T,
        preferred_element_type=jnp.float32,
    )
    y = out_cast(y + b)
    if relu:
        r_in = CastTo(format=FLOAT16)
        r_out = CastTo(format=FLOAT16)
        y = r_out(jax.nn.relu(r_in(y)))
    return y, pre


class TestFusedLnLinear:
    @pytest.mark.parametrize("packed_w", [True, False])
    def test_matches_modular(self, packed_w):
        M, K, N = 8, 128, 192
        x = _rand(0, (M, K), 2.0)
        w = _rand(1, (N, K), 0.3)
        b = _rand(2, (N,), 0.1)
        ln_w = _rand(3, (K,), 0.5) + 1.0
        ln_b = _rand(4, (K,), 0.1)
        pk = bfp_pack(w, 8, 64)
        from dmx_compressor_tpu.ops.bfp_pack import bfp_unpack

        wq = bfp_unpack(pk)
        want, _ = modular_chain(x, wq, b, ln_w, ln_b, 1e-5)
        got = fused_ln_linear(
            x,
            packed=pk if packed_w else None,
            w_bf16=None if packed_w else wq.astype(jnp.bfloat16),
            bias=b, ln_w=ln_w, ln_b=ln_b, eps=1e-5,
            wl=8, in_block=64, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_resadd_relu_emit(self):
        M, K, N = 4, 256, 128
        x = _rand(5, (M, K))
        res = _rand(6, (M, K))
        w = _rand(7, (N, K), 0.2)
        b = _rand(8, (N,), 0.1)
        ln_w = jnp.ones((K,))
        ln_b = jnp.zeros((K,))
        pk = bfp_pack(w, 8, 64)
        from dmx_compressor_tpu.ops.bfp_pack import bfp_unpack

        wq = bfp_unpack(pk)
        want, want_pre = modular_chain(x, wq, b, ln_w, ln_b, 1e-5,
                                       residual=res, relu=True)
        got, got_pre = fused_ln_linear(
            x, packed=pk, bias=b, ln_w=ln_w, ln_b=ln_b, eps=1e-5,
            wl=8, in_block=64, residual=res, relu=True, emit_pre=True,
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got_pre), np.asarray(want_pre))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        assert (np.asarray(got) >= 0).all()


class TestResOutEpilogue:
    def test_fc2_resadd_epilogue(self):
        M, K, N = 8, 256, 128
        x = _rand(9, (M, K))
        res = CastTo(format=FLOAT16)(_rand(10, (M, N)))  # fp16-grid residual
        w = _rand(11, (N, K), 0.2)
        b = _rand(12, (N,), 0.1)
        pk = bfp_pack(w, 8, 64)
        from dmx_compressor_tpu.ops.bfp_pack import bfp_unpack

        wq = bfp_unpack(pk)
        in_cast = CastTo(format=BFP16_64, block_dim=-1)
        out_cast = CastTo(format=FLOAT16)
        y16 = out_cast(
            jnp.matmul(in_cast(x).astype(jnp.bfloat16), wq.astype(jnp.bfloat16).T,
                       preferred_element_type=jnp.float32) + b
        )
        ra = dmxnn.ResAdd()
        ra.configure(dict(input_formats=[FLOAT16, FLOAT16],
                          output_formats=[FLOAT16]))
        want = ra(y16, res)
        got = fused_basic_linear(
            x, packed=pk, bias=b, in_wl=8, in_block=64, out_fp16=True,
            res_out=res, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestOPTLayerFused:
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
        return cfg, model, dm

    def test_plan_detected(self):
        cfg, model, dm = self._model()
        layer = model.model.decoder.layers[0]
        plan = basic_layer_plan(layer)
        assert plan is not None
        assert plan.wl == 8 and plan.block == 64

    def test_plan_none_when_observing(self):
        cfg, model, dm = self._model()
        layer = model.model.decoder.layers[0]
        layer.fc1.input_casts["input_cast"].enable_observer()
        assert basic_layer_plan(layer) is None

    def test_plan_none_in_baseline(self):
        from dmx_compressor_tpu.modeling.model import DmxModel
        from dmx_compressor_tpu.models.opt import OPTConfig, OPTForCausalLM
        from dmx_compressor_tpu.ops.compress import compress_for_inference

        cfg = OPTConfig(vocab_size=256, hidden_size=128, ffn_dim=256,
                        num_hidden_layers=1, num_attention_heads=2,
                        max_position_embeddings=128)
        model = OPTForCausalLM(cfg, rngs=nnx.Rngs(0))
        dm = DmxModel.from_raw(model)
        dm.to_baseline_mode()
        compress_for_inference(dm)
        assert basic_layer_plan(model.model.decoder.layers[0]) is None

    def test_fused_decode_matches_modular(self, monkeypatch):
        cfg, model, dm = self._model()
        B, P = 2, 63
        ids = jax.random.randint(jax.random.key(1), (B, P), 0, cfg.vocab_size)

        caches = model.init_cache(B, 64)
        model(ids, caches=caches, position_offset=0)
        tok = jnp.zeros((B, 1), jnp.int32)

        import dmx_compressor_tpu.ops.basic_layer as BL

        calls = {"n": 0}
        orig = BL.basic_layer_plan

        def counting(layer):
            p = orig(layer)
            if p is not None:
                calls["n"] += 1
            return p

        monkeypatch.setattr(BL, "basic_layer_plan", counting)
        fused = model(tok, caches=caches, position_offset=P)
        assert calls["n"] == cfg.num_hidden_layers

        caches2 = model.init_cache(B, 64)
        model(ids, caches=caches2, position_offset=0)
        monkeypatch.setattr(BL, "basic_layer_plan", lambda *a: None)
        modular = model(tok, caches=caches2, position_offset=P)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(modular), rtol=2e-3, atol=2e-4
        )
