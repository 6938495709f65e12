"""Fused BASIC-linear kernel (ops/basic_linear.py): bit-parity vs the
modular CastTo + matmul + CastTo pipeline it replaces.

Runs in Pallas interpret mode on the CPU test mesh; the same code paths
compile with Mosaic on TPU (probed separately by bench runs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from dmx_compressor_tpu.numerics.cast import CastTo
from dmx_compressor_tpu.numerics.format import Format
from dmx_compressor_tpu.numerics.rounding import block_quantize_lastdim
from dmx_compressor_tpu.ops.basic_linear import (
    _bfp_cast_with_exponents,
    _fp16_cast_f32,
    block_exponents,
    cast_blocked_lastdim,
    fused_basic_linear,
)
from dmx_compressor_tpu.ops.bfp_pack import bfp_pack, bfp_unpack

BFP16_64 = "BFP[8|8]{64}(SN)"
FLOAT16 = "FP[1|5|10,15](FN)"


def _rand(key, shape, scale=1.0):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32) * scale


class TestFp16Emulation:
    def test_bit_exact_vs_fast_path(self):
        fmt = Format.from_shorthand(FLOAT16)
        x = jnp.concatenate([
            _rand(0, (4096,), 3.0),
            _rand(1, (1024,), 1e-6),  # below smallest normal -> flushed
            _rand(2, (1024,), 6e4),  # near the saturation point
            _rand(3, (1024,), 7e-5),  # straddles the subnormal boundary
            jnp.array([0.0, -0.0, 65504.0, -65504.0, 65505.0, 1e9, -1e9,
                       6.103515625e-05, 6.1e-05, 2.0**-24, -(2.0**-24)]),
        ])
        ref = fmt.cast(x)
        out = _fp16_cast_f32(x)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_grid_membership(self):
        y = _fp16_cast_f32(_rand(7, (512,), 10.0))
        # every output must round-trip through fp16 unchanged
        np.testing.assert_array_equal(
            np.asarray(y), np.asarray(y.astype(jnp.float16).astype(jnp.float32))
        )

    def test_native_convert_matches_emulated_on_halfway_points(self):
        """The native f32->f16->f32 convert pair is a hardware oracle for
        the emulation's round-nearest-even; exact halfway points between
        fp16 grid values are where any rounding-mode mismatch would show.
        (r5 note: the native pair is NOT used in production — it splits XLA
        fusions on TPU — but it must agree bit-for-bit.)"""
        def _fp16_cast_f32_emulated(y):
            y = jnp.clip(y.astype(jnp.float32), -65504.0, 65504.0)
            q = y.astype(jnp.float16).astype(jnp.float32)
            return jnp.where(
                jnp.abs(q) < jnp.float32(6.103515625e-05), 0.0, q
            )

        base = jnp.concatenate([
            jnp.float32(2.0) ** jnp.arange(-14, 15),
            -(jnp.float32(2.0) ** jnp.arange(-14, 15)),
        ])
        # x = grid + exactly half a ulp (fp16 ulp at |x| in [2^e, 2^(e+1))
        # is 2^(e-10)); both round-to-even directions appear
        for mant in (0.0, 1.0 / 1024, 2.0 / 1024, 3.0 / 1024):
            x = base * (1.0 + mant + 0.5 / 1024)
            np.testing.assert_array_equal(
                np.asarray(_fp16_cast_f32(x)),
                np.asarray(_fp16_cast_f32_emulated(x)),
            )
        x = jnp.concatenate([_rand(13, (8192,), s) for s in
                             (1e-8, 1e-4, 1.0, 1e4, 1e8)])
        np.testing.assert_array_equal(
            np.asarray(_fp16_cast_f32(x)),
            np.asarray(_fp16_cast_f32_emulated(x)),
        )


class TestBfpCastWithExponents:
    @pytest.mark.parametrize("scale", [1.0, 1e-4, 1e4, 1e-35, 1e35])
    def test_bit_exact_vs_lastdim_extreme(self, scale):
        """Extreme block exponents exercise the |k| > 126 two-multiply
        range splits in the r5 block-shaped pow2 rewrite."""
        x = _rand(17, (4, 256), scale)
        out = cast_blocked_lastdim(x, 64, 16)
        ref = block_quantize_lastdim(x, 16, 64)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    @pytest.mark.parametrize("scale", [1.0, 1e-4, 1e4])
    def test_bit_exact_vs_lastdim(self, scale):
        x = _rand(11, (8, 256), scale)
        e = block_exponents(x, 64).astype(jnp.float32)
        e_full = jnp.repeat(e, 64, axis=-1)
        out = _bfp_cast_with_exponents(x, e_full, 8)
        ref = block_quantize_lastdim(x, 8, 64)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_zero_blocks_pass_through(self):
        x = jnp.zeros((4, 128), jnp.float32)
        x = x.at[0, 70].set(1.5)  # only block 1 of row 0 is non-zero
        e = block_exponents(x, 64).astype(jnp.float32)
        assert int(e[0, 0]) == -128 and int(e[0, 1]) == 0
        out = _bfp_cast_with_exponents(x, jnp.repeat(e, 64, axis=-1), 8)
        ref = block_quantize_lastdim(x, 8, 64)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


class TestFusedKernel:
    def test_input_cast_exact_via_identity_weights(self):
        # identity weights make the matmul exact (one product per output):
        # kernel output == input cast, bit-for-bit
        K = 256
        x = _rand(3, (8, K), 2.0)
        w = jnp.eye(K, dtype=jnp.float32)
        out = fused_basic_linear(
            x, w_bf16=w.astype(jnp.bfloat16), in_wl=8, in_block=64,
            out_fp16=False, interpret=True,
        )
        ref = block_quantize_lastdim(x, 8, 64)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    @pytest.mark.parametrize("packed", [False, True])
    @pytest.mark.parametrize("bias", [False, True])
    def test_matches_modular_pipeline(self, packed, bias):
        M, K, N = 8, 192, 320
        x = _rand(5, (M, K))
        w = _rand(6, (N, K), 0.3)
        b = _rand(7, (N,), 0.1) if bias else None

        in_cast = CastTo(format=BFP16_64, block_dim=-1)
        out_cast = CastTo(format=FLOAT16)
        pk = bfp_pack(w, 8, 64)
        wq = bfp_unpack(pk)
        # modular reference: cast -> bf16 matmul -> bias -> fp16 cast
        xq = in_cast(x)
        ref = jnp.matmul(
            xq.astype(jnp.bfloat16), wq.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )
        if bias:
            ref = ref + b
        ref = out_cast(ref)

        out = fused_basic_linear(
            x,
            w_bf16=None if packed else wq.astype(jnp.bfloat16),
            packed=pk if packed else None,
            bias=b,
            in_wl=8,
            in_block=64,
            out_fp16=True,
            interpret=True,
        )
        # operands are bit-identical; only K-tile accumulation order differs
        # (single K tile here -> identical), so outputs match exactly
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_multi_k_tile_tolerance(self):
        M, K, N = 8, 4096, 128  # two K tiles of 2048
        x = _rand(8, (M, K))
        w = _rand(9, (N, K), 0.1)
        pk = bfp_pack(w, 8, 64)
        wq = bfp_unpack(pk)
        in_cast = CastTo(format=BFP16_64, block_dim=-1)
        xq = in_cast(x)
        ref = jnp.matmul(
            xq.astype(jnp.bfloat16), wq.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )
        out = fused_basic_linear(
            x, packed=pk, in_wl=8, in_block=64, out_fp16=False, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-5
        )

    def test_leading_dims(self):
        x = _rand(10, (2, 4, 128))
        w = _rand(11, (64, 128), 0.5)
        pk = bfp_pack(w, 8, 64)
        out = fused_basic_linear(
            x, packed=pk, in_wl=8, in_block=64, out_fp16=True, interpret=True
        )
        assert out.shape == (2, 4, 64)


class TestPackedBFPLinearFusedPath:
    def _make(self, K=128, N=96, bias=True):
        from dmx_compressor_tpu.nn import modules as dmxnn
        from dmx_compressor_tpu.ops.compress import PackedBFPLinear

        lin = dmxnn.Linear(K, N, bias=bias, rngs=nnx.Rngs(0))
        lin.input_casts.set_format([BFP16_64])
        lin.weight_cast.set_format(BFP16_64)
        lin.output_casts.set_format([FLOAT16])
        lin.bias_cast.set_format("BFP[24|8]{1}(SN)")
        return lin, PackedBFPLinear.from_linear(lin)

    def test_fused_matches_modular_packed_forward(self):
        lin, plin = self._make()
        x = _rand(21, (8, 128))
        assert plin._fusable(x)
        fused = plin(x)
        # disable fusion -> the modular DmxModule pipeline on the same module
        plin.input_casts["input_cast"].pre_transform = {"__nofuse__": None}
        assert not plin._fusable(x)
        del plin.input_casts["input_cast"].pre_transform["__nofuse__"]
        modular = super(type(plin), plin).__call__(x)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(modular), rtol=1e-6, atol=2e-6
        )

    def test_fallback_when_observing(self):
        lin, plin = self._make()
        x = _rand(22, (8, 128))
        plin.input_casts["input_cast"].enable_observer()
        assert not plin._fusable(x)

    def test_fallback_on_large_batch(self):
        lin, plin = self._make()
        x = _rand(23, (512, 128))
        assert not plin._fusable(x)


class TestPackedStorageSingleCopy:
    """A PackedBFPLinear holds EITHER the bf16 dequant cache OR the int8
    payload, never both (keeping both doubled weight HBM residency and
    OOM'd gemma-2b at build — round-4 fix), and compress_for_inference
    releases the dead originals superseded by merged projections."""

    def test_bf16_cached_module_has_no_payload(self):
        from dmx_compressor_tpu.nn import modules as dmxnn
        from dmx_compressor_tpu.ops.compress import PackedBFPLinear

        lin = dmxnn.Linear(128, 96, bias=True, rngs=nnx.Rngs(0))
        lin.input_casts.set_format([BFP16_64])
        lin.weight_cast.set_format(BFP16_64)
        lin.output_casts.set_format([FLOAT16])
        plin = PackedBFPLinear.from_linear(lin)
        assert plin.weight_bf16 is not None
        assert plin.weight_mantissa is None and plin.weight_exponent is None
        # prefill-sized input rides the bf16 MXU path (no payload needed)
        y = plin(_rand(31, (512, 128)))
        assert y.shape == (512, 96)

    def test_merge_repacks_losslessly_from_bf16(self):
        from dmx_compressor_tpu.nn import modules as dmxnn
        from dmx_compressor_tpu.ops.compress import (
            PackedBFPLinear,
            merge_parallel_linears,
        )

        mods = []
        for i in range(3):
            lin = dmxnn.Linear(128, 64, bias=False, rngs=nnx.Rngs(i))
            lin.input_casts.set_format([BFP16_64])
            lin.weight_cast.set_format(BFP16_64)
            lin.output_casts.set_format([FLOAT16])
            mods.append(PackedBFPLinear.from_linear(lin))
        merged = merge_parallel_linears(mods)
        assert merged is not None and merged.out_features == 192
        assert merged.weight_mantissa is None  # single-copy invariant holds
        x = _rand(32, (4, 128))
        got = merged(x)
        want = jnp.concatenate([m(x) for m in mods], axis=-1)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_compress_releases_dead_originals(self):
        from dmx_compressor_tpu.modeling.model import DmxModel
        from dmx_compressor_tpu.models.llama import LlamaConfig, LlamaForCausalLM
        from dmx_compressor_tpu.ops.compress import compress_for_inference

        cfg = LlamaConfig(
            vocab_size=256, hidden_size=128, intermediate_size=256,
            num_hidden_layers=1, num_attention_heads=2,
            num_key_value_heads=1, max_position_embeddings=64,
        )
        model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
        dm = DmxModel.from_raw(model)
        dm.to_basic_mode()
        compress_for_inference(dm)
        attn = model.model.layers[0].self_attn
        mlp = model.model.layers[0].mlp
        assert attn.qkv_merged is not None and mlp.gateup_merged is not None
        for dead in (attn.q_proj, attn.k_proj, attn.v_proj,
                     mlp.gate_proj, mlp.up_proj):
            assert dead.weight_bf16 is None
            assert dead.weight_mantissa is None
        # live modules still run end to end
        ids = jnp.zeros((1, 4), jnp.int32)
        assert model(ids).shape == (1, 4, 256)

    def test_keep_originals_stays_runnable(self):
        from dmx_compressor_tpu.modeling.model import DmxModel
        from dmx_compressor_tpu.models.llama import LlamaConfig, LlamaForCausalLM
        from dmx_compressor_tpu.ops.compress import compress_for_inference

        cfg = LlamaConfig(
            vocab_size=256, hidden_size=128, intermediate_size=256,
            num_hidden_layers=1, num_attention_heads=2,
            num_key_value_heads=1, max_position_embeddings=64,
        )
        model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
        dm = DmxModel.from_raw(model)
        dm.to_basic_mode()
        compress_for_inference(dm, keep_originals=True)
        attn = model.model.layers[0].self_attn
        x = _rand(33, (2, 1, 128))
        q, k, v = attn._project_qkv(x)
        np.testing.assert_array_equal(np.asarray(q), np.asarray(attn.q_proj(x)))
