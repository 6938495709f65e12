"""Packed BFP representation, fused linear, compression transform, and
experimental conv lowerings."""

import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

import dmx_compressor_tpu as dmx
from dmx_compressor_tpu import nn as dmxnn
from dmx_compressor_tpu.numerics.format import Format
from dmx_compressor_tpu.ops.bfp_pack import (
    bfp_pack,
    bfp_unpack,
    int_group_pack,
    int_group_unpack,
)
from dmx_compressor_tpu.ops.bfp_linear import bfp_linear_ref, bfp_linear
from dmx_compressor_tpu.ops.compress import compress_for_inference, PackedBFPLinear

RNG = np.random.default_rng(0)


def randf(*shape):
    return jnp.asarray(RNG.standard_normal(shape).astype(np.float32))


def test_bfp_pack_matches_fake_quant():
    """Packed reconstruction must be bit-exact vs the simulated BFP cast."""
    for prec, bs in [(8, 64), (8, 16), (4, 32)]:
        x = randf(16, 128) * 10.0
        packed = bfp_pack(x, prec, bs)
        got = np.asarray(bfp_unpack(packed))
        fmt = Format.from_shorthand(f"BFP[{prec}|8]{{{bs}}}(SN)")
        want = np.asarray(fmt.cast(x, block_dim=-1))
        np.testing.assert_array_equal(got, want)
        assert packed.mantissa.dtype == jnp.int8
        lim = 2 ** (prec - 1)
        assert np.abs(np.asarray(packed.mantissa)).max() < lim


def test_bfp_pack_storage_size():
    x = randf(64, 128)
    p = bfp_pack(x, 8, 64)
    bytes_packed = p.mantissa.size + p.exponent.size
    assert bytes_packed == 64 * 128 + 64 * 2  # ~4x smaller than fp32


def test_bfp_linear_ref_matches_fake_quant_matmul():
    x = randf(4, 128)
    w = randf(32, 128)
    b = randf(32)
    packed = bfp_pack(w, 8, 64)
    got = np.asarray(bfp_linear_ref(x, packed, b))
    fmt = Format.from_shorthand("BFP[8|8]{64}(SN)")
    wq = fmt.cast(w, block_dim=-1)
    want = np.asarray(x @ wq.T + b)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bfp_linear_pallas_matches_ref():
    """Pallas fused kernel vs jnp reference (runs in interpret mode off-TPU).

    Activations are BFP-quantized first (the BASIC path): 8-bit mantissas are
    exact in the MXU's bf16 multiplier, so the fused kernel is bit-comparable
    to the fp32 reference."""
    fmt = Format.from_shorthand("BFP[8|8]{64}(SN)")
    x = fmt.cast(randf(8, 128), block_dim=-1)
    w = randf(300, 128)  # N not a multiple of the kernel block
    packed = bfp_pack(w, 8, 64)
    want = np.asarray(bfp_linear_ref(x, packed))
    if jax.devices()[0].platform == "tpu":
        got = np.asarray(bfp_linear(x, packed, use_pallas=True))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)
    else:
        got = np.asarray(bfp_linear(x, packed, use_pallas=False))
        np.testing.assert_array_equal(got, want)


def test_int_group_pack_roundtrip():
    x = randf(8, 128) * 5
    q, s, zp = int_group_pack(x, bits=8, group_size=64)
    back = np.asarray(int_group_unpack(q, s, zp, 64))
    scale_max = float(np.asarray(s).max())
    assert np.abs(back - np.asarray(x)).max() <= scale_max * 0.5001
    assert q.dtype == jnp.int8


def test_compress_for_inference_preserves_numerics():
    from dmx_compressor_tpu.modeling.model import DmxModel

    class Net(nnx.Module):
        def __init__(self):
            self.l1 = nnx.Linear(128, 64, rngs=nnx.Rngs(0))
            self.l2 = nnx.Linear(64, 32, rngs=nnx.Rngs(1))

        def __call__(self, x):
            return self.l2(self.l1(x))

    net = Net()
    dm = DmxModel.from_raw(net)
    dm.to_basic_mode()
    x = randf(4, 128)
    before = np.asarray(dm(x))
    n = compress_for_inference(dm)
    assert n == 2
    assert isinstance(net.l1, PackedBFPLinear)
    after = np.asarray(dm(x))
    np.testing.assert_allclose(after, before, atol=1e-6)


def test_packed_linear_decode_path_policy():
    """Per-layer decode path: bf16 dequant cache everywhere except LM-head-
    sized weights, which run the fused int8 kernel (round-3 hardware A/B in
    ops/compress.py / tools/diag_bfpkernel_ab.py).  Both paths are exact for
    <= 8-bit mantissas, so the policy must not change values."""
    from dmx_compressor_tpu.nn import modules as dmxnn_mod

    def make(in_f, out_f):
        lin = dmxnn_mod.Linear(in_f, out_f, rngs=nnx.Rngs(0))
        lin.configure({"weight_format": "BFP[8|8]{64}(SN)"})  # BFP16_64
        return PackedBFPLinear.from_linear(lin), lin

    small, _ = make(128, 64)  # shallow K -> bf16 cache
    assert small.weight_bf16 is not None
    mid, mid_src = make(2048, 2048)  # block-sized layer -> bf16 cache (r3 A/B)
    assert mid.weight_bf16 is not None
    big, big_src = make(2048, 49152)  # LM-head-sized -> fused int8 kernel
    assert big.weight_bf16 is None

    x = randf(4, 2048)
    # the bf16 decode cache is exact only for <= 8-bit-mantissa inputs (the
    # quantized serving configs); feed a BFP-grid input for the comparison
    xq = Format.from_shorthand("BFP[8|8]{64}(SN)").cast(x, block_dim=-1)
    np.testing.assert_allclose(
        np.asarray(mid(xq)), np.asarray(mid_src(xq)), rtol=1e-6, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(big(x)), np.asarray(big_src(x)), rtol=1e-6, atol=1e-5
    )


def test_conv1d_unfold_matches_conv():
    from dmx_compressor_tpu.nn.experimental import Conv1dUnfold

    conv = dmxnn.Conv1d(4, 8, 3, stride=1, padding=1)
    unf = Conv1dUnfold.from_conv(conv)
    x = randf(2, 4, 16)
    np.testing.assert_allclose(
        np.asarray(unf(x)), np.asarray(conv(x)), atol=1e-4
    )


def test_conv2d_unfold_matches_conv():
    from dmx_compressor_tpu.nn.experimental import Conv2dUnfold

    conv = dmxnn.Conv2d(3, 8, (3, 3), stride=2, padding=1)
    unf = Conv2dUnfold.from_conv(conv)
    x = randf(2, 3, 12, 12)
    np.testing.assert_allclose(
        np.asarray(unf(x)), np.asarray(conv(x)), atol=1e-4
    )


def test_conv_unfold_quantized_runs():
    from dmx_compressor_tpu.nn.experimental import Conv2dUnfold

    conv = Conv2dUnfold(3, 8, (3, 3), stride=1, padding=1)
    conv.configure(
        dict(
            input_formats=[dmx.format.BFP16_64],
            weight_format=dmx.format.BFP16_64,
            output_formats=[dmx.format.FLOAT16],
        )
    )
    y = conv(randf(1, 3, 8, 8))
    assert y.shape == (1, 8, 8, 8)


def test_inference_mode_same_values():
    """Inference mode (surrogate-only approximation) produces identical
    values to the blend path."""
    from dmx_compressor_tpu.ops.compress import inference_mode

    mod = dmxnn.Softmax(dim=-1)
    mod.configure(dict(approximation_function=dmx.default_approx.SOFTMAX))
    x = randf(4, 16)
    blended = np.asarray(mod(x))
    with inference_mode():
        surrogate_only = np.asarray(mod(x))
    np.testing.assert_array_equal(blended, surrogate_only)


class TestPackedSBFP:
    """SBFP physical payloads: int4 nibbles + per-block scales
    (serving path for the SBFP_WEIGHT_STORAGE configs)."""

    FMT = "SBFP<XP[4,0](CSN)><FP[0|4|4,16](FN)>{16}"

    def test_pack_unpack_bit_exact(self):
        from dmx_compressor_tpu.numerics.format import Format
        from dmx_compressor_tpu.ops.bfp_pack import sbfp_pack, sbfp_unpack

        fmt = Format.from_shorthand(self.FMT)
        rs = np.random.RandomState(0)
        w = jnp.asarray(rs.randn(32, 64) * 0.3, jnp.float32)
        w = w.at[0, :16].set(0.0)  # all-zero block
        w = w.at[1, 16:32].multiply(100.0)  # big block
        p = sbfp_pack(w, fmt)
        assert p.nibbles.dtype == jnp.uint8
        assert p.nibbles.shape == (32, 32)
        assert p.scale.shape == (32, 4)
        np.testing.assert_array_equal(
            np.asarray(sbfp_unpack(p)), np.asarray(fmt.cast(w, -1))
        )

    def test_packed_sbfp_linear_matches_fake_quant(self):
        from flax import nnx

        from dmx_compressor_tpu import nn as dmxnn
        from dmx_compressor_tpu.ops.compress import PackedSBFPLinear

        lin = dmxnn.Linear(64, 32, rngs=nnx.Rngs(0))
        lin.configure(dict(weight_storage_format=self.FMT))
        x = jnp.asarray(np.random.RandomState(1).randn(4, 64), jnp.float32)
        want = np.asarray(lin(x))
        packed = PackedSBFPLinear.from_linear(lin)
        got = np.asarray(packed(x))
        # decode path: weights exact in bf16 (<= 8 significand bits);
        # SAME-format activations round to bf16 (documented serving
        # semantics, same as PackedBFPLinear)
        np.testing.assert_allclose(got, want, rtol=1e-2, atol=2e-3)
        # prefill path (rows >= 128) dequantizes f32: exact same weights
        xb = jnp.asarray(np.random.RandomState(2).randn(256, 64), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(packed(xb)), np.asarray(lin(xb)), rtol=2e-3, atol=2e-6
        )

    def test_compress_for_inference_picks_sbfp(self):
        from flax import nnx

        from dmx_compressor_tpu.modeling.model import DmxModel
        from dmx_compressor_tpu.models.opt import OPTConfig, OPTForCausalLM
        from dmx_compressor_tpu.ops.compress import (
            PackedSBFPLinear,
            compress_for_inference,
        )

        cfg = OPTConfig.tiny()
        model = OPTForCausalLM(cfg, rngs=nnx.Rngs(0))
        dm = DmxModel.from_raw(model)
        from dmx_compressor_tpu import DmxConfigRule
        from dmx_compressor_tpu import nn as dmxnn

        dm.configure(
            None,
            DmxConfigRule(
                module_types=(dmxnn.Linear,),
                module_config=dict(weight_storage_format=self.FMT),
            ),
        )
        x = np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 8)).astype("int32")
        want = np.asarray(dm(x))
        n = compress_for_inference(dm)
        assert n > 0
        assert any(
            isinstance(m, PackedSBFPLinear) for _, m in dm.named_dmx_modules()
        )
        got = np.asarray(dm(x))
        # bf16-activation decode matmuls across the stack (serving
        # semantics); logits track the fake-quant model closely
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=5e-2)


def test_compress_packs_mxint_weights():
    """MXINT8 (OCP microscaling int) is a BFP subclass: the packed serving
    path covers it unchanged."""
    from flax import nnx

    from dmx_compressor_tpu import nn as dmxnn
    from dmx_compressor_tpu.ops.compress import PackedBFPLinear

    lin = dmxnn.Linear(64, 32, rngs=nnx.Rngs(0))
    lin.configure(dict(weight_format="MXINT8{32}"))
    x = jnp.asarray(np.random.RandomState(0).randn(4, 64), jnp.float32)
    want = np.asarray(lin(x))
    packed = PackedBFPLinear.from_linear(lin)
    got = np.asarray(packed(x))
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=2e-3)


def test_sbfp_fused_kernel_interpret_exact():
    """Fused SBFP dequant-matmul (Pallas) == unpack-then-matmul reference,
    validated in interpret mode on CPU (odd shapes exercise padding)."""
    from dmx_compressor_tpu.numerics.format import Format
    from dmx_compressor_tpu.ops.bfp_linear import sbfp_linear, sbfp_linear_ref
    from dmx_compressor_tpu.ops.bfp_pack import sbfp_pack

    fmt = Format.from_shorthand("SBFP<XP[4,0](CSN)><FP[0|4|4,16](FN)>{16}")
    rs = np.random.RandomState(0)
    for M, N, K in [(8, 48, 80), (3, 33, 48), (130, 256, 160)]:
        w = jnp.asarray(rs.randn(N, K) * 0.3, jnp.float32)
        p = sbfp_pack(w, fmt)
        x = jnp.asarray(rs.randn(M, K), jnp.float32)
        b = jnp.asarray(rs.randn(N), jnp.float32)
        ref = np.asarray(sbfp_linear_ref(x, p, b))
        pal = np.asarray(sbfp_linear(x, p, b, use_pallas=True, interpret=True))
        np.testing.assert_allclose(pal, ref, atol=1e-5, rtol=1e-6)


def test_bfp_fused_kernel_interpret_multitile():
    """Fused BFP dequant-matmul == unpack-then-matmul reference across
    multiple K tiles and small block sizes (interpret mode on CPU).

    block_size=16 exercises the per-tile block cap (bk = 32 blocks -> 512)
    and the slotted exponent layout with nt > 1; block_size=64 with K=4096
    exercises two full 2048-wide tiles with grid accumulation."""
    from dmx_compressor_tpu.ops.bfp_linear import bfp_linear, bfp_linear_ref
    from dmx_compressor_tpu.ops.bfp_pack import bfp_pack

    rs = np.random.RandomState(0)
    for N, K, B in [(40, 1024, 16), (256, 4096, 64), (33, 80, 16)]:
        w = jnp.asarray(rs.randn(N, K) * 0.3, jnp.float32)
        packed = bfp_pack(w, 8, B)
        x = jnp.asarray(rs.randn(8, K), jnp.float32)
        b = jnp.asarray(rs.randn(N), jnp.float32)
        ref = np.asarray(bfp_linear_ref(x, packed, b))
        pal = np.asarray(
            bfp_linear(x, packed, b, use_pallas=True, interpret=True)
        )
        np.testing.assert_allclose(pal, ref, atol=1e-4, rtol=1e-6)


def test_bfp_linear_pallas_tpu_smoke_small_blocks():
    """Real-TPU (non-interpret) Mosaic compile + numerics for the fused
    dequant matmul at block sizes 16 and 64 (ADVICE r2: the interpret-mode
    tests bypass Mosaic entirely, so sub-128-lane handling must be proven on
    hardware).  Runs only under DMX_TEST_TPU=1."""
    import pytest

    if jax.devices()[0].platform != "tpu":
        pytest.skip("needs the real chip (DMX_TEST_TPU=1)")
    for prec, bs, K, N in [(8, 16, 192, 300), (8, 64, 2048, 512), (4, 32, 256, 128)]:
        fmt = Format.from_shorthand(f"BFP[{prec}|8]{{{bs}}}(SN)")
        x = fmt.cast(randf(8, K), block_dim=-1)
        w = randf(N, K)
        packed = bfp_pack(w, prec, bs)
        want = np.asarray(bfp_linear_ref(x, packed))
        got = np.asarray(bfp_linear(x, packed, use_pallas=True))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)
