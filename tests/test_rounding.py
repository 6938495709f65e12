"""Bit-exactness tests for the rounding core against the float64 oracle and
the reference's published golden vectors (reference tests/test_bfp.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import oracle
from dmx_compressor_tpu.numerics import rounding as R
from dmx_compressor_tpu.numerics.format import Format

RNG = np.random.default_rng(0)


def rand_f32(shape, scale=4.0):
    x = (RNG.standard_normal(shape) * scale).astype(np.float32)
    return np.nan_to_num(x, posinf=3e38, neginf=-3e38)


# ---------------------------------------------------------------------------
# golden vectors from the reference test suite (tests/test_bfp.py:26-65)
# ---------------------------------------------------------------------------


def test_bfp16_1_rounding_golden():
    x = jnp.array([1.0, 1.0 + 2**-7, 1.0 + 2**-6, 1.0 + 2**-6 + 2**-7], jnp.float32)
    y = np.array([1.0, 1.0, 1.015625, 1.03125], np.float32)
    fmt = Format.from_shorthand("BFP[8|8]{1}(SN)")
    np.testing.assert_array_equal(np.asarray(fmt.cast(x)), y)
    np.testing.assert_array_equal(np.asarray(fmt.cast(-x)), -y)


def test_bfp12_1_rounding_golden():
    x = jnp.array([1.0, 1.0 + 2**-3, 1.0 + 2**-2, 1.0 + 2**-2 + 2**-3], jnp.float32)
    y = np.array([1.0, 1.0, 1.25, 1.5], np.float32)
    fmt = Format.from_shorthand("BFP[4|8]{1}(SN)")
    np.testing.assert_array_equal(np.asarray(fmt.cast(x)), y)
    np.testing.assert_array_equal(np.asarray(fmt.cast(-x)), -y)


def test_bfp16_1_atol():
    x = rand_f32((1, 1000), 1.0)
    x *= 0.5 / np.abs(x).max()
    x += 1.0
    fmt = Format.from_shorthand("BFP[8|8]{1}(SN)")
    for sgn in (1.0, -1.0):
        out = np.asarray(fmt.cast(jnp.asarray(sgn * x)))
        np.testing.assert_allclose(out, sgn * x, rtol=0.0, atol=2**-7)


# ---------------------------------------------------------------------------
# fixed point vs oracle
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("wl,fl", [(8, 0), (8, 4), (4, 0), (16, 8), (24, 0)])
@pytest.mark.parametrize("mode", ["nearest", "up", "down"])
@pytest.mark.parametrize("symmetric", [True, False])
def test_fixed_point_vs_oracle(wl, fl, mode, symmetric):
    x = rand_f32((512,), scale=2.0 ** (wl - fl - 2))
    # include exact ties
    ties = (np.arange(-20, 20, dtype=np.float32) + 0.5) * 2.0**-fl
    x = np.concatenate([x, ties])
    got = np.asarray(
        R.fixed_point_quantize(jnp.asarray(x), wl, fl, True, symmetric, mode)
    )
    want = oracle.fixed_point_quantize(x, wl, fl, True, symmetric, mode)
    np.testing.assert_array_equal(got, want.astype(np.float32))


# ---------------------------------------------------------------------------
# float quantize vs oracle
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "man,exp,bias",
    [(3, 4, 7), (2, 5, 15), (7, 8, 127), (10, 5, 15), (4, 4, 7), (4, 4, 12), (0, 8, 127)],
)
@pytest.mark.parametrize("flush", [True, False])
@pytest.mark.parametrize("mode", ["nearest", "up", "down"])
def test_float_quantize_vs_oracle(man, exp, bias, flush, mode):
    x = np.concatenate(
        [
            rand_f32((256,), 1.0),
            rand_f32((256,), 2.0 ** (2 ** (exp - 1) - 1)),  # near overflow
            rand_f32((256,), 2.0 ** (-bias)),  # subnormal region
            np.array([0.0, -0.0, 1.0, -1.0], np.float32),
            # exact ties at various exponents
            (1.0 + (np.arange(16, dtype=np.float32) * 2 + 1) * 2.0 ** -(man + 1)),
        ]
    ).astype(np.float32)
    got = np.asarray(R.float_quantize(jnp.asarray(x), man, exp, bias, flush, mode))
    want = oracle.float_quantize(x, man, exp, bias, flush, mode).astype(np.float32)
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# block quantize vs oracle
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("wl", [4, 6, 8, 16, 24])
@pytest.mark.parametrize("mode", ["nearest", "up", "down"])
def test_block_quantize_vs_oracle(wl, mode):
    if mode == "up" and wl > 16:
        # the up-bump at wl=24 lands on odd integers above 2^24, beyond fp32
        # (and beyond the reference kernel, whose bit arithmetic is UB there);
        # real BFP24+ formats use block_size==1 (the float path)
        pytest.skip("beyond the fp32/reference block-kernel domain")
    blocks = rand_f32((32, 64))
    blocks[0] *= 1e-20
    blocks[1] *= 1e20
    blocks[2] = 0.0
    # block whose max is just below a power of two (overflow-clip path)
    blocks[3] = np.linspace(-1.9999999, 1.9999999, 64, dtype=np.float32)
    got = np.asarray(R.block_quantize(jnp.asarray(blocks), wl, mode))
    want = oracle.block_quantize_blocks(blocks, wl, mode).astype(np.float32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("prec,bs", [(8, 64), (8, 16), (4, 32), (6, 128)])
@pytest.mark.parametrize("block_dim", [-1, 0, 1])
@pytest.mark.parametrize("symmetric", [True, False])
def test_bfp_cast_vs_oracle(prec, bs, block_dim, symmetric):
    x = rand_f32((4, 3, 100))  # 100: non-multiple of block size -> remainder path
    sh = f"BFP[{prec}|8]{{{bs}}}({'S' if symmetric else '_'}N)"
    fmt = Format.from_shorthand(sh)
    got = np.asarray(fmt.cast(jnp.asarray(x), block_dim=block_dim))
    want = oracle.bfp_cast(x, prec, bs, block_dim, symmetric).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_sbfp_cast_vs_oracle():
    x = rand_f32((8, 64))
    fmt = Format.from_shorthand("SBFP<XP[4,0](CSN)><FP[0|4|4,7](FN)>{16}")
    got = np.asarray(fmt.cast(jnp.asarray(x), block_dim=-1))
    want = oracle.sbfp_cast(x, 4, 4, 4, 7, 16, -1).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_stochastic_rounding_statistics():
    # stochastic rounding must be unbiased and land on the grid
    key = jax.random.key(0)
    x = jnp.full((100_000,), 0.3, jnp.float32)
    q = R.fixed_point_quantize(x, 8, 0, rounding="stochastic", key=key)
    vals = np.unique(np.asarray(q))
    assert set(vals).issubset({0.0, 1.0})
    assert abs(np.asarray(q).mean() - 0.3) < 0.01


def test_jit_and_grad_compatible():
    fmt = Format.from_shorthand("BFP[8|8]{16}(SN)")
    f = jax.jit(lambda x: fmt.cast(x, block_dim=-1))
    x = jnp.asarray(rand_f32((4, 64)))
    np.testing.assert_array_equal(np.asarray(f(x)), np.asarray(fmt.cast(x)))


@pytest.mark.parametrize("mode", ["nearest", "up", "down"])
def test_block_lastdim_fast_path_bit_equal(mode):
    """The layout-preserving fast path must be bit-identical to the blocked
    view path (and hence to the reference)."""
    x = rand_f32((4, 3, 128))
    x[0, 0, :64] = 0.0  # zero block
    slow = oracle.bfp_cast(x, 8, 64, -1, True, mode).astype(np.float32)
    fast = np.asarray(
        R.block_quantize_lastdim(jnp.asarray(x), 8, 64, mode)
    )
    np.testing.assert_array_equal(fast, slow)
    # through the Format API (which now routes to the fast path)
    fmt = Format.from_shorthand(f"BFP[8|8]{{64}}({'S'}{'N' if mode=='nearest' else mode[0].upper()})")
    got = np.asarray(fmt.cast(jnp.asarray(x), block_dim=-1))
    np.testing.assert_array_equal(got, slow)


def test_float16_fast_path_matches_generic():
    """Native-fp16 FLOAT16 cast == generic float_quantize on fp16-range
    values (the fast path deviates only above 65504, by design)."""
    x = rand_f32((4096,), scale=100.0)
    fmt = Format.from_shorthand("FP[1|5|10,15](FN)")
    got = np.asarray(fmt.cast(jnp.asarray(x)))
    want = np.asarray(
        R.float_quantize(jnp.asarray(x), 10, 5, 15, True, "nearest")
    )
    np.testing.assert_array_equal(got, want)
