"""Format taxonomy: shorthand round-trips, bit-cost model, basic properties."""

import numpy as np
import jax.numpy as jnp
import pytest

from dmx_compressor_tpu.numerics.format import (
    Format,
    Same,
    FixedPoint,
    FloatingPoint,
    BlockFloatingPoint,
    ScaledBlockFloatingPoint,
    MXFP,
    MXINT,
)

SHORTHANDS = [
    "SAME",
    "XP[8,0](CSN)",
    "XP[4,0](CSN)",
    "XP[8,+4](CSN)",
    "FP[1|8|23,127](_N)",
    "FP[1|5|10,15](FN)",
    "FP[1|8|7,127](FN)",
    "FP[1|4|3,7](_N)",
    "FP[0|4|4,7](FN)",
    "BFP[8|8]{64}(SN)",
    "BFP[4|8]{128}(_N)",
    "BFP[24|8]{1}(SN)",
    "SBFP<XP[4,0](CSN)><FP[0|4|4,7](FN)>{16}",
    "MXFP8[E4M3]{32}",
    "MXFP6[E2M3]{64}",
    "MXFP4[E2M1]{128}",
    "MXINT8{32}",
    "MXINT4{64}",
]


@pytest.mark.parametrize("sh", SHORTHANDS)
def test_shorthand_roundtrip(sh):
    fmt = Format.from_shorthand(sh)
    assert repr(fmt) == sh
    assert repr(Format.from_shorthand(repr(fmt))) == sh


def test_types():
    assert isinstance(Format.from_shorthand("SAME"), Same)
    assert isinstance(Format.from_shorthand("XP[8,0](CSN)"), FixedPoint)
    assert isinstance(Format.from_shorthand("FP[1|4|3,7](_N)"), FloatingPoint)
    assert isinstance(Format.from_shorthand("BFP[8|8]{64}(SN)"), BlockFloatingPoint)
    assert isinstance(
        Format.from_shorthand("SBFP<XP[4,0](CSN)><FP[0|4|4,7](FN)>{16}"),
        ScaledBlockFloatingPoint,
    )
    assert isinstance(Format.from_shorthand("MXFP8[E4M3]{32}"), MXFP)
    assert isinstance(Format.from_shorthand("MXINT8{32}"), MXINT)


def test_bytes_per_elem():
    # BFP bytes/elem = (p + 8/B)/8 (reference format.py:345-347)
    assert Format.from_shorthand("BFP[8|8]{64}(SN)").bytes_per_elem == (8 + 8 / 64) / 8
    # SBFP = p/8 + scaler_bytes/B (reference format.py:481-486)
    sbfp = Format.from_shorthand("SBFP<XP[4,0](CSN)><FP[0|4|4,7](FN)>{16}")
    assert sbfp.bytes_per_elem == 4 / 8 + (4 + 4 + 1) / 8 / 16
    assert Format.from_shorthand("XP[8,0](CSN)").bytes_per_elem == 1.0
    assert Format.from_shorthand("SAME").bytes_per_elem is None


def test_bfp_ids():
    assert Format.from_shorthand("BFP[8|8]{64}(SN)").bfp_id == 10006
    assert Format.from_shorthand("BFP[24|8]{1}(SN)").bfp_id == 10001
    sbfp = Format.from_shorthand("SBFP<XP[4,0](CSN)><FP[0|4|4,7](FN)>{16}")
    assert sbfp.bfp_id == 10044


def test_same_cast_identity():
    x = jnp.arange(8, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(Same().cast(x)), np.asarray(x))


def test_float32_passthrough():
    fmt = Format.from_shorthand("FP[1|8|23,127](_N)")
    x = jnp.asarray(np.random.default_rng(0).standard_normal(64).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(fmt.cast(x)), np.asarray(x))


def test_fp16_flush_subnormal():
    fmt = Format.from_shorthand("FP[1|5|10,15](FN)")
    x = jnp.array([1e-5, 6.2e-5, 1.0], jnp.float32)
    out = np.asarray(fmt.cast(x))
    assert out[0] == 0.0
    assert out[1] != 0.0
    assert out[2] == 1.0


def test_unsigned_float_abs():
    fmt = Format.from_shorthand("FP[0|4|4,7](FN)")
    x = jnp.array([-1.0, 1.0], jnp.float32)
    out = np.asarray(fmt.cast(x))
    assert (out >= 0).all()


def test_mxint_is_bfp():
    # MXINT8{32} must equal symmetric-nearest BFP[8|8]{32}
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    a = Format.from_shorthand("MXINT8{32}").cast(x, block_dim=-1)
    b = Format.from_shorthand("BFP[8|8]{32}(SN)").cast(x, block_dim=-1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mxfp_scale_is_power_of_two():
    fmt = Format.from_shorthand("MXFP8[E4M3]{32}")
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 32)).astype(np.float32) * 100)
    out = np.asarray(fmt.cast(x, block_dim=-1))
    # every output must be elem * 2^k scale representable: check error bound
    assert np.abs(out - np.asarray(x)).max() <= np.abs(np.asarray(x)).max() * 2**-3


def test_formats_are_hashable_and_static():
    import jax

    fmt = Format.from_shorthand("BFP[8|8]{64}(SN)")
    assert hash(fmt) == hash(Format.from_shorthand("BFP[8|8]{64}(SN)"))

    @jax.jit
    def f(x):
        return fmt.cast(x, block_dim=-1)

    x = jnp.ones((2, 64), jnp.float32)
    f(x)  # must trace without error (fmt closed over as static)
