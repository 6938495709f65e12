"""Native C++ quantization library: triple agreement C++ == JAX == oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from dmx_compressor_tpu import native

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="no C++ toolchain available"
)

RNG = np.random.default_rng(0)


def test_native_fixed_point_matches_jax():
    from dmx_compressor_tpu.numerics import rounding as R

    x = (RNG.standard_normal(2048) * 64).astype(np.float32)
    got = native.fixed_point_quantize_nearest(x, 8, 0, True, True)
    want = np.asarray(R.fixed_point_quantize(jnp.asarray(x), 8, 0, True, True, "nearest"))
    np.testing.assert_array_equal(got, want)


def test_native_float_matches_jax():
    from dmx_compressor_tpu.numerics import rounding as R

    x = (RNG.standard_normal(2048) * 8).astype(np.float32)
    for man, exp, bias in [(3, 4, 7), (10, 5, 15), (7, 8, 127)]:
        got = native.float_quantize_nearest(x, man, exp, bias, True)
        want = np.asarray(
            R.float_quantize(jnp.asarray(x), man, exp, bias, True, "nearest")
        )
        np.testing.assert_array_equal(got, want)


def test_native_block_matches_jax():
    from dmx_compressor_tpu.numerics import rounding as R

    blocks = (RNG.standard_normal((64, 64)) * 3).astype(np.float32)
    got = native.block_quantize_nearest(blocks, 8)
    want = np.asarray(R.block_quantize(jnp.asarray(blocks), 8, "nearest"))
    np.testing.assert_array_equal(got, want)


def test_native_pack_matches_jax_pack():
    from dmx_compressor_tpu.ops.bfp_pack import bfp_pack as jax_pack

    w = (RNG.standard_normal((32, 256)) * 2).astype(np.float32)
    man_c, exp_c = native.bfp_pack(w, 8, 64)
    p = jax_pack(jnp.asarray(w), 8, 64)
    np.testing.assert_array_equal(man_c, np.asarray(p.mantissa))
    np.testing.assert_array_equal(exp_c, np.asarray(p.exponent))
    rec = native.bfp_unpack(man_c, exp_c, 8, 64)
    from dmx_compressor_tpu.ops.bfp_pack import bfp_unpack

    np.testing.assert_array_equal(rec, np.asarray(bfp_unpack(p)))
