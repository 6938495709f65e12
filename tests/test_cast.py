"""CastTo / observer / group-quant behavior (ports the reference's
test_group_quant.py / test_flexible_quant.py strategies)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dmx_compressor_tpu.numerics.cast import CastTo, CastToDict
from dmx_compressor_tpu.numerics.observer import MinMaxObserver
from dmx_compressor_tpu.numerics.format import Format


def test_same_cast_passthrough():
    c = CastTo()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 8)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(c(x)), np.asarray(x))


def test_bfp_cast_applies_format():
    c = CastTo(format="BFP[8|8]{16}(SN)", block_dim=-1)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 64)), jnp.float32)
    got = np.asarray(c(x))
    want = np.asarray(Format.from_shorthand("BFP[8|8]{16}(SN)").cast(x, block_dim=-1))
    np.testing.assert_array_equal(got, want)


def test_ste_gradient():
    c = CastTo(format="BFP[4|8]{16}(SN)")
    x = jnp.asarray(np.random.default_rng(1).standard_normal((64,)), jnp.float32)
    g = jax.grad(lambda t: jnp.sum(c(t) * 2.0))(x)
    np.testing.assert_allclose(np.asarray(g), 2.0)  # straight-through


def test_minmax_observer_per_tensor():
    obs = MinMaxObserver(dtype=Format.from_shorthand("XP[8,0](CSN)"))
    obs(jnp.asarray([-1.0, 3.0]))
    obs(jnp.asarray([-2.0, 1.0]))
    assert float(obs.min_val.value) == -2.0
    assert float(obs.max_val.value) == 3.0
    scale, zp = obs.calculate_qparams()
    # affine int8 (CSN qmin=-126..: symmetric format -> qmin=-127, qmax=127):
    # scale = (max - min)/(qmax - qmin), zp = qmin - round(min/scale)
    np.testing.assert_allclose(np.asarray(scale), 5.0 / 254, rtol=1e-6)
    assert int(zp[0]) == -127 - round(-2.0 / (5.0 / 254))

    obs_sym = MinMaxObserver(
        dtype=Format.from_shorthand("XP[8,0](CSN)"), qscheme="per_tensor_symmetric"
    )
    obs_sym(jnp.asarray([-1.0, 3.0]))
    obs_sym(jnp.asarray([-2.0, 1.0]))
    s_sym, zp_sym = obs_sym.calculate_qparams()
    np.testing.assert_allclose(np.asarray(s_sym), 3.0 / 127, rtol=1e-6)
    assert int(zp_sym[0]) == 0


def test_int8_calibration_roundtrip():
    """Affine int8 fake-quant after MinMax calibration recovers values within
    one scale step (reference test_group_quant.py strategy)."""
    c = CastTo(format="XP[8,0](C_N)", qscheme="per_tensor_affine")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1.0, 3.0, (128,)).astype(np.float32))
    c.enable_calibration(True, observer_cls=MinMaxObserver,
                         qscheme_to_overload="per_tensor_affine")
    c(x)
    c.enable_calibration(False)
    y = np.asarray(c(x))
    scale = float(c.scale.value[0])
    assert np.abs(y - np.asarray(x)).max() <= scale * 0.5001
    # quantized values must sit on the affine grid
    zp = int(c.zero_point.value[0])
    q = np.asarray(x) / scale + zp
    grid = (np.round(q) - zp) * scale
    np.testing.assert_allclose(y, grid.astype(np.float32), atol=scale * 1e-3)


@pytest.mark.parametrize("group_size", [16, 24])  # 24 does not divide 64
def test_group_quantization(group_size):
    """Per-group int4 quantization along the channel axis
    (reference test_group_quant.py:49-116)."""
    c = CastTo(format="XP[4,0](CSN)", qscheme="per_tensor_symmetric")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 64)).astype(np.float32)
    x[:, :16] *= 100.0  # first group has much larger range
    x = jnp.asarray(x)
    c.enable_calibration(
        True,
        observer_cls=MinMaxObserver,
        qscheme_to_overload="per_tensor_symmetric",
        group_size=group_size,
        ch_axis=-1,
    )
    c(x)
    c.enable_calibration(False)
    n_groups = -(-64 // group_size)
    assert c.scale.value.shape == (n_groups,)
    y = np.asarray(c(x))
    # each group must be quantized with its own scale: 7 levels symmetric
    scales = np.asarray(c.scale.value)
    for g in range(n_groups):
        lo, hi = g * group_size, min((g + 1) * group_size, 64)
        seg = y[:, lo:hi] / scales[g]
        np.testing.assert_allclose(seg, np.round(seg), atol=1e-4)
        assert np.abs(seg).max() <= 7 + 1e-4


def test_cast_to_dict_routing():
    d = CastToDict(
        {"input_cast": CastTo(format="BFP[8|8]{16}(SN)"), "residual_cast": CastTo()}
    )
    x = jnp.ones((4, 16), jnp.float32)
    r = jnp.ones((4, 16), jnp.float32) * 2
    out, args, kwargs = d(x, r)
    assert args[0].shape == (4, 16)
    d.set_format(["SAME", "BFP[8|8]{16}(SN)"])
    assert repr(d["input_cast"].format) == "SAME"
    assert repr(d["residual_cast"].format) == "BFP[8|8]{16}(SN)"


def test_pre_transform_shaping():
    c = CastTo(format="SAME")
    c.set_pre_transform({"shaping": [("view", (2, 8))]})
    x = jnp.arange(16, dtype=jnp.float32)
    y = c(x)
    assert y.shape == (16,)  # shape restored
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
