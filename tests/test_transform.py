"""Substitution transform + model API + config rules
(reference tests/test_transforms.py, test_fx_substitute.py,
test_additional_mappings.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

import dmx_compressor_tpu as dmx
from dmx_compressor_tpu import nn as dmxnn
from dmx_compressor_tpu import rawnn
from dmx_compressor_tpu.modeling.model import DmxModel, DmxConfig, DmxConfigRule


class LeNet(nnx.Module):
    """LeNet-5-ish reference test model (reference tests use LeNet)."""

    def __init__(self, rngs):
        self.conv1 = nnx.Conv(1, 6, (5, 5), padding="SAME", rngs=rngs)
        self.relu1 = rawnn.ReLU()
        self.pool1 = dmxnn.MaxPool2d(2, 2)
        self.conv2 = nnx.Conv(6, 16, (5, 5), padding="VALID", rngs=rngs)
        self.relu2 = rawnn.ReLU()
        self.pool2 = dmxnn.MaxPool2d(2, 2)
        self.fc1 = nnx.Linear(400, 120, rngs=rngs)
        self.relu3 = rawnn.ReLU()
        self.fc2 = nnx.Linear(120, 84, rngs=rngs)
        self.relu4 = rawnn.ReLU()
        self.fc3 = nnx.Linear(84, 10, rngs=rngs)

    def __call__(self, x):
        # x: [B, 1, 28, 28] NCHW
        h = x.transpose(0, 2, 3, 1)
        h = self.conv1(h).transpose(0, 3, 1, 2)
        h = self.pool1(self.relu1(h))
        h = h.transpose(0, 2, 3, 1)
        h = self.conv2(h).transpose(0, 3, 1, 2)
        h = self.pool2(self.relu2(h))
        h = h.reshape(h.shape[0], -1)
        h = self.relu3(self.fc1(h))
        h = self.relu4(self.fc2(h))
        return self.fc3(h)


class LeNetNCHW(nnx.Module):
    """Same network authored with Dmx-substitutable modules only."""

    def __init__(self, rngs):
        self.l1 = nnx.Linear(16, 32, rngs=rngs)
        self.act = rawnn.ReLU()
        self.l2 = nnx.Linear(32, 4, rngs=rngs)
        self.sm = rawnn.Softmax(dim=-1)

    def __call__(self, x):
        return self.sm(self.l2(self.act(self.l1(x))))


def test_substitute_replaces_modules():
    model = LeNetNCHW(nnx.Rngs(0))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16)), np.float32)
    y_raw = np.asarray(model(x))
    dm = DmxModel.from_raw(model)
    assert isinstance(model.l1, dmxnn.Linear)
    assert isinstance(model.act, dmxnn.ReLU)
    assert isinstance(model.sm, dmxnn.Softmax)
    y_dmx = np.asarray(dm(x))
    np.testing.assert_allclose(y_dmx, y_raw, atol=1e-6)  # SAME format by default


def test_lenet_substitution_and_basic_mode():
    model = LeNet(nnx.Rngs(0))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 1, 28, 28)), np.float32)
    y_raw = np.asarray(model(x))
    dm = DmxModel.from_raw(model)
    names = [n for n, _ in dm.named_dmx_modules()]
    assert "conv1" in names and "fc3" in names
    y_same = np.asarray(dm(x))
    np.testing.assert_allclose(y_same, y_raw, atol=1e-5)

    dm.to_basic_mode()
    assert repr(dm.get_submodule("fc1").weight_format) == "BFP[8|8]{64}(SN)"
    assert repr(dm.get_submodule("conv1").input_formats["input_cast"]) == "BFP[8|8]{64}(SN)"
    y_basic = np.asarray(dm(x))
    assert y_basic.shape == y_raw.shape
    err = np.abs(y_basic - y_raw).max()
    assert 0 < err < 1.0  # quantized but still close

    dm.to_baseline_mode()
    y_back = np.asarray(dm(x))
    np.testing.assert_allclose(y_back, y_raw, atol=1e-5)


def test_rule_name_regex():
    model = LeNetNCHW(nnx.Rngs(0))
    dm = DmxModel.from_raw(model)
    rule = DmxConfigRule(
        module_types=(dmxnn.Linear,),
        name_re=r"l1",
        module_config=dict(weight_format=dmx.format.BFP16_64),
    )
    dm.configure(None, rule)
    assert repr(dm.get_submodule("l1").weight_format) == "BFP[8|8]{64}(SN)"
    assert repr(dm.get_submodule("l2").weight_format) == "SAME"


def test_config_freeze_thaw(tmp_path):
    model = LeNetNCHW(nnx.Rngs(0))
    dm = DmxModel.from_raw(model)
    dm.to_basic_mode()
    f = str(tmp_path / "cfg.yaml")
    dm.freeze(f)

    model2 = LeNetNCHW(nnx.Rngs(0))
    dm2 = DmxModel.from_raw(model2)
    dm2.thaw(f)
    assert repr(dm2.get_submodule("l1").weight_format) == "BFP[8|8]{64}(SN)"
    assert (
        repr(dm2.get_submodule("sm").approximation_function)
        == repr(dm.get_submodule("sm").approximation_function)
    )
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16)), np.float32)
    np.testing.assert_allclose(np.asarray(dm(x)), np.asarray(dm2(x)), atol=1e-6)


def test_additional_mappings():
    """User-registered custom module mapping
    (reference tests/test_additional_mappings.py:13-29)."""

    class MyOp(nnx.Module):
        def __call__(self, x):
            return x * 2

    class DmxMyOp(dmxnn.DmxModule if hasattr(dmxnn, "DmxModule") else object):
        pass

    from dmx_compressor_tpu.nn.core import DmxModule

    class DmxMyOp(DmxModule):
        def _forward(self, x):
            return x * 2

        @classmethod
        def from_raw(cls, raw):
            return cls()

    class Net(nnx.Module):
        def __init__(self):
            self.op = MyOp()

        def __call__(self, x):
            return self.op(x)

    net = Net()
    dm = DmxModel.from_raw(net, additional_mappings={MyOp: DmxMyOp.from_raw})
    assert isinstance(net.op, DmxMyOp)
    x = jnp.ones((4,), jnp.float32)
    np.testing.assert_array_equal(np.asarray(dm(x)), 2.0)


def test_configuration_survives_reconfigure():
    """Calibrated scale state survives further configuration
    (reference tests/test_retransformation.py:39-50 analogue)."""
    from dmx_compressor_tpu.numerics.observer import MinMaxObserver

    model = LeNetNCHW(nnx.Rngs(0))
    dm = DmxModel.from_raw(model)
    l1 = dm.get_submodule("l1")
    l1.configure(dict(input_formats=[dmx.format.INT8]))
    cast = l1.input_casts["input_cast"]
    cast.enable_calibration(True, observer_cls=MinMaxObserver,
                            qscheme_to_overload="per_tensor_affine")
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16)), np.float32)
    dm(x)
    cast.enable_calibration(False)
    scale_before = float(cast.scale.value[0])
    assert scale_before != 1.0
    dm.to_basic_mode()
    dm.configure(None, DmxConfigRule(
        module_types=(dmxnn.Linear,),
        module_config=dict(input_formats=[dmx.format.INT8]),
    ))
    assert float(dm.get_submodule("l1").input_casts["input_cast"].scale.value[0]) == scale_before


def test_dmx_config_roundtrip():
    model = LeNetNCHW(nnx.Rngs(0))
    dm = DmxModel.from_raw(model)
    dm.to_basic_mode()
    cfg = DmxConfig.from_model(dm.module)
    assert "l1" in cfg
    assert repr(cfg["l1"]["weight_format"]) == "BFP[8|8]{64}(SN)"


def test_op_set():
    model = LeNetNCHW(nnx.Rngs(0))
    dm = DmxModel.from_raw(model)
    assert {"Linear", "ReLU", "Softmax"} <= dm.op_set


def test_compiled_forward():
    model = LeNetNCHW(nnx.Rngs(0))
    dm = DmxModel.from_raw(model)
    dm.to_basic_mode()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16)), np.float32)
    f = dm.compiled()
    np.testing.assert_allclose(np.asarray(f(x)), np.asarray(dm(x)), atol=1e-6)


def test_gemma_norm_and_clipped_gelu_substitution():
    class Net(nnx.Module):
        def __init__(self):
            self.norm = rawnn.GemmaRMSNorm(16)
            self.act = rawnn.ClippedGELU(-5, 5)

        def __call__(self, x):
            return self.act(self.norm(x))

    net = Net()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16)), np.float32)
    y_raw = np.asarray(net(x))
    dm = DmxModel.from_raw(net)
    assert type(net.norm).__name__ == "GemmaRMSNorm"
    assert type(net.act).__name__ == "ClippedGELU"
    from dmx_compressor_tpu.nn.core import DmxModule

    assert isinstance(net.norm, DmxModule) and isinstance(net.act, DmxModule)
    np.testing.assert_allclose(np.asarray(dm(x)), y_raw, atol=1e-5)
