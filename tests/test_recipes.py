"""PTQ recipes: calibration, SmoothQuant, GPTQ, AFT, SLaNC
(reference tests/test_smoothquant.py, advanced recipe flows)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

import dmx_compressor_tpu as dmx
from dmx_compressor_tpu import nn as dmxnn
from dmx_compressor_tpu.advanced_recipe import (
    DmxModuleGPTQHyperparams,
    DmxModuleSmoothQuantHyperparams,
    DmxQuantizerCalibrationRecipe,
    DmxSmoothQuantRecipe,
    input_calibration_for_all_linears,
    smoothquant_for_all_linears,
)
from dmx_compressor_tpu.numerics.observer import MinMaxObserver

RNG = np.random.default_rng(0)


def randf(*shape, scale=1.0):
    return jnp.asarray((RNG.standard_normal(shape) * scale).astype(np.float32))


def test_smoothquant_migration():
    """Channel-perturbed inputs: smoothquant equalizes per-channel ranges
    (reference test_smoothquant.py:31-50)."""
    mod = dmxnn.Linear(16, 8)
    x = randf(32, 16)
    x = x.at[:, 0].multiply(100.0)  # channel outlier
    hp = DmxModuleSmoothQuantHyperparams(migration_strength=0.5, fuse_to_weight=False)
    with mod.calibrating_smoothquant(hp):
        mod(x)
    assert mod.smoothquant.enabled
    scale = np.asarray(mod.smoothquant.scale.value)
    assert scale.shape == (16,)
    assert scale[0] > scale[1:].max()  # outlier channel got the biggest scale
    # migration preserves the product within fp error
    y = np.asarray(mod(x))
    mod.smoothquant.disable()
    y_ref = np.asarray(mod(x))
    np.testing.assert_allclose(y, y_ref, rtol=2e-3, atol=2e-3)


def test_smoothquant_fuse_to_weight():
    mod = dmxnn.Linear(16, 8)
    x = randf(32, 16)
    w_before = np.asarray(mod.weight.value).copy()
    hp = DmxModuleSmoothQuantHyperparams(migration_strength=0.5, fuse_to_weight=True)
    with mod.calibrating_smoothquant(hp):
        mod(x)
    assert mod.smoothquant.fused_to_weight
    assert not np.allclose(np.asarray(mod.weight.value), w_before)


def test_quantizer_calibration_recipe():
    class Net(nnx.Module):
        def __init__(self):
            self.l1 = nnx.Linear(16, 8, rngs=nnx.Rngs(0))

        def __call__(self, x):
            return self.l1(x)

    from dmx_compressor_tpu.modeling.model import DmxModel

    net = Net()
    dm = DmxModel.from_raw(net)
    dm.configure(
        None,
        dmx.DmxConfigRule(
            module_types=(dmxnn.Linear,),
            module_config=dict(input_formats=[dmx.format.INT8]),
        ),
    )
    recipe = DmxQuantizerCalibrationRecipe(
        input_calibration_for_all_linears(observer_cls=MinMaxObserver)
    )
    x = randf(64, 16, scale=3.0)
    with recipe.applied_to(dm):
        dm(x)
    cast = dm.get_submodule("l1").input_casts["input_cast"]
    assert cast.fake_quant_enabled and not cast.observer_enabled
    assert float(cast.scale.value[0]) != 1.0
    # quantization error bounded by half a step
    y = np.asarray(cast(x))
    assert np.abs(y - np.asarray(x)).max() <= float(cast.scale.value[0]) * 0.5001


def test_gptq_reduces_quant_error():
    """GPTQ weight update should not increase layer output MSE vs plain
    round-to-nearest under the same format (usually reduces it)."""
    mod = dmxnn.Linear(64, 32)
    mod.configure(dict(weight_format=dmx.format.BFP12_64))  # 4-bit: visible error
    xs = [randf(32, 64) for _ in range(4)]
    w_orig = np.asarray(mod.weight.value).copy()

    # plain RTN error
    y_true = [np.asarray(x @ w_orig.T + np.asarray(mod.bias.value)) for x in xs]
    y_rtn = [np.asarray(mod(x)) for x in xs]
    mse_rtn = np.mean([(a - b) ** 2 for a, b in zip(y_true, y_rtn)])

    hp = DmxModuleGPTQHyperparams(microblock_size=64, block_size=64, percdamp=0.01)
    with mod.optimal_brain_compressing(hp):
        for x in xs:
            mod(x)
    y_gptq = [np.asarray(mod(x)) for x in xs]
    mse_gptq = np.mean([(a - b) ** 2 for a, b in zip(y_true, y_gptq)])
    assert np.isfinite(mse_gptq)
    assert mse_gptq <= mse_rtn * 1.05  # allow tiny noise, expect improvement


def test_aft_tunes_parameters():
    mod = dmxnn.Softmax(dim=-1)
    mod.configure(
        dict(
            approximation_function="SOFTMAX[vsimd]{input_clamp=-100}(max_adjust=0.5)"
        )
    )
    from dmx_compressor_tpu.advanced_recipe import (
        DmxModuleApproximationFunctionTuningHyperparams,
    )

    hp = DmxModuleApproximationFunctionTuningHyperparams(
        search_space=[("max_adjust", 0.0, 1.0)]
    )
    x = randf(8, 32)
    with mod.tuning_approximation_function(hp):
        mod(x)
    tuned = mod.approximator.function.extra_params["max_adjust"]
    assert 0.0 <= tuned <= 1.0


def test_slanc_injects_norm():
    ln = dmxnn.LayerNorm(16)
    ln.configure(dict(approximation_function="LAYER_NORM[vsimd]{}()"))
    prev = dmxnn.RMSNorm(16)
    fc1 = dmxnn.Linear(16, 32)
    fc2 = dmxnn.Linear(32, 16)
    from dmx_compressor_tpu.advanced_recipe import DmxModuleSLaNCHyperparams

    hp = DmxModuleSLaNCHyperparams(
        position="post_mlp", mlp_type="standard",
        prev_ln_weight=prev, fc1=fc1, fc2=fc2,
    )
    with ln.slanc_tuning(hp):
        pass
    assert "norm" in ln.approximator.function.extra_params
    norm = ln.approximator.function.extra_params["norm"]
    assert np.isfinite(norm) and norm > 0
    # forward still runs with the injected pre-scale
    y = ln(randf(4, 16))
    assert np.isfinite(np.asarray(y)).all()


def test_plugins_called():
    from dmx_compressor_tpu.plugins import ActivatePlugins, PluginBase

    calls = []

    class P(PluginBase):
        def process_layer(self, data):
            calls.append(type(data.mod).__name__)

    mod = dmxnn.Linear(8, 4)
    with ActivatePlugins(P()).applied_to(mod):
        mod(randf(2, 8))
    assert calls == ["Linear"]
    mod(randf(2, 8))
    assert calls == ["Linear"]  # deactivated after context exit
