"""model_maker-contract benchmark harness (reference benchmark.py:30-531):
prepare_model mode wrapping, measure_model_runtime per-layer tables + vsimd
deltas, measure_model_accuracy, collect_layer_activations and
measure_model_error per-layer comparisons."""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from dmx_compressor_tpu.modeling.model import DmxModel
from dmx_compressor_tpu.utils.benchmark import (
    EVALUATION_MODE,
    collect_layer_activations,
    compute_error,
    gather_tensors,
    measure_model_accuracy,
    measure_model_error,
    measure_model_runtime,
    prepare_model,
    vsimd_ops_deltas,
)


from dmx_compressor_tpu import rawnn


class Net(nnx.Module):
    def __init__(self):
        rngs = nnx.Rngs(0)
        self.l1 = nnx.Linear(16, 32, rngs=rngs)
        self.softmax = rawnn.Softmax()  # carries a surrogate under BASIC
        self.l2 = nnx.Linear(32, 8, rngs=rngs)

    def __call__(self, x):
        return self.l2(self.softmax(self.l1(x)))


X = jnp.asarray(np.random.default_rng(0).standard_normal((4, 16)), jnp.float32)


def model_maker():
    model = Net()

    def model_runner(m):
        return m(X)

    def model_evaluator(m, desc):
        out = m(X)
        return {"mean_abs": float(jnp.mean(jnp.abs(out)))}

    return model, model_runner, model_evaluator


def test_prepare_model_vanilla_passthrough():
    model, runner, _ = model_maker()
    out, vsimd = prepare_model(model, EVALUATION_MODE.VANILLA, runner)
    assert out is model and vsimd == {}


def test_prepare_model_basic_records_vsimd_modules():
    model, runner, _ = model_maker()
    dm, vsimd = prepare_model(model, EVALUATION_MODE.BASIC, runner)
    assert isinstance(dm, DmxModel)
    # softmax carries an approximation surrogate under BASIC
    assert any("Softmax" in t for t in vsimd), vsimd


def test_prepare_model_novsimd_strips():
    from dmx_compressor_tpu.functional.approximate import NoApproximation

    model, runner, _ = model_maker()
    dm, vsimd = prepare_model(model, EVALUATION_MODE.BASIC_NOVSIMD, runner)
    assert vsimd  # recorded before stripping (the delta denominator)
    for _, m in dm.named_dmx_modules():
        assert isinstance(m.approximator.function, NoApproximation)


def test_measure_model_runtime_tables(capsys):
    modes = [
        EVALUATION_MODE.VANILLA,
        EVALUATION_MODE.BASIC_NOVSIMD,
        EVALUATION_MODE.BASIC,
    ]
    results = measure_model_runtime(model_maker, modes, n_measure_runs=2)
    out = capsys.readouterr().out
    assert "total time (s)" in out and "VSIMD operations" in out
    basic = results[EVALUATION_MODE.BASIC.value]
    assert basic["total_time"] > 0
    assert basic["per_layer_times"]  # every DmxModule timed
    assert results[EVALUATION_MODE.VANILLA.value]["per_layer_times"] == {}
    deltas = vsimd_ops_deltas(results)
    assert deltas is not None and any("Softmax" in k for k in deltas)


def test_measure_model_accuracy_table(capsys):
    modes = [EVALUATION_MODE.VANILLA, EVALUATION_MODE.BASIC]
    results = measure_model_accuracy(model_maker, modes)
    out = capsys.readouterr().out
    assert "| metric |" in out
    assert set(results) == {"Vanilla", "Basic"}
    # BASIC fake-quant perturbs but does not destroy the output
    v = results["Vanilla"]["mean_abs"]
    b = results["Basic"]["mean_abs"]
    assert v > 0 and abs(v - b) / v < 0.5


def test_collect_layer_activations_and_error():
    mods, acts, out = collect_layer_activations(model_maker, EVALUATION_MODE.BASIC)
    assert set(mods) == set(acts) and len(acts) >= 2
    for rec in acts.values():
        assert rec.outputs
    # vanilla: no DmxModules
    m0, a0, out0 = collect_layer_activations(model_maker, EVALUATION_MODE.VANILLA)
    assert m0 == {} and a0 == {}
    err = compute_error(out, out0)
    assert err["maxdelta"] > 0  # BASIC quantization is visible
    assert err["mse"] < 1.0


def test_measure_model_error_per_layer(capsys):
    results = measure_model_error(
        model_maker,
        [EVALUATION_MODE.BASIC],
        reference_mode=EVALUATION_MODE.BASELINE,
    )
    out = capsys.readouterr().out
    assert "(final output)" in out
    rec = results[EVALUATION_MODE.BASIC.value]
    assert rec["per_layer"] and rec["final_output"]["maxdelta"] > 0
    # BASELINE == SAME formats: BASIC's error must be bounded fake-quant
    # noise, not garbage
    assert rec["final_output"]["mse"] < 1.0


def test_gather_tensors_nested():
    t = jnp.ones((2,))
    got = gather_tensors({"a": [t, (t,)], "b": {"c": t}})
    assert len(got) == 3
