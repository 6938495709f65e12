"""Q/DQ compiler graphs: graph evaluation matches eager module output
(reference tests/test_qdq.py:8-30) + StableHLO export."""

import numpy as np
import jax.numpy as jnp
import pytest

import dmx_compressor_tpu as dmx
from dmx_compressor_tpu import nn as dmxnn
from dmx_compressor_tpu.transform.qdq import (
    evaluate_graph,
    export_stablehlo,
    make_compiler_graph,
    module_compiler_graph,
)

RNG = np.random.default_rng(0)


def randf(*shape):
    return jnp.asarray(RNG.standard_normal(shape).astype(np.float32))


@pytest.mark.parametrize("configure", [False, True])
def test_linear_graph_matches_module(configure):
    mod = dmxnn.Linear(64, 16)
    if configure:
        mod.configure(
            dict(
                input_formats=[dmx.format.BFP16_64],
                weight_format=dmx.format.BFP16_64,
                bias_format=dmx.format.BFP32_1,
                output_formats=[dmx.format.FLOAT16],
            )
        )
    g = mod.to_compiler_graph()
    x = randf(2, 64)
    got = np.asarray(evaluate_graph(g, mod, x))
    want = np.asarray(mod(x))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_resadd_graph_matches():
    mod = dmxnn.ResAdd()
    mod.configure(dict(input_formats=[dmx.format.FLOAT16, dmx.format.FLOAT16]))
    g = mod.to_compiler_graph()
    a, b = randf(4, 8), randf(4, 8)
    np.testing.assert_allclose(
        np.asarray(evaluate_graph(g, mod, a, b)), np.asarray(mod(a, b)), atol=1e-6
    )


def test_softmax_graph_matches():
    mod = dmxnn.Softmax(dim=-1)
    g = mod.to_compiler_graph()
    x = randf(4, 16)
    np.testing.assert_allclose(
        np.asarray(evaluate_graph(g, mod, x)), np.asarray(mod(x)), atol=1e-6
    )


def test_graph_has_qdq_annotations():
    mod = dmxnn.Linear(64, 16)
    mod.configure(dict(weight_format=dmx.format.BFP16_64))
    g = mod.to_compiler_graph()
    qnodes = [n for n in g.nodes if n.target == "dmx.quantize"]
    assert any(n.cast_format == "BFP[8|8]{64}(SN)" for n in qnodes)
    text = g.print_tabular()
    assert "quantize" in text and "dequantize" in text


def test_make_compiler_graph_over_model():
    from flax import nnx
    from dmx_compressor_tpu.modeling.model import DmxModel

    class Net(nnx.Module):
        def __init__(self):
            self.l1 = nnx.Linear(16, 8, rngs=nnx.Rngs(0))
            self.sm = __import__("dmx_compressor_tpu.rawnn", fromlist=["Softmax"]).Softmax()

        def __call__(self, x):
            return self.sm(self.l1(x))

    dm = DmxModel.from_raw(Net())
    dm.to_basic_mode()
    graphs = dm.make_compiler_graphs()
    assert "l1" in graphs and "sm" in graphs


def test_stablehlo_export():
    mod = dmxnn.Linear(64, 16)
    mod.configure(
        dict(input_formats=[dmx.format.BFP16_64], weight_format=dmx.format.BFP16_64)
    )
    from flax import nnx

    graphdef, state = nnx.split(mod)

    def fn(state, x):
        return nnx.merge(graphdef, state)(x)

    text = export_stablehlo(fn, state, jnp.ones((2, 64), jnp.float32))
    assert "stablehlo" in text or "module" in text
    assert "dot" in text  # the matmul survived lowering
