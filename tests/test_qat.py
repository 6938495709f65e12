"""Quantization-aware training end to end: STE gradients flow through the
full BASIC fake-quant pipeline (casts + approximations + sparsifiers) and
optimization makes progress (reference trains through its fake-quant
modules the same way: CastToFormat STE backward, cast.py:30-32)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import nnx

from dmx_compressor_tpu.modeling.model import DmxModel


def test_qat_basic_loss_decreases():
    from dmx_compressor_tpu.models.opt import OPTConfig, OPTForCausalLM, loss_fn

    cfg = OPTConfig.tiny()
    model = OPTForCausalLM(cfg, rngs=nnx.Rngs(0))
    dm = DmxModel.from_raw(model)
    dm.to_basic_mode()
    batch = jnp.asarray(
        np.random.RandomState(0).randint(0, cfg.vocab_size, (4, 16)), jnp.int32
    )
    dm(batch)  # eager warmup materializes lazy state (sparsifier scores)

    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_of(params):
            mod = nnx.merge(graphdef, params, rest)
            return loss_fn(mod(batch), batch)

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, grads

    losses = []
    for _ in range(12):
        params, opt_state, loss, grads = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # STE: the quantized forward must still backpropagate useful signal
    assert losses[-1] < losses[0] - 0.1, losses

    # gradients reach the quantized weights themselves (not just embeddings)
    flat = jax.tree_util.tree_leaves_with_path(grads)
    proj_grads = [
        float(jnp.abs(g).max())
        for path, g in flat
        if g.size
        and "q_proj" in ".".join(str(getattr(p, "key", p)) for p in path)
    ]
    assert proj_grads and max(proj_grads) > 0.0


def test_qat_sparsity_sticks_through_training():
    """BTOPK-masked weights stay N:M sparse while training (the mask
    re-derives from scores each forward; reference Sparsify backward
    modes)."""
    from dmx_compressor_tpu import DmxConfigRule
    from dmx_compressor_tpu import nn as dmxnn

    class Net(nnx.Module):
        def __init__(self):
            self.l1 = nnx.Linear(32, 64, rngs=nnx.Rngs(0))
            self.l2 = nnx.Linear(64, 8, rngs=nnx.Rngs(1))

        def __call__(self, x):
            return self.l2(jax.nn.relu(self.l1(x)))

    net = Net()
    dm = DmxModel.from_raw(net)
    dm.configure(
        None,
        DmxConfigRule(
            module_types=(dmxnn.Linear,),
            module_config=dict(weight_sparseness="BTOPK{4:8,-1}(U)"),
        ),
    )
    x = jnp.asarray(np.random.RandomState(0).randn(16, 32), jnp.float32)
    y = jnp.asarray(np.random.RandomState(1).randn(16, 8), jnp.float32)
    dm(x)  # eager warmup materializes the lazy sparsifier scores

    graphdef, params, rest = nnx.split(net, nnx.Param, ...)
    tx = optax.sgd(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_of(params):
            mod = nnx.merge(graphdef, params, rest)
            return jnp.mean((mod(x) - y) ** 2)

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    l0 = None
    for i in range(10):
        params, opt_state, loss = step(params, opt_state)
        l0 = l0 if l0 is not None else float(loss)
    assert float(loss) < l0
    nnx.update(net, params)
    eff = np.asarray(dm.get_submodule("l1").effective_weight)
    blocks = eff.reshape(64, -1, 8)
    nz = (blocks != 0).sum(-1)
    assert (nz <= 4).all(), "effective weight must stay 4:8 sparse"
