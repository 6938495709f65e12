"""Orbax checkpoint/resume (utils/checkpoint.py): params + quantizer state +
optimizer state + config tree, unsharded and sharded (SURVEY §5
"checkpoint/resume" TPU equivalent; the reference has only per-module pickle
state-dicts, core.py:112-132)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from dmx_compressor_tpu.utils.checkpoint import (
    CheckpointManager,
    restore_checkpoint,
    restored_config,
    save_checkpoint,
)

RNG = np.random.default_rng(0)


def _tiny_opt(seed=0):
    from dmx_compressor_tpu.models.opt import OPTConfig, OPTForCausalLM

    cfg = OPTConfig(vocab_size=128, hidden_size=32, ffn_dim=64,
                    num_hidden_layers=2, num_attention_heads=2,
                    max_position_embeddings=64)
    return cfg, OPTForCausalLM(cfg, rngs=nnx.Rngs(seed))


def test_roundtrip_params_and_quant_state(tmp_path):
    from dmx_compressor_tpu.modeling.model import DmxModel

    cfg, model = _tiny_opt(0)
    dm = DmxModel.from_raw(model)
    dm.to_basic_mode()
    # poke calibrated-looking quantizer state so the checkpoint must carry it
    _, lin = next(iter(
        (n, m) for n, m in dm.named_dmx_modules() if "fc1" in n
    ))
    lin.input_casts["input_cast"].scale.value = jnp.asarray([0.123], jnp.float32)

    ids = jnp.asarray(RNG.integers(0, 128, (2, 9)), jnp.int32)
    want = model(ids)
    save_checkpoint(tmp_path / "ck", model, step=7)

    cfg2, model2 = _tiny_opt(1)  # different init
    dm2 = DmxModel.from_raw(model2)
    dm2.to_basic_mode()
    assert not np.allclose(np.asarray(model2(ids)), np.asarray(want))
    step, _ = restore_checkpoint(tmp_path / "ck", model2)
    assert step == 7
    np.testing.assert_array_equal(np.asarray(model2(ids)), np.asarray(want))
    _, lin2 = next(iter(
        (n, m) for n, m in dm2.named_dmx_modules() if "fc1" in n
    ))
    np.testing.assert_array_equal(
        np.asarray(lin2.input_casts["input_cast"].scale.value),
        np.asarray([0.123], np.float32),
    )


def test_config_tree_recorded(tmp_path):
    from dmx_compressor_tpu.modeling.model import DmxModel

    _, model = _tiny_opt(0)
    dm = DmxModel.from_raw(model)
    dm.to_basic_mode()
    save_checkpoint(tmp_path / "ck", model)
    cfg = restored_config(tmp_path / "ck")
    assert cfg is not None and len(cfg) > 0
    # a BASIC-mode linear records the BFP input format in the frozen config
    fc1 = next(v for k, v in cfg.items() if "fc1" in k)
    assert "BFP" in repr(fc1.get("input_formats", ""))


def test_optimizer_resume_bit_exact(tmp_path):
    import optax

    _, model = _tiny_opt(0)
    graphdef, params = nnx.split(model)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    ids = jnp.asarray(RNG.integers(0, 128, (2, 8)), jnp.int32)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = nnx.merge(graphdef, p)(ids)
            return jnp.mean(jnp.square(logits))

        g = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    for _ in range(2):
        params, opt_state = step(params, opt_state)
    nnx.update(model, params)
    save_checkpoint(tmp_path / "ck", model, optimizer_state=opt_state, step=2)
    # continue 2 -> 4 directly
    p_direct, s_direct = params, opt_state
    for _ in range(2):
        p_direct, s_direct = step(p_direct, s_direct)

    # fresh process analogue: new model/opt state, restore, continue 2 -> 4
    _, model2 = _tiny_opt(1)
    graphdef2, params2 = nnx.split(model2)
    opt_state2 = tx.init(params2)
    step_no, opt_state2 = restore_checkpoint(
        tmp_path / "ck", model2, optimizer_state=opt_state2
    )
    assert step_no == 2
    p_resume = nnx.split(model2)[1]
    for _ in range(2):
        p_resume, opt_state2 = step(p_resume, opt_state2)

    for a, b in zip(jax.tree.leaves(p_direct), jax.tree.leaves(p_resume)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_roundtrip_preserves_placement(tmp_path):
    from dmx_compressor_tpu.parallel.mesh import make_mesh, shard_state

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    _, model = _tiny_opt(0)
    mesh = make_mesh((2, 2), ("dp", "tp"))
    graphdef, state = nnx.split(model)
    state = shard_state(state, mesh, warn_on_fallback=False)
    nnx.update(model, state)
    specs = {
        "/".join(str(p) for p in path): leaf.value.sharding
        for path, leaf in nnx.to_flat_state(nnx.state(model))
        if isinstance(leaf.value, jax.Array)
    }
    save_checkpoint(tmp_path / "ck", model, step=1)

    _, model2 = _tiny_opt(1)
    g2, s2 = nnx.split(model2)
    s2 = shard_state(s2, mesh, warn_on_fallback=False)
    nnx.update(model2, s2)
    restore_checkpoint(tmp_path / "ck", model2)

    for path, leaf in nnx.to_flat_state(nnx.state(model2)):
        if not isinstance(leaf.value, jax.Array):
            continue
        key = "/".join(str(p) for p in path)
        assert leaf.value.sharding.is_equivalent_to(
            specs[key], leaf.value.ndim
        ), f"sharding lost on {key}"
    ids = jnp.asarray(RNG.integers(0, 128, (2, 9)), jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(model2(ids)), np.asarray(_tiny_opt(0)[1](ids))
    )


def test_restore_into_never_run_model(tmp_path):
    """Transient per-forward diagnostics (approximation_error) must not be
    checkpointed: a model that has run forwards must restore into a fresh
    model that never has."""
    from dmx_compressor_tpu.modeling.model import DmxModel

    _, model = _tiny_opt(0)
    DmxModel.from_raw(model).to_basic_mode()
    ids = jnp.asarray(RNG.integers(0, 128, (2, 9)), jnp.int32)
    want = model(ids)  # creates approximation_error buffers
    save_checkpoint(tmp_path / "ck", model)

    _, model2 = _tiny_opt(1)
    DmxModel.from_raw(model2).to_basic_mode()
    restore_checkpoint(tmp_path / "ck", model2)  # no forward beforehand
    np.testing.assert_array_equal(np.asarray(model2(ids)), np.asarray(want))


def test_manager_retention_and_latest(tmp_path):
    _, model = _tiny_opt(0)
    mgr = CheckpointManager(tmp_path / "run", max_to_keep=2)
    for s in (1, 2, 3):
        mgr.save(s, model)
    assert mgr.steps() == [2, 3]
    step, _ = mgr.restore_latest(model)
    assert step == 3
