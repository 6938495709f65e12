"""Multi-chip sharding on the virtual 8-device CPU mesh: TP/DP execution of
the quantized model, sharding rules for quantized params."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx
from jax.sharding import NamedSharding, PartitionSpec as P

from dmx_compressor_tpu.parallel.mesh import (
    TRANSFORMER_RULES,
    data_sharding,
    make_mesh,
    shard_state,
    spec_for_path,
)


def test_mesh_and_rules():
    mesh = make_mesh((2, 4), ("dp", "tp"))
    assert mesh.shape == {"dp": 2, "tp": 4}
    assert spec_for_path("model.decoder.layers.0.self_attn.q_proj.weight") == P("tp", None)
    assert spec_for_path("model.decoder.layers.0.self_attn.out_proj.weight") == P(None, "tp")
    assert spec_for_path("model.decoder.layers.0.self_attn_layer_norm.weight") == P()


def test_sharded_quantized_forward_matches_single_device():
    """BASIC-mode OPT forward under dp x tp sharding == unsharded result."""
    from dmx_compressor_tpu.modeling.model import DmxModel
    from dmx_compressor_tpu.models.opt import OPTConfig, OPTForCausalLM

    cfg = OPTConfig.tiny()
    model = OPTForCausalLM(cfg, rngs=nnx.Rngs(0))
    dm = DmxModel.from_raw(model)
    dm.to_basic_mode()
    x = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (4, 8)), jnp.int32)
    ref = np.asarray(dm(x))

    mesh = make_mesh((2, 2), ("dp", "tp"))
    graphdef, state = nnx.split(model)
    state = shard_state(state, mesh)

    def fwd(state, ids):
        return nnx.merge(graphdef, state)(ids)

    with mesh:
        xs = jax.device_put(x, data_sharding(mesh))
        out = jax.jit(fwd)(state, xs)
        got = np.asarray(out)
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_tp_sharding_preserves_bfp_blocks():
    """Sharding the input-channel dim of a BFP64-blocked weight keeps whole
    blocks per shard (shard size multiple of block size)."""
    mesh = make_mesh((1, 4), ("dp", "tp"))
    w = jnp.zeros((32, 512))  # in=512, tp=4 -> 128 per shard, block 64 ✓
    sharded = jax.device_put(w, NamedSharding(mesh, P(None, "tp")))
    shard_cols = 512 // 4
    assert shard_cols % 64 == 0
    assert sharded.sharding.shard_shape(w.shape) == (32, shard_cols)


def test_packed_bfp_sharding_colocates_scales():
    """Packed mantissas and exponents shard consistently along out dim."""
    from dmx_compressor_tpu.ops.bfp_pack import bfp_pack, bfp_unpack

    mesh = make_mesh((1, 4), ("dp", "tp"))
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    p = bfp_pack(w, 8, 64)
    man = jax.device_put(p.mantissa, NamedSharding(mesh, P("tp", None)))
    exp = jax.device_put(p.exponent, NamedSharding(mesh, P("tp", None)))
    # reconstruct under sharding: must equal unsharded reconstruction
    rec = np.asarray(bfp_unpack(p._replace(mantissa=man, exponent=exp)))
    np.testing.assert_array_equal(rec, np.asarray(bfp_unpack(p)))
