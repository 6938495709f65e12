"""Multi-chip scaling harness: tokens/s at mesh sizes 1..N with TP/DP.

On a real TPU slice this measures ICI scaling efficiency (the >= 85%
target); under XLA_FLAGS=--xla_force_host_platform_device_count=8 it
validates the sharded program end-to-end on a virtual CPU mesh (numbers are
then about correctness, not performance).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from dmx_compressor_tpu.modeling.model import DmxModel
from dmx_compressor_tpu.models.opt import OPTConfig, OPTForCausalLM
from dmx_compressor_tpu.parallel.mesh import data_sharding, make_mesh, shard_state


def measure(mesh_shape, cfg, batch=8, seq=128, reps=3):
    dp, tp = mesh_shape
    mesh = make_mesh((dp, tp), ("dp", "tp"))
    model = OPTForCausalLM(cfg, rngs=nnx.Rngs(0))
    dm = DmxModel.from_raw(model)
    dm.to_basic_mode()
    graphdef, state = nnx.split(model)
    state = shard_state(state, mesh)

    def fwd(state, ids):
        return nnx.merge(graphdef, state)(ids)

    f = jax.jit(fwd)
    rng = np.random.default_rng(0)
    with mesh:
        ids = jax.device_put(
            jnp.asarray(rng.integers(0, cfg.vocab_size, (batch * dp, seq)), jnp.int32),
            data_sharding(mesh),
        )
        from dmx_compressor_tpu.utils.benchmark import device_sync

        device_sync(f(state, ids))  # compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            device_sync(f(state, ids))
            best = min(best, time.perf_counter() - t0)
    return batch * dp * seq / best


def main():
    n = len(jax.devices())
    cfg = OPTConfig.tiny() if jax.devices()[0].platform == "cpu" else OPTConfig.opt_125m()
    base = measure((1, 1), cfg)
    print(f"1 chip: {base:,.0f} tok/s")
    shapes = []
    if n >= 2:
        shapes += [(2, 1), (1, 2)]
    if n >= 4:
        shapes += [(2, 2), (4, 1)]
    if n >= 8:
        shapes += [(4, 2), (8, 1)]
    for dp, tp in shapes:
        t = measure((dp, tp), cfg)
        eff = t / (base * dp * tp)
        print(f"dp={dp} tp={tp}: {t:,.0f} tok/s  scaling efficiency {eff:.1%}")


if __name__ == "__main__":
    main()
