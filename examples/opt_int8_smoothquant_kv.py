"""OPT with INT8 group-quant weights + SmoothQuant calibration + quantized
KV cache — the BASELINE.md config #3 recipe, end to end (offline shapes).

Flow (reference analogue: examples/model_calibration.py + the north-star
additions):
  1. build OPT, substitute to Dmx modules
  2. INT8 per-group weight quantization (group_size=64, MinMax-calibrated)
  3. static SmoothQuant calibration on synthetic batches (fused to weight)
  4. greedy decode through the int8 quantized KV cache
  5. report perplexity deltas vs fp32
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

import dmx_compressor_tpu as dmx
from dmx_compressor_tpu import nn as dmxnn
from dmx_compressor_tpu.advanced_recipe import (
    DmxQuantizerCalibrationRecipe,
    DmxSmoothQuantRecipe,
    smoothquant_for_all_linears,
)
from dmx_compressor_tpu.advanced_recipe import (
    CastCalibrationHyperparams,
    DmxModuleQuantizerCalibrationHyperparams,
)
from dmx_compressor_tpu.modeling.hf import do_forward_on
from dmx_compressor_tpu.models.opt import OPTConfig, OPTForCausalLM
from dmx_compressor_tpu.numerics.observer import MinMaxObserver
from dmx_compressor_tpu.transform.substitute import named_dmx_modules


def weight_group_calibration(group_size=64):
    """Calibrate every Linear's weight cast per-group (INT8-group weights)."""

    def gen(model):
        mods = {}
        for _, m in named_dmx_modules(
            model.module if hasattr(model, "module") else model
        ):
            if isinstance(m, dmxnn.Linear):
                mods[m] = DmxModuleQuantizerCalibrationHyperparams(
                    weight=CastCalibrationHyperparams(
                        observer_cls=MinMaxObserver,
                        qscheme_to_overload="per_tensor_symmetric",
                        group_size=group_size,
                        ch_axis=-1,
                    )
                )
        return mods

    return gen


def main():
    rng = np.random.default_rng(0)
    cfg = OPTConfig.tiny()
    model = OPTForCausalLM(cfg, rngs=nnx.Rngs(0))
    eval_ids = rng.integers(0, cfg.vocab_size, 512)
    ppl_fp32 = do_forward_on(model, eval_ids, max_length=32)["perplexity"]

    dm = dmx.DmxModel.from_raw(model)
    # INT8 group-quant weights
    dm.configure(
        None,
        dmx.DmxConfigRule(
            module_types=(dmxnn.Linear,),
            module_config=dict(weight_format=dmx.format.INT8),
        ),
    )
    calib_ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 32)), jnp.int32)

    # SmoothQuant first (migrates activation outliers into weights)...
    with DmxSmoothQuantRecipe(
        smoothquant_for_all_linears(migration_strength=0.5, fuse_to_weight=True)
    ).applied_to(dm):
        dm(calib_ids)
    # ...then calibrate the per-group weight scales on the smoothed weights
    with DmxQuantizerCalibrationRecipe(weight_group_calibration(64)).applied_to(dm):
        dm(calib_ids)

    ppl_q = do_forward_on(model, eval_ids, max_length=32)["perplexity"]
    print(f"fp32 ppl {ppl_fp32:.3f} | int8-group+smoothquant ppl {ppl_q:.3f} "
          f"| delta {ppl_q - ppl_fp32:+.4f}")

    # greedy decode through the INT8 quantized KV cache
    B, T, G = 2, 8, 8
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
    caches = model.init_cache(B, T + G, quantized=True)
    graphdef, state = nnx.split((model, caches))

    @jax.jit
    def run(state, ids):
        mod, cs = nnx.merge(graphdef, state)
        logits = mod(ids, caches=cs, position_offset=0)
        _, state = nnx.split((mod, cs))
        tok = jnp.argmax(logits[:, -1], axis=-1)

        def body(carry, i):
            state, tok = carry
            mod, cs = nnx.merge(graphdef, state)
            lg = mod(tok[:, None], caches=cs, position_offset=T + i)
            _, s2 = nnx.split((mod, cs))
            return (s2, jnp.argmax(lg[:, -1], axis=-1)), tok

        (_, tok), toks = jax.lax.scan(body, (state, tok), jnp.arange(G - 1))
        return jnp.concatenate([toks.T, tok[:, None]], axis=1)

    gen = run(state, ids)
    print("generated (int8 KV cache):", np.asarray(gen))


if __name__ == "__main__":
    main()
