"""End-to-end PTQ walkthrough (the reference examples/model_calibration.py
flow, offline-friendly): build OPT, apply BASIC rules, calibrate input
quantizers + SmoothQuant on synthetic data, measure perplexity deltas."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp
from flax import nnx

import dmx_compressor_tpu as dmx
from dmx_compressor_tpu import nn as dmxnn
from dmx_compressor_tpu.advanced_recipe import (
    DmxQuantizerCalibrationRecipe,
    DmxSmoothQuantRecipe,
    input_calibration_for_all_linears,
    smoothquant_for_all_linears,
)
from dmx_compressor_tpu.modeling.hf import do_forward_on
from dmx_compressor_tpu.models.opt import OPTConfig, OPTForCausalLM
from dmx_compressor_tpu.numerics.observer import MinMaxObserver


def main():
    rng = np.random.default_rng(0)
    cfg = OPTConfig.tiny()
    model = OPTForCausalLM(cfg, rngs=nnx.Rngs(0))
    eval_ids = rng.integers(0, cfg.vocab_size, 512)

    ppl_fp32 = do_forward_on(model, eval_ids, max_length=32)["perplexity"]
    print(f"fp32 perplexity: {ppl_fp32:.3f}")

    dm = dmx.DmxModel.from_raw(model)
    dm.to_basic_mode()
    ppl_basic = do_forward_on(model, eval_ids, max_length=32)["perplexity"]
    print(f"BASIC (uncalibrated) perplexity: {ppl_basic:.3f}")

    # add INT8 input quantization + calibrate
    dm.configure(
        None,
        dmx.DmxConfigRule(
            module_types=(dmxnn.Linear,),
            module_config=dict(input_formats=[dmx.format.INT8]),
        ),
    )
    calib = DmxQuantizerCalibrationRecipe(
        input_calibration_for_all_linears(observer_cls=MinMaxObserver)
    )
    calib_ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 32)), jnp.int32)
    with calib.applied_to(dm):
        dm(calib_ids)

    sq = DmxSmoothQuantRecipe(smoothquant_for_all_linears(migration_strength=0.5))
    with sq.applied_to(dm):
        dm(calib_ids)

    ppl_calib = do_forward_on(model, eval_ids, max_length=32)["perplexity"]
    print(f"BASIC + INT8-in (calibrated, smoothquant) perplexity: {ppl_calib:.3f}")
    print(f"delta vs fp32: {ppl_calib - ppl_fp32:+.4f}")


if __name__ == "__main__":
    main()
