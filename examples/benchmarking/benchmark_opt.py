"""Per-mode runtime/error benchmark for OPT (the reference
examples/benchmarking/benchmark_llama.py flow, offline: random weights)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np
from flax import nnx

from dmx_compressor_tpu.modeling.model import DmxModel
from dmx_compressor_tpu.models.opt import OPTConfig, OPTForCausalLM
from dmx_compressor_tpu.utils.benchmark import (
    EVALUATION_MODE,
    configure_mode,
    markdown_table,
    mode_output_error,
    measure_runtime,
)


def main():
    cfg = OPTConfig.tiny()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 32)), jnp.int32)

    model = OPTForCausalLM(cfg, rngs=nnx.Rngs(0))
    outputs = {EVALUATION_MODE.VANILLA.value: model(x)}
    runtimes = {
        EVALUATION_MODE.VANILLA.value: {
            "total_runtime_s": measure_runtime(model, x, reps=3)
        }
    }

    dm = DmxModel.from_raw(model)
    for mode in [
        EVALUATION_MODE.BASELINE,
        EVALUATION_MODE.FP8,
        EVALUATION_MODE.BASIC,
        EVALUATION_MODE.BASIC_NOVSIMD,
    ]:
        configure_mode(dm, mode)
        outputs[mode.value] = dm(x)
        runtimes[mode.value] = {"total_runtime_s": measure_runtime(dm, x, reps=3)}

    print(markdown_table(runtimes, "Per-mode runtime"))
    print()
    print(markdown_table(mode_output_error(outputs), "Output error vs Vanilla"))


if __name__ == "__main__":
    main()
