"""Diagnose the BASIC-mode decode step: kernel counts + component ablations.

Compiles ONE decode step (no scan) for opt-125m under different configs and
reports: #fusions, #custom-calls (pallas), wall time per step.

Usage: python tools/diag_basic_decode.py [opt-125m]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


def build_step(mode: str, cfg, batch=8, prompt_len=128):
    from dmx_compressor_tpu.modeling.model import DmxModel
    from dmx_compressor_tpu.models.opt import OPTForCausalLM
    from dmx_compressor_tpu.functional.approximate import NoApproximation
    from dmx_compressor_tpu.ops.compress import (
        compress_for_inference,
        set_inference_mode,
    )
    from dmx_compressor_tpu.numerics.format import Same

    model = OPTForCausalLM(cfg, rngs=nnx.Rngs(0))
    dm = DmxModel.from_raw(model)
    S = prompt_len + 64

    if mode != "baseline":
        dm.to_basic_mode()
        if mode == "basic_nosdpa":
            # strip casts+approx from SDPA submodules only
            for name, m in dm.named_dmx_modules():
                if "sdpa" in name:
                    m.input_casts.set_format(["SAME"] * len(m.input_casts))
                    m.output_casts.set_format(["SAME"] * len(m.output_casts))
                    m.approximator.function = NoApproximation()
        if mode == "basic_linonly":
            from dmx_compressor_tpu.nn import modules as dmxnn

            for name, m in dm.named_dmx_modules():
                if not isinstance(m, dmxnn.Linear):
                    m.input_casts.set_format(["SAME"] * len(m.input_casts))
                    m.output_casts.set_format(["SAME"] * len(m.output_casts))
                    m.approximator.function = NoApproximation()
        if mode == "basic_nofuse":
            import dmx_compressor_tpu.ops.compress as C

            C.PackedBFPLinear._fusable = lambda self, x: False
        compress_for_inference(dm)
        set_inference_mode(True)
    caches = model.init_cache(batch, S, quantized=False)
    graphdef, state = nnx.split((model, caches))

    def step(state, tok):
        mod, cs = nnx.merge(graphdef, state)
        logits = mod(tok[:, None], caches=cs, position_offset=prompt_len)
        _, s2 = nnx.split((mod, cs))
        return s2, jnp.argmax(logits[:, -1], axis=-1)

    tok = jnp.zeros((batch,), jnp.int32)
    f = jax.jit(step, donate_argnums=0)
    lowered = f.lower(state, tok)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    n_fusion = hlo.count(" fusion(")
    n_cc = hlo.count("custom-call")
    # timing
    s2, t2 = f(state, tok)
    _ = float(jnp.sum(t2))
    times = []
    for _i in range(20):
        t0 = time.perf_counter()
        s2, t2 = f(s2, t2)
        _ = float(jnp.sum(t2))
        times.append(time.perf_counter() - t0)
    return n_fusion, n_cc, min(times) * 1e3


def main():
    from dmx_compressor_tpu.models.opt import OPTConfig

    name = sys.argv[1] if len(sys.argv) > 1 else "opt-125m"
    cfg = {
        "opt-125m": OPTConfig.opt_125m,
        "opt-1.3b": OPTConfig.opt_1_3b,
    }[name]()
    for mode in ("baseline", "basic", "basic_nofuse", "basic_nosdpa", "basic_linonly"):
        nf, ncc, ms = build_step(mode, cfg)
        print(f"{mode:16s} fusions={nf:4d} custom_calls={ncc:4d} step={ms:7.3f} ms")


if __name__ == "__main__":
    main()
