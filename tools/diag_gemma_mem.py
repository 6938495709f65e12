"""Stage-by-stage HBM residency of the gemma-2b bench build, on the chip.

gemma-2b OOM'd in the round-4 campaign even after the single-copy packed
storage fix; this prints device bytes_in_use after each build stage to find
the hog.

Usage: python tools/diag_gemma_mem.py [family] [mode]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

import bench

bench.enable_compile_cache()


def mem(tag):
    st = jax.devices()[0].memory_stats() or {}
    used = st.get("bytes_in_use", 0) / 1e9
    peak = st.get("peak_bytes_in_use", 0) / 1e9
    import collections
    import gc

    gc.collect()
    by_shape = collections.Counter()
    total = 0
    for a in jax.live_arrays():
        b = a.size * a.dtype.itemsize
        by_shape[(a.shape, str(a.dtype))] += b
        total += b
    top = ", ".join(
        f"{s}{d}:{b/1e9:.2f}" for (s, d), b in by_shape.most_common(6)
    )
    print(
        f"{tag:16s} stats {used:6.2f}/{peak:6.2f} GB  live {total/1e9:6.2f} GB"
        f"  top: {top}",
        flush=True,
    )


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "gemma-2b"
    mode = sys.argv[2] if len(sys.argv) > 2 else "basic"
    batch, prompt_len, gen_len = 8, 128, 65

    from dmx_compressor_tpu.modeling.model import DmxModel
    from dmx_compressor_tpu.functional.approximate import NoApproximation
    from dmx_compressor_tpu.ops.compress import (
        compress_for_inference,
        set_inference_mode,
    )

    mem("start")
    cfg = bench.model_config(name)
    model = bench.make_model(name, cfg)
    jax.block_until_ready(nnx.state(model))
    mem("raw model")
    dm = DmxModel.from_raw(model)
    jax.block_until_ready(nnx.state(model))
    mem("substituted")
    dm.to_basic_mode()
    if mode == "weights":
        for _, m in dm.named_dmx_modules():
            m.input_casts.set_format(["SAME"] * len(m.input_casts))
            m.output_casts.set_format(["SAME"] * len(m.output_casts))
            m.approximator.function = NoApproximation()
    compress_for_inference(dm)
    set_inference_mode(True)
    import gc

    gc.collect()
    jax.block_until_ready(nnx.state(model))
    mem("compressed")
    caches = model.init_cache(
        batch, prompt_len + gen_len - 1,
        dtype=jnp.float16, split_base_len=prompt_len,
    )
    mem("caches")
    graphdef, state = nnx.split((model, caches))

    def prefill(state, ids):
        mod, cs = nnx.merge(graphdef, state)
        logits = mod(ids, caches=cs, position_offset=0)
        _, new_state = nnx.split((mod, cs))
        mx = jnp.max(logits[:, -1], axis=-1)
        return new_state, mx

    rng = np.random.default_rng(0)
    ids = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (batch, prompt_len)), jnp.int32
    )
    f = jax.jit(prefill, donate_argnums=0)
    try:
        compiled = f.lower(state, ids).compile()
        ma = compiled.memory_analysis()
        if ma is not None:
            print(
                f"prefill program: args {ma.argument_size_in_bytes/1e9:.2f} "
                f"out {ma.output_size_in_bytes/1e9:.2f} "
                f"temp {ma.temp_size_in_bytes/1e9:.2f} GB", flush=True,
            )
        state, mx = compiled(state, ids)
        _ = float(jnp.sum(mx))
        mem("after prefill")
    except Exception as e:
        print("prefill failed:", type(e).__name__, str(e)[:200], flush=True)
        mem("at failure")


if __name__ == "__main__":
    main()
