"""Bisect the serving engine's per-step wall cost on the real chip.

SERVING_r05 first capture: steady (no-admission) engine steps cost ~239 ms
for burst=16 x 8 slots, while bench.py's batch-8 decode runs ~1 ms/token —
the decode program itself should be ~15 ms.  This harness times each layer
of the engine step in isolation to attribute the other ~220 ms:

  rtt        — trivial dispatch + tiny readback (tunnel floor)
  upload     — jnp.asarray of the per-step host inputs
  decode     — the engine's exact jitted _decode dispatch + seq readback
  decode_nodonate — same jit without donated cstate
  bench_like — bench.py-shaped scan at the same shapes (scalar offsets,
               plain KVCache) for reference

Usage: python tools/diag_engine_step.py [opt-125m] [--burst 16]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from flax import nnx  # noqa: E402


def timeit(name, fn, reps=10):
    fn()  # compile / settle
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts = np.sort(ts)
    print(f"{name:22s} p50 {ts[len(ts)//2]*1e3:9.2f} ms   "
          f"min {ts[0]*1e3:9.2f} ms", flush=True)
    return float(ts[len(ts) // 2])


def main():
    from dmx_compressor_tpu.models.opt import OPTConfig, OPTForCausalLM
    from dmx_compressor_tpu.serving import ContinuousBatchingEngine
    from dmx_compressor_tpu.functional.approximate import NoApproximation
    from dmx_compressor_tpu.modeling.model import DmxModel
    from dmx_compressor_tpu.ops.compress import (
        compress_for_inference, set_inference_mode,
    )

    name = sys.argv[1] if len(sys.argv) > 1 else "opt-125m"
    burst = int(sys.argv[sys.argv.index("--burst") + 1]) if "--burst" in sys.argv else 16
    cfg = {"opt-125m": OPTConfig.opt_125m,
           "opt-1.3b": OPTConfig.opt_1_3b}[name]()
    model = OPTForCausalLM(cfg, rngs=nnx.Rngs(0))
    dm = DmxModel.from_raw(model)
    dm.to_basic_mode()
    for _, m in dm.named_dmx_modules():
        m.input_casts.set_format(["SAME"] * len(m.input_casts))
        m.output_casts.set_format(["SAME"] * len(m.output_casts))
        m.approximator.function = NoApproximation()
    compress_for_inference(dm)
    set_inference_mode(True)

    eng = ContinuousBatchingEngine(
        model, max_slots=8, max_len=96 + 64 + burst,
        prompt_buckets=(96,), quantized_kv=True,
    )
    eng.warmup(burst)
    rng = np.random.default_rng(0)
    for _ in range(8):
        eng.submit(rng.integers(1, cfg.vocab_size, (96,)).astype(np.int32),
                   max_new_tokens=64)
    eng.step(burst)  # admit all 8 + first burst
    assert all(s.active for s in eng.slots)

    # --- rtt floor ---------------------------------------------------
    one = jnp.ones((8,), jnp.float32)
    add = jax.jit(lambda x: x + 1)
    add(one)
    timeit("rtt (jit+readback)", lambda: np.asarray(add(one)))

    # --- per-step host uploads ---------------------------------------
    def uploads():
        toks = jnp.asarray([[s.last_token] for s in eng.slots], jnp.int32)
        temps = jnp.asarray([0.0] * 8, jnp.float32)
        np.asarray(toks); np.asarray(temps)
    timeit("upload toks+temps", uploads)

    # --- the engine's exact decode dispatch --------------------------
    fn = eng._decode(burst, False)
    mstate, cstate = eng._dstate
    toks0 = jnp.asarray([[s.last_token] for s in eng.slots], jnp.int32)

    def decode_step():
        nonlocal cstate, toks0
        cstate, toks0, seq = fn(mstate, cstate, toks0)
        np.asarray(seq)
    timeit(f"decode burst={burst}", decode_step)

    # --- without donation --------------------------------------------
    gd_m, gd_c = eng._graphdef

    def step_fn(mstate, cstate, toks, key, temps):
        def body(carry, _):
            cstate, toks, key = carry
            mod = nnx.merge(gd_m, mstate)
            caches = nnx.merge(gd_c, cstate)
            off = caches[0].lengths.value
            logits = mod(toks, caches=caches, position_offset=off)
            c2 = nnx.split(caches)[1]
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return (c2, nxt[:, None], key), nxt
        (cstate, _, _), seq = jax.lax.scan(
            body, (cstate, toks, key), None, length=burst)
        return cstate, seq.T

    nodon = jax.jit(step_fn)
    cstate2 = cstate

    def decode_nodonate():
        nonlocal cstate2
        toks = jnp.asarray([[s.last_token] for s in eng.slots], jnp.int32)
        eng._key, sub = jax.random.split(eng._key)
        temps = jnp.asarray([0.0] * 8, jnp.float32)
        cstate2, seq = nodon(mstate, cstate2, toks, sub, temps)
        np.asarray(seq)
    timeit("decode no-donate", decode_nodonate)

    # --- device-carried toks: no per-step uploads, key-free greedy ---
    def step_dev(mstate, cstate, toks):
        def body(carry, _):
            cstate, toks = carry
            mod = nnx.merge(gd_m, mstate)
            caches = nnx.merge(gd_c, cstate)
            off = caches[0].lengths.value
            logits = mod(toks, caches=caches, position_offset=off)
            c2 = nnx.split(caches)[1]
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return (c2, nxt[:, None]), nxt
        (cstate, toks), seq = jax.lax.scan(
            body, (cstate, toks), None, length=burst)
        return cstate, toks, seq.T

    dev = jax.jit(step_dev)
    cstate3 = cstate2
    toks_dev = jnp.asarray([[s.last_token] for s in eng.slots], jnp.int32)

    def decode_devtoks():
        nonlocal cstate3, toks_dev
        cstate3, toks_dev, seq = dev(mstate, cstate3, toks_dev)
        np.asarray(seq)
    timeit("decode dev-toks", decode_devtoks)

    # --- lagged readback: dispatch N+1 before reading N --------------
    cstate4, toks4 = cstate3, toks_dev
    pending = []

    def decode_lagged():
        nonlocal cstate4, toks4
        cstate4, toks4, seq = dev(mstate, cstate4, toks4)
        pending.append(seq)
        if len(pending) > 1:
            np.asarray(pending.pop(0))
    timeit("decode lagged-readback", decode_lagged)


if __name__ == "__main__":
    main()
