"""Continuous-batching serving throughput (serving/engine.py).

Measures aggregate decode tokens/s of the slot engine under a Poisson-less
closed-loop workload (every slot kept busy: a new request is queued the
moment one finishes) — the slot-utilization counterpart of bench.py's
fixed-batch decode numbers.  Configurations:

    python examples/serving_bench.py [opt-125m|opt-1.3b] [raw|weights] \
        [--slots N] [--burst N] [--requests N]

``weights`` packs BFP16_64 weights + int8 KV (the headline serving config)
before starting the engine.  Prints one JSON line with tokens/s and slot
utilization.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from flax import nnx


def main():
    # persistent compile cache (explicit, never at import time — the r4
    # import-time mutation in bench.py poisoned unrelated test processes)
    if jax.default_backend() != "cpu":
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    from dmx_compressor_tpu.models.opt import OPTConfig, OPTForCausalLM
    from dmx_compressor_tpu.serving import ContinuousBatchingEngine

    name = sys.argv[1] if len(sys.argv) > 1 else "opt-125m"
    mode = sys.argv[2] if len(sys.argv) > 2 else "weights"

    def arg(flag, default):
        return int(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv else default

    slots = arg("--slots", 8)
    burst = arg("--burst", 16)
    n_requests = arg("--requests", 32)
    prompt_len = arg("--prompt", 96)
    gen_len = arg("--gen", 64)
    chunk = arg("--chunk", 0) or None  # chunked-prefill admission
    # chunk cadence: keep prompt consumption in step with a burst-token
    # decode cadence (each chunk remains its own bounded dispatch)
    cps = arg("--cps", 0) or (max(1, burst // chunk) if chunk else 1)
    depth = arg("--depth", 1)  # in-flight decode steps (pipelined readback)

    cfg = {"opt-125m": OPTConfig.opt_125m, "opt-350m": OPTConfig.opt_350m,
           "opt-1.3b": OPTConfig.opt_1_3b}[name]()
    model = OPTForCausalLM(cfg, rngs=nnx.Rngs(0))
    quantized_kv = False
    if mode == "weights":
        from dmx_compressor_tpu.functional.approximate import NoApproximation
        from dmx_compressor_tpu.modeling.model import DmxModel
        from dmx_compressor_tpu.ops.compress import (
            compress_for_inference,
            set_inference_mode,
        )

        dm = DmxModel.from_raw(model)
        dm.to_basic_mode()
        for _, m in dm.named_dmx_modules():
            m.input_casts.set_format(["SAME"] * len(m.input_casts))
            m.output_casts.set_format(["SAME"] * len(m.output_casts))
            m.approximator.function = NoApproximation()
        compress_for_inference(dm)
        set_inference_mode(True)
        quantized_kv = True

    rng = np.random.default_rng(0)
    eng = ContinuousBatchingEngine(
        model, max_slots=slots, max_len=prompt_len + gen_len + burst,
        prompt_buckets=(prompt_len,), quantized_kv=quantized_kv,
        prefill_chunk=chunk, chunks_per_step=cps, pipeline_depth=depth,
    )
    prompts = [
        rng.integers(1, cfg.vocab_size, (prompt_len,)).astype(np.int32)
        for _ in range(n_requests)
    ]
    # compile every dispatch shape (all chunk offsets + finalize + decode)
    # BEFORE the timed loop: on tunneled TPUs one remote compile is minutes,
    # and a production engine warms up at startup, not per request
    eng.warmup(burst)

    # closed loop via the engine's own queue: everything is enqueued up
    # front and _admit pulls a waiting request the moment a slot frees
    # (the old submit-on-finish loop cost every turnover one extra burst
    # of slot idle time — readback lag + one full engine step).
    # --spread varies generation lengths 0.75x-1.25x (deterministic):
    # uniform lengths make every slot finish in the same step, so
    # admissions arrive in synchronized waves that idle the whole fleet
    # at once — real workloads stagger, which is exactly the regime
    # chunked prefill is for
    spread = "--spread" in sys.argv
    n = len(prompts)
    for i, p in enumerate(prompts):
        g = (
            int(gen_len * (0.75 + 0.5 * ((i * 7) % n) / max(n - 1, 1)))
            if spread else gen_len
        )
        eng.submit(p, max_new_tokens=max(g, 1))

    def emitted():
        return sum(len(r.tokens) for r in eng.finished) + sum(
            len(s.generated) for s in eng.slots if s.active
        )

    base = emitted()
    step_times = []  # per-engine-step wall time (p99 = admission-latency
    # bound: a waiting request is admitted within one step)
    steady_times = []  # steps that did NO admission/prefill work — the
    # steady-state decode cadence resident requests experience
    busy_slot_steps = 0
    total_slot_steps = 0
    t0 = time.perf_counter()
    while (eng.queue or eng._prefilling or eng._pending
           or any(s.active for s in eng.slots)):
        ts = time.perf_counter()
        eng.step(burst)
        dt_step = time.perf_counter() - ts
        step_times.append(dt_step)
        if not (eng.last_step_admissions or eng.last_step_chunks):
            steady_times.append(dt_step)
        busy_slot_steps += sum(1 for s in eng.slots if s.active)
        total_slot_steps += slots
    dt = time.perf_counter() - t0
    total_gen = emitted() - base
    st = np.sort(np.asarray(step_times))
    sst = np.sort(np.asarray(steady_times if steady_times else step_times))
    print(json.dumps({
        "metric": f"{name}_{mode}_serving_tokens_per_sec",
        "value": round(total_gen / dt, 2),
        "unit": "tokens/s",
        "slots": slots,
        "burst": burst,
        "prefill_chunk": chunk,
        "chunks_per_step": cps if chunk else None,
        "pipeline_depth": depth,
        "prompt_len": prompt_len,
        "gen_len": gen_len,
        "requests": len(eng.finished),
        "slot_utilization": round(busy_slot_steps / max(total_slot_steps, 1), 3),
        "p50_step_ms": round(float(st[len(st) // 2]) * 1e3, 2),
        "p99_step_ms": round(float(st[min(int(len(st) * 0.99), len(st) - 1)]) * 1e3, 2),
        "steady_p50_step_ms": round(float(sst[len(sst) // 2]) * 1e3, 2),
        "steady_p99_step_ms": round(
            float(sst[min(int(len(sst) * 0.99), len(sst) - 1)]) * 1e3, 2),
        "steady_steps": len(steady_times),
        "wall_s": round(dt, 3),
    }))


if __name__ == "__main__":
    main()
