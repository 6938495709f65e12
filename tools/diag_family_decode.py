"""Ablation decomposition of a family's benched decode scan, on the real chip.

Reuses bench.build/bench.run verbatim (so the measured path IS the benched
path) and re-times the generate scan with components ablated via
monkeypatch:

  full   — as benched
  head   — LM-head matmul replaced by zeros (out_features >= 100k only):
           isolates the tied-head cost (qwen3/gemma: 152k/256k vocab)
  attn   — cached_attend returns q: removes the SDPA chain, the cache
           update, and therefore the mutated-carry copy of the KV cache

Written for the round-4 qwen3-0.6b BASIC anomaly (0.44x fp32 in
BENCH_CAMPAIGN_r04.jsonl while llama-1.1b BASIC is 1.10x): the deltas say
whether the head, the attention/cache, or the residual per-layer overhead
is eating the step.

Usage: python tools/diag_family_decode.py [family] [mode] [ablations...]
       python tools/diag_family_decode.py qwen3-0.6b basic full head attn
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench

bench.enable_compile_cache()


def run_ablated(name: str, mode: str, ablate: str, batch=8, prompt_len=128,
                gen_len=65, reps=3):
    import dmx_compressor_tpu.ops.flash_decode as FD
    from dmx_compressor_tpu.nn import modules as dmxnn
    from dmx_compressor_tpu.ops import compress as C

    saved = []

    def patch(obj, attr, fn):
        saved.append((obj, attr, getattr(obj, attr)))
        setattr(obj, attr, fn)

    if ablate == "head":
        def mk(orig):
            def patched(self, x, *a, **k):
                if self.out_features >= 100_000:
                    return jnp.zeros(
                        (*x.shape[:-1], self.out_features), x.dtype
                    )
                return orig(self, x, *a, **k)

            return patched

        patch(C.PackedBFPLinear, "__call__", mk(C.PackedBFPLinear.__call__))
        patch(dmxnn.Linear, "__call__", mk(dmxnn.Linear.__call__))
    elif ablate == "attn":
        def no_attend(sdpa, q, k, v, cache, attn_mask, **kw):
            return q

        patch(FD, "cached_attend", no_attend)
    elif ablate != "full":
        raise SystemExit(f"unknown ablation {ablate!r}")

    try:
        cfg = bench.model_config(name)
        qkv = mode in ("weights", "sbfp")
        rates, _ = bench.run(
            mode, cfg, batch=batch, prompt_len=prompt_len, gen_len=gen_len,
            reps=reps, quantized_kv=qkv, name=name,
        )
    finally:
        for obj, attr, fn in saved:
            setattr(obj, attr, fn)
    toks = float(np.median(rates))
    ms_step = batch * 1e3 / toks
    return toks, ms_step


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "qwen3-0.6b"
    mode = sys.argv[2] if len(sys.argv) > 2 else "basic"
    ablations = sys.argv[3:] or ["full", "head", "attn"]
    print(f"# {name} {mode} batch=8 prompt=128 gen=64")
    base_ms = None
    for ab in ablations:
        toks, ms = run_ablated(name, mode, ab)
        delta = "" if base_ms is None else f"  (saves {base_ms - ms:6.3f} ms)"
        if ab == "full":
            base_ms = ms
        print(f"{ab:6s} {toks:10.1f} tok/s  {ms:7.3f} ms/step{delta}")


if __name__ == "__main__":
    main()
