"""Does lax.scan over layer-stacked params beat an unrolled layer loop?

VERDICT r4 #4 proposed attacking qwen3's dispatch-bound decode by
scanning over stacked decoder layers.  This probe measures the
hypothesis directly at qwen3-0.6b decode shapes: a 28-layer chain of
(qkv matmul -> elementwise surrogate chain -> o matmul -> gateup matmul
-> silu-ish chain -> down matmul), identical math, three lowerings:

  unrolled — python loop over per-layer params (today's model forward)
  scanned  — one lax.scan over [L, ...]-stacked params
  scanned2 — lax.scan with unroll=2

If the per-layer wall cost is the same, the layer-loop lowering is NOT
the bottleneck and the refactor is pointless (fusion count per layer is).

Usage: python tools/diag_scan_vs_unroll.py
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

from dmx_compressor_tpu.ops.basic_layer import (  # noqa: E402
    rms_norm_surrogate_fp16,
    silu_surrogate_fp16,
)
from dmx_compressor_tpu.ops.basic_linear import (  # noqa: E402
    _fp16_cast_f32,
    cast_blocked_lastdim,
)

L, B, d, ffn, qkv_out = 28, 8, 1024, 3072, 4096


def layer(x, p):
    """Representative qwen3 BASIC decode layer body (matmul shapes +
    cast/surrogate chains; attention matmuls stand in as the o-proj)."""
    h = rms_norm_surrogate_fp16(x, p["ln1"], 1e-6)
    h = cast_blocked_lastdim(h, 64, 16)
    a = _fp16_cast_f32(jnp.matmul(h.astype(jnp.bfloat16), p["wqkv"],
                                  preferred_element_type=jnp.float32))
    a = _fp16_cast_f32(a[:, :d] * 0.5 + a[:, d:2 * d])  # stand-in mix
    o = _fp16_cast_f32(jnp.matmul(
        cast_blocked_lastdim(a, 64, 16).astype(jnp.bfloat16), p["wo"],
        preferred_element_type=jnp.float32))
    r = _fp16_cast_f32(x + o)
    h = rms_norm_surrogate_fp16(r, p["ln2"], 1e-6)
    g = _fp16_cast_f32(jnp.matmul(
        cast_blocked_lastdim(h, 64, 16).astype(jnp.bfloat16), p["wg"],
        preferred_element_type=jnp.float32))
    g = silu_surrogate_fp16(g[:, :ffn]) * g[:, ffn:]
    y = _fp16_cast_f32(jnp.matmul(
        cast_blocked_lastdim(g, 64, 16).astype(jnp.bfloat16), p["wd"],
        preferred_element_type=jnp.float32))
    return _fp16_cast_f32(r + y)


def make_params(rng, stacked):
    def w(*sh):
        a = jnp.asarray(rng.standard_normal(sh) * 0.02, jnp.bfloat16)
        return a

    def one():
        return {
            "ln1": jnp.ones((d,), jnp.float32),
            "ln2": jnp.ones((d,), jnp.float32),
            "wqkv": w(d, qkv_out),
            "wo": w(d, d),
            "wg": w(d, 2 * ffn),
            "wd": w(ffn, d),
        }

    if not stacked:
        return [one() for _ in range(L)]
    ps = [one() for _ in range(L)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *ps)


def timeit(name, jfn, *args, iters=20):
    out = jfn(*args)
    float(jnp.sum(out))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jfn(*args)
        float(jnp.sum(out))
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:12s} {best * 1e3:8.3f} ms/step "
          f"({best / L * 1e6:6.1f} us/layer)", flush=True)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, d)), jnp.float32)

    plist = make_params(rng, stacked=False)

    @jax.jit
    def unrolled(x):
        for p in plist:
            x = layer(x, p)
        return x

    pstack = make_params(rng, stacked=True)

    @jax.jit
    def scanned(x, ps):
        def body(c, p):
            return layer(c, p), None
        c, _ = jax.lax.scan(body, x, ps)
        return c

    @jax.jit
    def scanned2(x, ps):
        def body(c, p):
            return layer(c, p), None
        c, _ = jax.lax.scan(body, x, ps, unroll=2)
        return c

    timeit("unrolled", unrolled, x)
    timeit("scanned", scanned, x, pstack)
    timeit("scan-unroll2", scanned2, x, pstack)


if __name__ == "__main__":
    main()
