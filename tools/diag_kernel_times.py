"""Per-kernel decode-step microbenchmarks on the real chip.

Times each BASIC decode building block standalone with a device-side
fori_loop (200 iters, data-dependent chaining so nothing is DCE'd).
Usage: python tools/diag_kernel_times.py [opt-125m]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 200


def timeit(name, f, *args):
    def loop(x, others):
        def body(i, c):
            return f(c, *others)

        return jax.lax.fori_loop(0, ITERS, body, x)

    jl = jax.jit(loop)
    out = jl(args[0], args[1:])
    _ = float(jnp.sum(out))
    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        out = jl(args[0], args[1:])
        _ = float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    us = best / ITERS * 1e6
    print(f"{name:34s} {us:8.1f} us/call", flush=True)
    return us


def main():
    from dmx_compressor_tpu.ops.basic_layer import fused_ln_linear
    from dmx_compressor_tpu.ops.basic_linear import fused_basic_linear
    from dmx_compressor_tpu.ops.basic_attention import (
        BasicSDPAParams, basic_sdpa_decode,
    )
    from dmx_compressor_tpu.ops.bfp_pack import bfp_pack, bfp_unpack

    name = sys.argv[1] if len(sys.argv) > 1 else "opt-125m"
    if name == "opt-125m":
        B, d, ffn, H, Dh, S, V = 8, 768, 3072, 12, 64, 192, 50272
    else:
        B, d, ffn, H, Dh, S, V = 8, 2048, 8192, 32, 64, 192, 50272

    rng = np.random.default_rng(0)

    def arr(*shape, s=0.5):
        return jnp.asarray(rng.standard_normal(shape) * s, jnp.float32)

    x = arr(B, d)
    w_qkv = arr(3 * d, d, s=0.05)
    w_out = arr(d, d, s=0.05)
    w_fc1 = arr(ffn, d, s=0.05)
    w_fc2 = arr(d, ffn, s=0.05)
    w_lm = arr(V, d, s=0.05)
    ln_w, ln_b = jnp.ones((d,)), jnp.zeros((d,))

    pk_qkv, pk_out = bfp_pack(w_qkv, 8, 64), bfp_pack(w_out, 8, 64)
    pk_fc1, pk_fc2 = bfp_pack(w_fc1, 8, 64), bfp_pack(w_fc2, 8, 64)
    pk_lm = bfp_pack(w_lm, 8, 64)
    bf_qkv = bfp_unpack(pk_qkv).astype(jnp.bfloat16)
    bf_out = bfp_unpack(pk_out).astype(jnp.bfloat16)
    bf_fc1 = bfp_unpack(pk_fc1).astype(jnp.bfloat16)
    bf_fc2 = bfp_unpack(pk_fc2).astype(jnp.bfloat16)
    bf_lm = bfp_unpack(pk_lm).astype(jnp.bfloat16)
    b_qkv, b_out = arr(3 * d, s=0.05), arr(d, s=0.05)
    b_fc1, b_fc2 = arr(ffn, s=0.05), arr(d, s=0.05)

    # --- baselines (XLA) ---
    timeit("xla qkv matmul", lambda c, w, b: (c @ w.T + b)[:, :d], x, w_qkv, b_qkv)
    timeit("xla fc1 matmul", lambda c, w, b: (c @ w.T + b)[:, :d], x, w_fc1, b_fc1)
    timeit("xla lm_head matmul", lambda c, w: (c @ w.T)[:, :d], x, w_lm)

    q = arr(B, H, 1, Dh)
    k = arr(B, H, S, Dh)
    v = arr(B, H, S, Dh)
    mask = jnp.zeros((1, S), jnp.float32)

    def xla_sdpa(c, k, v, m):
        s = jnp.einsum("bhtd,bhsd->bhts", c, k) * 0.125 + m
        w = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhts,bhsd->bhtd", w, v)

    timeit("xla sdpa decode", xla_sdpa, q, k, v, mask)

    params = BasicSDPAParams(wl=8, block=64, input_clamp=-100.0,
                             max_adjust=0.1141, kmax=15, use_exp_large=True)
    timeit(
        "fused basic sdpa", lambda c, k, v, m: basic_sdpa_decode(
            c, k, v, m, scale=0.125, params=params), q, k, v, mask,
    )

    # --- fused linear kernels (packed + bf16 variants) ---
    timeit("fused qkv (bf16 w)", lambda c, w, b: fused_basic_linear(
        c, w_bf16=w, bias=b, in_wl=8, in_block=64, out_fp16=True)[:, :d],
        x, bf_qkv, b_qkv)
    timeit("fused qkv (packed w)", lambda c, b: fused_basic_linear(
        c, packed=pk_qkv, bias=b, in_wl=8, in_block=64, out_fp16=True)[:, :d],
        x, b_qkv)
    timeit("fused out_proj (bf16 w)", lambda c, w, b: fused_basic_linear(
        c, w_bf16=w, bias=b, in_wl=8, in_block=64, out_fp16=True),
        x, bf_out, b_out)
    timeit("fused fc2 K=ffn (bf16 w)", lambda c, w, b: fused_basic_linear(
        jnp.tile(c, (1, ffn // d)), w_bf16=w, bias=b, in_wl=8, in_block=64,
        out_fp16=True), x, bf_fc2, b_fc2)
    timeit("fused lm_head (bf16 w)", lambda c, w: fused_basic_linear(
        c, w_bf16=w, bias=jnp.zeros((V,)), in_wl=8, in_block=64,
        out_fp16=True)[:, :d], x, bf_lm)
    timeit("fused lm_head (packed w)", lambda c: fused_basic_linear(
        c, packed=pk_lm, bias=jnp.zeros((V,)), in_wl=8, in_block=64,
        out_fp16=True)[:, :d], x)

    # --- LN mega-kernels ---
    timeit("ln+qkv (bf16 w)", lambda c, w, b: fused_ln_linear(
        c, w_bf16=w, bias=b, ln_w=ln_w, ln_b=ln_b, eps=1e-5, wl=8,
        in_block=64)[:, :d], x, bf_qkv, b_qkv)
    timeit("ln+qkv (packed w)", lambda c, b: fused_ln_linear(
        c, packed=pk_qkv, bias=b, ln_w=ln_w, ln_b=ln_b, eps=1e-5, wl=8,
        in_block=64)[:, :d], x, b_qkv)

    def ln_fc1(c, w, b, res):
        y, pre = fused_ln_linear(
            c, w_bf16=w, bias=b, ln_w=ln_w, ln_b=ln_b, eps=1e-5, wl=8,
            in_block=64, residual=res, relu=True, emit_pre=True)
        return y[:, :d] + pre

    timeit("resadd+ln+fc1+relu (bf16 w)", ln_fc1, x, bf_fc1, b_fc1, arr(B, d))

    # --- modular comparators ---
    from dmx_compressor_tpu.numerics.cast import CastTo
    from dmx_compressor_tpu.functional import simd_ops

    fp16a = CastTo(format="FP[1|5|10,15](FN)")
    fp16b = CastTo(format="FP[1|5|10,15](FN)")
    bfpc = CastTo(format="BFP[8|8]{64}(SN)", block_dim=-1)

    def modular_ln(c):
        return fp16b(simd_ops.layer_norm(fp16a(c), (d,), ln_w, ln_b, 1e-5))

    timeit("modular LN chain (XLA)", modular_ln, x)

    def modular_linear(c, w, b):
        y = jnp.matmul(bfpc(c).astype(jnp.bfloat16), w.T,
                       preferred_element_type=jnp.float32)
        return fp16a(y + b)[:, :d]

    timeit("modular qkv (XLA cast+matmul)", modular_linear, x, bf_qkv, b_qkv)


if __name__ == "__main__":
    main()
