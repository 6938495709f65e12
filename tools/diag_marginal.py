"""Marginal per-kernel cost on the real chip: time fori_loop bodies with 1
vs 4 chained calls; the delta/3 cancels the ~130us per-iteration floor of
the tunneled platform.  Usage: python tools/diag_marginal.py [opt-125m]"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 100


def t_loop(f, reps, *args):
    def loop(x, others):
        def body(i, c):
            for _ in range(reps):
                c = f(c, *others)
            return c

        return jax.lax.fori_loop(0, ITERS, body, x)

    jl = jax.jit(loop)
    out = jl(args[0], args[1:]); _ = float(jnp.sum(out))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = jl(args[0], args[1:]); _ = float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def marginal(name, f, *args):
    t1 = t_loop(f, 1, *args)
    t4 = t_loop(f, 4, *args)
    us = (t4 - t1) / 3 * 1e6
    print(f"{name:36s} {us:8.1f} us marginal", flush=True)
    return us


def main():
    from dmx_compressor_tpu.ops.basic_layer import fused_ln_linear
    from dmx_compressor_tpu.ops.basic_linear import fused_basic_linear
    from dmx_compressor_tpu.ops.basic_attention import (
        BasicSDPAParams, basic_sdpa_decode,
    )
    from dmx_compressor_tpu.ops.bfp_pack import bfp_pack, bfp_unpack

    B, d, ffn, H, Dh, S, V = 8, 768, 3072, 12, 64, 192, 50272
    rng = np.random.default_rng(0)

    def arr(*shape, s=0.5):
        return jnp.asarray(rng.standard_normal(shape) * s, jnp.float32)

    x = arr(B, d)
    w_qkv = arr(3 * d, d, s=0.05)
    w_fc1 = arr(ffn, d, s=0.05)
    w_fc2 = arr(d, ffn, s=0.05)
    w_lm = arr(V, d, s=0.05)
    ln_w, ln_b = jnp.ones((d,)), jnp.zeros((d,))
    bf_qkv = bfp_unpack(bfp_pack(w_qkv, 8, 64)).astype(jnp.bfloat16)
    bf_fc1 = bfp_unpack(bfp_pack(w_fc1, 8, 64)).astype(jnp.bfloat16)
    bf_fc2 = bfp_unpack(bfp_pack(w_fc2, 8, 64)).astype(jnp.bfloat16)
    bf_lm = bfp_unpack(bfp_pack(w_lm, 8, 64)).astype(jnp.bfloat16)
    b_qkv, b_fc1, b_fc2 = arr(3 * d, s=0.05), arr(ffn, s=0.05), arr(d, s=0.05)

    marginal("noop add", lambda c: c + 1.0, x)
    marginal("xla qkv matmul+bias", lambda c, w, b: (c @ w.T + b)[:, :d],
             x, w_qkv, b_qkv)
    marginal("xla lm matmul", lambda c, w: (c @ w.T)[:, :d], x, w_lm)
    marginal("fused qkv bf16", lambda c, w, b: fused_basic_linear(
        c, w_bf16=w, bias=b, in_wl=8, in_block=64, out_fp16=True)[:, :d],
        x, bf_qkv, b_qkv)
    marginal("fused fc2 K=3072 bf16", lambda c, w, b: fused_basic_linear(
        jnp.tile(c, (1, ffn // d)), w_bf16=w, bias=b, in_wl=8, in_block=64,
        out_fp16=True), x, bf_fc2, b_fc2)
    marginal("fused lm bf16", lambda c, w: fused_basic_linear(
        c, w_bf16=w, bias=jnp.zeros((V,)), in_wl=8, in_block=64,
        out_fp16=True)[:, :d], x, bf_lm)
    marginal("ln+qkv bf16", lambda c, w, b: fused_ln_linear(
        c, w_bf16=w, bias=b, ln_w=ln_w, ln_b=ln_b, eps=1e-5, wl=8,
        in_block=64)[:, :d], x, bf_qkv, b_qkv)

    def ln_fc1(c, w, b, res):
        y, pre = fused_ln_linear(
            c, w_bf16=w, bias=b, ln_w=ln_w, ln_b=ln_b, eps=1e-5, wl=8,
            in_block=64, residual=res, relu=True, emit_pre=True)
        return y[:, :d] + pre

    marginal("resadd+ln+fc1+relu bf16", ln_fc1, x, bf_fc1, b_fc1, arr(B, d))

    q, k, v = arr(B, H, 1, Dh), arr(B, H, S, Dh), arr(B, H, S, Dh)
    mask = jnp.zeros((1, S), jnp.float32)
    params = BasicSDPAParams(wl=8, block=64, input_clamp=-100.0,
                             max_adjust=0.1141, kmax=15, use_exp_large=True)

    def fsdpa(c, k, v, m):
        return basic_sdpa_decode(c, k, v, m, scale=0.125, params=params)

    marginal("fused sdpa (1 kernel)", fsdpa, q, k, v, mask)

    def xla_sdpa(c, k, v, m):
        s = jnp.einsum("bhtd,bhsd->bhts", c, k) * 0.125 + m
        w = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhts,bhsd->bhtd", w, v)

    marginal("xla sdpa", xla_sdpa, q, k, v, mask)

    # modular comparators
    from dmx_compressor_tpu.numerics.cast import CastTo
    from dmx_compressor_tpu.functional import simd_ops

    fp16a = CastTo(format="FP[1|5|10,15](FN)")
    fp16b = CastTo(format="FP[1|5|10,15](FN)")
    bfpc = CastTo(format="BFP[8|8]{64}(SN)", block_dim=-1)

    marginal("modular LN chain xla", lambda c: fp16b(
        simd_ops.layer_norm(fp16a(c), (d,), ln_w, ln_b, 1e-5)), x)
    marginal("modular qkv xla cast+mm", lambda c, w, b: fp16a(
        jnp.matmul(bfpc(c).astype(jnp.bfloat16), w.T,
                   preferred_element_type=jnp.float32) + b)[:, :d],
        x, bf_qkv, b_qkv)
    marginal("modular resadd fp16", lambda c, r: fp16b(fp16a(c) + fp16a(r)),
             x, arr(B, d))


if __name__ == "__main__":
    main()
