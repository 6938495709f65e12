"""A/B the decode-attention paths at serving shapes, on the real chip.

Paths (all consume the caches' native s_minor [B, H(kv), D, S] layout):
  fp32:  "einsum"  — modular masked-softmax sdpa over logical views (what
                      cached_attend uses below the flash profitability floor)
         "flash"   — ops/flash_decode.flash_decode (Pallas, s_minor)
  int8:  "einsum"  — ops/kv_cache.quantized_sdpa (scale-after-matmul)
         "flash"   — ops/flash_decode.flash_decode_int8 (Pallas, s_minor)

Timing is MARGINAL per call (chained 4-deep vs 1-deep loops, difference/3)
to cancel the ~130us tunneled-dispatch floor — same harness as
tools/diag_bfpkernel_ab.py.  The crossover S feeds FLASH_DECODE_MIN_S
(ops/flash_decode.py routing gate).

Usage: python tools/diag_decode_ab.py [125m|1.3b|gqa] [S ...]
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

ITERS = 50


def t_loop(f, reps, q, args):
    def loop(q0, others):
        def body(i, c):
            for _ in range(reps):
                y = f(c, *others)
                c = c + jnp.mean(y) * 1e-12  # data-dependent chaining
            return c

        return jax.lax.fori_loop(0, ITERS, body, q0)

    jl = jax.jit(loop)
    out = jl(q, args); _ = float(jnp.sum(out))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = jl(q, args); _ = float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def timeit(name, f, q, *args):
    t1 = t_loop(f, 1, q, args)
    t4 = t_loop(f, 4, q, args)
    us = (t4 - t1) / 3 * 1e6
    print(f"{name:46s} {us:9.1f} us marginal", flush=True)
    return us


def masked_sdpa_sminor(q, kT, vT, lengths, scale):
    """The below-floor einsum path: logical views of the s_minor buffers."""
    S = kT.shape[-1]
    k = kT.swapaxes(-1, -2)
    v = vT.swapaxes(-1, -2)
    if k.shape[1] != q.shape[1]:
        rep = q.shape[1] // k.shape[1]
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    logits = jnp.einsum("bhld,bhsd->bhls", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    mask = jnp.arange(S)[None, :] < lengths[:, None]
    logits = jnp.where(mask[:, None, None, :], logits, -1e30)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhls,bhsd->bhld", w, v.astype(jnp.float32)).astype(q.dtype)


def sweep(which: str, Ss):
    """Kernel-tuning sweep: (block_k, block_h) grid for the pipelined
    decode kernels (fp + int8, s_minor), marginal us per call.  Drives the
    FLASH_DECODE_BLOCK_H default and _pick_block_k's max_block."""
    from dmx_compressor_tpu.ops import flash_decode as fd
    from dmx_compressor_tpu.ops.kv_cache import QuantKV, QuantizedKVCache

    B = 8
    H, Hkv, D = {"125m": (12, 12, 64), "1.3b": (32, 32, 64),
                 "gqa": (32, 4, 64)}[which]
    rep = H // Hkv
    scale = D**-0.5
    rng = np.random.default_rng(0)
    for S in Ss:
        q = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
        kT = jnp.asarray(rng.standard_normal((B, Hkv, D, S)) * 0.3, jnp.float32)
        vT = jnp.asarray(rng.standard_normal((B, Hkv, D, S)) * 0.3, jnp.float32)
        lengths = jnp.full((B,), S - 1, jnp.int32)
        kq, ks = QuantizedKVCache._quantize(kT.swapaxes(-1, -2))
        vq, vs = QuantizedKVCache._quantize(vT.swapaxes(-1, -2))
        kqT, vqT = kq.swapaxes(-1, -2), vq.swapaxes(-1, -2)
        ksr = ks.astype(jnp.float32).reshape(B, Hkv, 1, S)
        vsr = vs.astype(jnp.float32).reshape(B, Hkv, 1, S)
        fp_mb = 2 * B * Hkv * S * D * 4 / 1e6
        i8_mb = 2 * B * Hkv * S * (D + 4) / 1e6
        print(f"--- {which} S={S}: SoL fp32 {fp_mb / 819e3 * 1e6:.1f} us, "
              f"int8 {i8_mb / 819e3 * 1e6:.1f} us", flush=True)
        for bk in (256, 512, 1024, 2048):
            if S % bk:
                continue
            for bh in (2, 4, 6, 8, 12, 16, 32):
                if Hkv % bh:
                    continue
                # double-buffered K+V tiles must fit scoped VMEM (~16 MB;
                # a 12x64x512 fp32 combo measured 24 MB and failed compile)
                fp_tile = 2 * 2 * bh * D * bk * 4
                i8_tile = 2 * 2 * bh * D * bk * 1
                if fp_tile > 12e6 and i8_tile > 12e6:
                    continue
                if fp_tile > 12e6:
                    timeit(
                        f"  int8 bk={bk:4d} bh={bh:2d}",
                        lambda c, kq_, vq_, ks_, vs_, le, bk=bk, bh=bh:
                        fd._decode_int8_pallas_T(
                            c, kq_, vq_, ks_, vs_, le, scale, bk, rep,
                            block_h=bh),
                        q, kqT, vqT, ksr, vsr, lengths)
                    continue
                timeit(
                    f"  fp   bk={bk:4d} bh={bh:2d}",
                    lambda c, k_, v_, le, bk=bk, bh=bh: fd._decode_pallas_T(
                        c, k_, v_, le, scale, bk, rep, block_h=bh),
                    q, kT, vT, lengths)
                timeit(
                    f"  int8 bk={bk:4d} bh={bh:2d}",
                    lambda c, kq_, vq_, ks_, vs_, le, bk=bk, bh=bh:
                    fd._decode_int8_pallas_T(
                        c, kq_, vq_, ks_, vs_, le, scale, bk, rep,
                        block_h=bh),
                    q, kqT, vqT, ksr, vsr, lengths)


def main():
    from dmx_compressor_tpu.ops import flash_decode as fd
    from dmx_compressor_tpu.ops.kv_cache import QuantKV, QuantizedKVCache, quantized_sdpa

    if len(sys.argv) > 1 and sys.argv[1] == "sweep":
        which = sys.argv[2] if len(sys.argv) > 2 else "125m"
        sweep(which, [int(a) for a in sys.argv[3:]] or [1024, 2048])
        return

    which = sys.argv[1] if len(sys.argv) > 1 else "125m"
    Ss = [int(a) for a in sys.argv[2:]] or [256, 512, 1024, 2048]
    B = 8
    H, Hkv, D = {"125m": (12, 12, 64), "1.3b": (32, 32, 64),
                 "gqa": (32, 4, 64)}[which]
    scale = D**-0.5
    rng = np.random.default_rng(0)

    for S in Ss:
        q = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
        kT = jnp.asarray(rng.standard_normal((B, Hkv, D, S)) * 0.3, jnp.float32)
        vT = jnp.asarray(rng.standard_normal((B, Hkv, D, S)) * 0.3, jnp.float32)
        lengths = jnp.full((B,), S - 1, jnp.int32)
        # int8 payloads quantized the cache's way (amax over D)
        kq, ks = QuantizedKVCache._quantize(kT.swapaxes(-1, -2))
        vq, vs = QuantizedKVCache._quantize(vT.swapaxes(-1, -2))
        kv = QuantKV(kq.swapaxes(-1, -2), vq.swapaxes(-1, -2), ks, vs,
                     s_minor=True)
        mask = jnp.where(jnp.arange(S)[None, None, None, :]
                         < lengths[:, None, None, None], 0.0, -1e30)

        timeit(f"{which} S={S:5d} fp32   einsum",
               lambda c, k_, v_, le: masked_sdpa_sminor(c, k_, v_, le, scale),
               q, kT, vT, lengths)
        timeit(f"{which} S={S:5d} fp32   flash",
               lambda c, k_, v_, le: fd.flash_decode(
                   c, k_, v_, le, scale=scale, use_pallas=True, s_minor=True),
               q, kT, vT, lengths)
        # NamedTuple bool fields trace under jit: rebuild QuantKV inside
        # the timed closure with the static flag
        timeit(f"{which} S={S:5d} int8   einsum(qsdpa)",
               lambda c, kq_, vq_, ks_, vs_, m: quantized_sdpa(
                   c, QuantKV(kq_, vq_, ks_, vs_, s_minor=True),
                   attn_mask=m, scale=scale, enable_gqa=H != Hkv),
               q, kv.k_q, kv.v_q, kv.k_scale, kv.v_scale, mask)
        timeit(f"{which} S={S:5d} int8   flash",
               lambda c, kq_, vq_, ks_, vs_, le: fd.flash_decode_int8(
                   c, QuantKV(kq_, vq_, ks_, vs_, s_minor=True), le,
                   scale=scale, use_pallas=True),
               q, kv.k_q, kv.v_q, kv.k_scale, kv.v_scale, lengths)
        # speed-of-light yardsticks: bytes each path must stream per call
        fp_mb = 2 * B * Hkv * S * D * 4 / 1e6
        i8_mb = 2 * B * Hkv * S * (D + 4) / 1e6
        print(f"    bytes/call: fp32 {fp_mb:.2f} MB (SoL "
              f"{fp_mb / 819e3 * 1e6:.1f} us), int8 {i8_mb:.2f} MB (SoL "
              f"{i8_mb / 819e3 * 1e6:.1f} us)", flush=True)


if __name__ == "__main__":
    main()
