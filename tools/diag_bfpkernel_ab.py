"""A/B the two BFP dequant-matmul kernel formulations at decode shapes.

Variant "concat": the current per-block width-1 lane broadcast + lane
concat (ops/bfp_linear.py).  Variant "expand": the round-2 one-hot
expansion matmul it replaced (eed4483).  Variant "bf16": plain XLA bf16
matmul on pre-dequantized weights (the small-model decode path).

Usage: python tools/diag_bfpkernel_ab.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dmx_compressor_tpu.ops.bfp_linear import _ceil_to

ITERS = 100


@functools.partial(
    jax.jit, static_argnames=("precision", "block_size", "bn", "variant")
)
def bfp_matmul_variant(x, man, exp, precision, block_size, bn=256,
                       variant="concat"):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = x.shape
    N = man.shape[0]
    bm = max(8, min(128, _ceil_to(M, 8)))
    bn = min(bn, _ceil_to(N, 128))
    bk = min(_ceil_to(K, block_size), 32 * block_size, 2048)
    padM, padN, padK = (-M) % bm, (-N) % bn, (-K) % bk
    if padM:
        x = jnp.pad(x, ((0, padM), (0, 0)))
    if padN:
        man = jnp.pad(man, ((0, padN), (0, 0)))
        exp = jnp.pad(exp, ((0, padN), (0, 0)))
    if padK:
        x = jnp.pad(x, ((0, 0), (0, padK)))
        man = jnp.pad(man, ((0, 0), (0, padK)))
        exp = jnp.pad(exp, ((0, 0), (0, padK // block_size)))
    Mp, Np, Kp = M + padM, N + padN, K + padK
    grid = (Mp // bm, Np // bn, Kp // bk)
    nb = bk // block_size
    nt = Kp // bk
    ESLOT = max(128, _ceil_to(nb, 128))
    exp_slotted = jnp.pad(
        exp.reshape(Np, nt, nb), ((0, 0), (0, 0), (0, ESLOT - nb))
    ).reshape(Np, nt * ESLOT)

    def kernel(x_ref, man_ref, exp_ref, out_ref):
        s = jnp.exp2(exp_ref[:].astype(jnp.float32) + (2 - precision))
        main_bf16 = False
        if variant == "concat":
            w = jnp.concatenate(
                [
                    man_ref[:, b * block_size : (b + 1) * block_size].astype(
                        jnp.float32
                    )
                    * s[:, b][:, None]
                    for b in range(nb)
                ],
                axis=1,
            )
        else:  # expand / expand_bf16 / expand_full
            rows = jax.lax.broadcasted_iota(jnp.int32, (ESLOT, bk), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (ESLOT, bk), 1)
            if variant == "expand":
                expand = (cols // block_size == rows).astype(jnp.float32)
                scale_full = jax.lax.dot_general(
                    s, expand, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                # powers of two and a 0/1 matrix are exact in bf16: the
                # expansion matmul rides the MXU at full bf16 rate
                expand = (cols // block_size == rows).astype(jnp.bfloat16)
                scale_full = jax.lax.dot_general(
                    s.astype(jnp.bfloat16), expand, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            if variant == "expand_full":
                # mantissa (<= 8 bits) x power-of-two scale is exact in bf16
                w = (
                    man_ref[:].astype(jnp.bfloat16)
                    * scale_full.astype(jnp.bfloat16)
                )
                main_bf16 = True
            else:
                w = man_ref[:].astype(jnp.float32) * scale_full
        if main_bf16:
            partial = jax.lax.dot_general(
                x_ref[:].astype(jnp.bfloat16),
                w,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            partial = jax.lax.dot_general(
                x_ref[:].astype(jnp.float32),
                w,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(pl.program_id(2) == 0)
        def _():
            out_ref[:] = partial

        @pl.when(pl.program_id(2) != 0)
        def _():
            out_ref[:] = out_ref[:] + partial

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, t: (i, t)),
            pl.BlockSpec((bn, bk), lambda i, j, t: (j, t)),
            pl.BlockSpec((bn, ESLOT), lambda i, j, t: (j, t)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, t: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(x, man, exp_slotted)
    return out[:M, :N]


def t_loop(f, reps, *args):
    K = args[0].shape[1]

    def loop(x, others):
        def body(i, c):
            for _ in range(reps):
                y = f(c, *others)
                # data-dependent chaining regardless of output width
                c = c + jnp.sum(y) * 1e-12
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


def timeit(name, f, *args):
    """Marginal per-call cost: (t(4 chained calls) - t(1)) / 3 cancels the
    ~130us/iteration floor of the tunneled platform (see diag_marginal.py)."""
    t1 = t_loop(f, 1, *args)
    t4 = t_loop(f, 4, *args)
    us = (t4 - t1) / 3 * 1e6
    print(f"{name:44s} {us:9.1f} us marginal", flush=True)
    return us


def main():
    from dmx_compressor_tpu.ops.bfp_pack import bfp_pack, bfp_unpack

    rng = np.random.default_rng(0)
    M = 8
    shapes = [
        ("qkv 2048->6144", 2048, 6144),
        ("out  2048->2048", 2048, 2048),
        ("fc1  2048->8192", 2048, 8192),
        ("fc2  8192->2048", 8192, 2048),
        ("lm   2048->50272", 2048, 50272),
    ]
    for name, K, N in shapes:
        x = jnp.asarray(rng.standard_normal((M, K)) * 0.5, jnp.float32)
        w = jnp.asarray(rng.standard_normal((N, K)) * 0.05, jnp.float32)
        p = bfp_pack(w, 8, 64)
        wbf = bfp_unpack(p).astype(jnp.bfloat16)
        for variant in ("expand", "expand_bf16", "expand_full"):
            timeit(
                f"{name} [{variant}]",
                lambda c, man, e: bfp_matmul_variant(
                    c, man, e, 8, 64, variant=variant
                ),
                x, p.mantissa, p.exponent,
            )
        timeit(
            f"{name} [bf16 xla]",
            lambda c, wb: jnp.matmul(
                c.astype(jnp.bfloat16), wb.T, preferred_element_type=jnp.float32
            ),
            x, wbf,
        )


if __name__ == "__main__":
    main()


def bn_sweep():
    from dmx_compressor_tpu.ops.bfp_pack import bfp_pack

    rng = np.random.default_rng(0)
    M, K, N = 8, 2048, 50272
    x = jnp.asarray(rng.standard_normal((M, K)) * 0.5, jnp.float32)
    w = jnp.asarray(rng.standard_normal((N, K)) * 0.05, jnp.float32)
    p = bfp_pack(w, 8, 64)
    for bn in (128, 256, 512, 1024, 2048):
        timeit(
            f"lm [expand] bn={bn}",
            lambda c, man, e: bfp_matmul_variant(
                c, man, e, 8, 64, bn=bn, variant="expand"
            ),
            x, p.mantissa, p.exponent,
        )
    # also fc1/fc2 at the winning bn
    for name, K2, N2 in (("fc1 2048->8192", 2048, 8192),
                         ("fc2 8192->2048", 8192, 2048)):
        x2 = jnp.asarray(rng.standard_normal((M, K2)) * 0.5, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((N2, K2)) * 0.05, jnp.float32)
        p2 = bfp_pack(w2, 8, 64)
        for bn in (512, 1024):
            timeit(
                f"{name} [expand] bn={bn}",
                lambda c, man, e: bfp_matmul_variant(
                    c, man, e, 8, 64, bn=bn, variant="expand"
                ),
                x2, p2.mantissa, p2.exponent,
            )
