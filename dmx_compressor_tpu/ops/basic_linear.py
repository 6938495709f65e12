"""Fused fake-quant linear: input BFP cast + dequant matmul + FP16 epilogue.

The BASIC-mode decode step is kernel-count bound: every ``CastTo`` site
lowers to its own fusion chain (~300 sites on OPT-125m), so the full
fake-quant mode ran at ~0.49x fp32 in round 1 even though the matmuls
themselves are cheap.  This kernel collapses a BASIC Linear to ONE Pallas
kernel — the same kernel count as the fp32 baseline's matmul:

    prologue:  input BFP fake-quant (the reference rebase-add trick,
               numerics/rounding.py block_quantize_lastdim — ~8 vector ops)
    body:      bf16 MXU matmul (exact: both operands carry <= 8 mantissa
               bits after quantization, so bf16 products are lossless and
               accumulation stays f32)
    epilogue:  bias add + FLOAT16 output cast (f32 emulation of the fp16
               round-nearest-even grid; Mosaic has no native f16 ops)

The per-block shared exponents of the *input* are computed outside the
kernel (a tiny [M, K/B] reduction XLA fuses into the producer chain) and
passed in slotted to 128-lane boundaries, mirroring how ops/bfp_linear.py
passes weight exponents; inside, a 0/1 expansion matmul broadcasts them to
per-lane scales (Mosaic rejects lane-splitting reshapes, probed on v5e).

Numerics contract (tested in tests/test_ops.py):
- input cast: bit-exact vs ``CastTo`` with a symmetric nearest-rounding
  BFP format blocked along the last axis (reference block_kernel.cu:5-75
  rebase-add semantics, incl. fp32 double rounding and zero-block
  passthrough, via sentinel exponent -128);
- output cast: bit-exact vs the FLOAT16 fast path
  (numerics/format.py FloatingPoint.cast: clip to +-65504, RN-to-f16 grid,
  flush below the smallest normal);
- matmul: f32-accumulated; reassociation differs from a single jnp.matmul
  only in K-tile summation order.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..numerics import rounding as R
from .bfp_pack import PackedBFP

Array = jax.Array


def _ceil_to(v: int, m: int) -> int:
    return -(-v // m) * m


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# ---------------------------------------------------------------------------
# host-side helpers
# ---------------------------------------------------------------------------


def block_exponents(x: Array, block_size: int) -> Array:
    """Per-block shared exponents of ``x`` along the last axis, int8.

    Returns floor(log2(max|block|)) with sentinel -128 for blocks whose
    absolute max is bit-level zero (those blocks pass through the cast,
    matching numerics/rounding.py block_quantize_lastdim).
    """
    *lead, K = x.shape
    xf = x.astype(jnp.float32).reshape(*lead, K // block_size, block_size)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    e = R._exponent_of(amax)
    e = jnp.where(R._is_zero(amax), -128, e)
    return e.astype(jnp.int8)


def _slot(e: Array, nt: int, nb: int, eslot: int) -> Array:
    """[M, nt*nb] -> [M, nt*ESLOT] zero-padded per-K-tile slots."""
    M = e.shape[0]
    return jnp.pad(
        e.reshape(M, nt, nb), ((0, 0), (0, 0), (0, eslot - nb))
    ).reshape(M, nt * eslot)


# ---------------------------------------------------------------------------
# in-kernel pieces (pure jnp; shared by kernel and reference paths)
# ---------------------------------------------------------------------------


def _expand01(n_src: int, n_dst: int, block: int):
    """0/1 expansion matrix [n_src, n_dst] with E[b, c] = (c // block == b)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_src, n_dst), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n_src, n_dst), 1)
    return (cols // block == rows).astype(jnp.float32)


def _bfp_cast_with_exponents(xf: Array, e_full: Array, wl: int) -> Array:
    """Symmetric nearest BFP fake-quant given per-element shared exponents.

    Bit-identical to rounding.block_quantize_lastdim on non-sentinel blocks;
    ``e_full`` == -128 marks zero blocks (passthrough).
    """
    zero = e_full == -128.0
    e = jnp.where(zero, 0.0, e_full).astype(jnp.int32)
    base = R._mul_pow2(jnp.full_like(xf, 1.5), e + 2)  # 6 * 2^e, exact
    t = xf + base  # fp32 add: reference double rounding
    scaled = R._mul_pow2(t, wl - 2 - e)
    q = jnp.round(scaled)  # bitwise nearest-even; t > 0
    q = R._mul_pow2(q, e + 2 - wl) - base
    lim = R._mul_pow2(jnp.ones_like(xf), e + 1)
    maxv = (2.0 - 2.0 ** (-(wl - 2))) * R._mul_pow2(jnp.ones_like(xf), e)
    q = jnp.where(jnp.abs(q) >= lim, jnp.sign(q) * maxv, q)
    return jnp.where(zero, xf, q)


def _fp16_cast_f32(y: Array) -> Array:
    """f32 emulation of the FLOAT16 fast path (format.py FloatingPoint.cast):
    clip to +-65504, round-nearest-even onto the fp16 grid, flush below the
    smallest normal.  Bit-exact vs clip().astype(f16) + subnormal flush."""
    y = jnp.clip(y, -65504.0, 65504.0)
    e = jnp.maximum(R._exponent_of(y), -14)
    scaled = R._mul_pow2(y, 10 - e)  # |scaled| <= 2048: exact
    q = R._mul_pow2(jnp.round(scaled), e - 10)
    return jnp.where(jnp.abs(q) < jnp.float32(6.103515625e-05), 0.0, q)


# ---------------------------------------------------------------------------
# the fused kernel
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "in_wl", "in_block", "w_precision", "w_block", "out_fp16", "has_bias",
        "interpret",
    ),
)
def _fused_linear_pallas(
    x: Array,  # [M, K] f32
    e_x: Optional[Array],  # [M, K // in_block] int8 or None (no input cast)
    w_bf16: Optional[Array],  # [N, K] bf16 (pre-dequantized weights) …
    man: Optional[Array],  # … or packed int8 mantissas [N, K]
    exp: Optional[Array],  # with int8 exponents [N, K // w_block]
    bias: Optional[Array],  # [N] f32 (pre-cast) or None
    in_wl: int,
    in_block: int,
    w_precision: int,
    w_block: int,
    out_fp16: bool,
    has_bias: bool,
    interpret: bool = False,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = x.shape
    N = w_bf16.shape[0] if w_bf16 is not None else man.shape[0]
    cast_input = e_x is not None
    packed_w = man is not None

    bm = max(8, min(128, _ceil_to(M, 8)))
    bn = min(256, _ceil_to(N, 128))
    bk = min(_ceil_to(K, 128), 2048)
    if cast_input:
        bk = min(_ceil_to(K, in_block), 2048)
    if packed_w:
        bk = min(_ceil_to(K, max(in_block, w_block) if cast_input else w_block), 2048)
    padM, padN, padK = (-M) % bm, (-N) % bn, (-K) % bk
    if padM:
        x = jnp.pad(x, ((0, padM), (0, 0)))
    if padK:
        x = jnp.pad(x, ((0, 0), (0, padK)))
    Mp, Np, Kp = M + padM, N + padN, K + padK
    nt = Kp // bk
    grid = (Mp // bm, Np // bn, nt)

    ESLOT = 128  # one zero-padded 128-lane exponent slot per K-tile

    in_specs = [pl.BlockSpec((bm, bk), lambda i, j, t: (i, t))]
    operands = [x]

    if cast_input:
        nbx = bk // in_block
        assert nbx <= ESLOT, f"K tile {bk} needs {nbx} exponent slots > {ESLOT}"
        if padK:
            e_x = jnp.pad(e_x, ((0, 0), (0, padK // in_block)),
                          constant_values=-128)
        if padM:
            e_x = jnp.pad(e_x, ((0, padM), (0, 0)), constant_values=-128)
        e_x = _slot(e_x, nt, nbx, ESLOT)
        in_specs.append(pl.BlockSpec((bm, ESLOT), lambda i, j, t: (i, t)))
        operands.append(e_x)

    if packed_w:
        nbw = bk // w_block
        assert nbw <= ESLOT
        if padN:
            man = jnp.pad(man, ((0, padN), (0, 0)))
            exp = jnp.pad(exp, ((0, padN), (0, 0)))
        if padK:
            man = jnp.pad(man, ((0, 0), (0, padK)))
            exp = jnp.pad(exp, ((0, 0), (0, padK // w_block)))
        exp_slotted = _slot(exp, nt, nbw, ESLOT)
        in_specs += [
            pl.BlockSpec((bn, bk), lambda i, j, t: (j, t)),
            pl.BlockSpec((bn, ESLOT), lambda i, j, t: (j, t)),
        ]
        operands += [man, exp_slotted]
    else:
        if padN:
            w_bf16 = jnp.pad(w_bf16, ((0, padN), (0, 0)))
        if padK:
            w_bf16 = jnp.pad(w_bf16, ((0, 0), (0, padK)))
        in_specs.append(pl.BlockSpec((bn, bk), lambda i, j, t: (j, t)))
        operands.append(w_bf16)

    if has_bias:
        bias2 = jnp.pad(bias, (0, padN)).reshape(1, Np)
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j, t: (0, j)))
        operands.append(bias2)

    def kernel(*refs):
        idx = 0
        x_ref = refs[idx]; idx += 1
        ex_ref = None
        if cast_input:
            ex_ref = refs[idx]; idx += 1
        if packed_w:
            man_ref = refs[idx]; exp_ref = refs[idx + 1]; idx += 2
        else:
            w_ref = refs[idx]; idx += 1
        bias_ref = None
        if has_bias:
            bias_ref = refs[idx]; idx += 1
        out_ref = refs[idx]

        xf = x_ref[:].astype(jnp.float32)
        if cast_input:
            # expand per-block exponents [bm, ESLOT] -> per-lane [bm, bk]
            # (integer-valued f32 through a 0/1 matmul: exact; slot rows
            # beyond nbx hit no column)
            e_full = jax.lax.dot_general(
                ex_ref[:].astype(jnp.float32),
                _expand01(ESLOT, bk, in_block),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            xf = _bfp_cast_with_exponents(xf, e_full, in_wl)

        if packed_w:
            s = jnp.exp2(exp_ref[:].astype(jnp.float32) + (2 - w_precision))
            scale_full = jax.lax.dot_general(
                s, _expand01(ESLOT, bk, w_block),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            w = (man_ref[:].astype(jnp.float32) * scale_full).astype(jnp.bfloat16)
        else:
            w = w_ref[:]

        partial = jax.lax.dot_general(
            xf.astype(jnp.bfloat16),
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

        if has_bias or out_fp16:

            @pl.when(pl.program_id(2) == nt - 1)
            def _():
                y = out_ref[:]
                if has_bias:
                    y = y + bias_ref[:].astype(jnp.float32)
                if out_fp16:
                    y = _fp16_cast_f32(y)
                out_ref[:] = y

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, t: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    return out[:M, :N]


def fused_basic_linear(
    x: Array,
    *,
    w_bf16: Optional[Array] = None,
    packed: Optional[PackedBFP] = None,
    bias: Optional[Array] = None,
    in_wl: Optional[int] = None,
    in_block: Optional[int] = None,
    out_fp16: bool = False,
    interpret: Optional[bool] = None,
) -> Array:
    """One-kernel fake-quant linear: y = fp16(cast_bfp(x) @ W_deq.T + b).

    ``x`` may have any leading shape.  Pass ``in_wl``/``in_block`` to apply
    the input BFP cast in the kernel prologue (None = input used as-is);
    exactly one of ``w_bf16`` (pre-dequantized bf16 weights [N, K]) or
    ``packed`` (int8 BFP payload) supplies the weights; ``out_fp16`` applies
    the FLOAT16 output cast in the epilogue.
    """
    if interpret is None:
        interpret = not _on_tpu()
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K).astype(jnp.float32)
    cast_input = in_wl is not None
    e_x = block_exponents(x2, in_block) if cast_input else None
    y = _fused_linear_pallas(
        x2,
        e_x,
        None if packed is not None else w_bf16,
        packed.mantissa if packed is not None else None,
        packed.exponent if packed is not None else None,
        bias if bias is not None else None,
        in_wl=in_wl or 0,
        in_block=in_block or 0,
        w_precision=packed.precision if packed is not None else 0,
        w_block=packed.block_size if packed is not None else 0,
        out_fp16=out_fp16,
        has_bias=bias is not None,
        interpret=interpret,
    )
    N = w_bf16.shape[0] if w_bf16 is not None else packed.mantissa.shape[0]
    return y.reshape(*lead, N).astype(x.dtype)
