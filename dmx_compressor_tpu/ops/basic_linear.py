"""Fused fake-quant linear: input BFP cast + dequant matmul + FP16 epilogue.

The BASIC-mode decode step is DISPATCH-bound on the target chip: every
kernel costs ~4us inside a compiled program regardless of its work, and the
modular pipeline's ~300 ``CastTo`` fusion chains made full fake-quant run
at ~0.49x fp32 in round 1.  Marginal-cost measurement
(tools/diag_marginal.py) showed that at decode shapes tight inline jnp —
which XLA fuses into a handful of kernels — beats hand-written Pallas
kernels for every cast/epilogue chain (e.g. cast+matmul 5us tight-XLA vs
14us Pallas), so this module is pure jnp except for one case: int8-packed
weights go through the ops/bfp_linear.py Pallas dequant-matmul, which
halves the HBM weight traffic of deep-K layers (the true bottleneck for
multi-GB models at decode).

Numerics contract (tested in tests/test_basic_linear.py):
- input cast: bit-exact vs ``CastTo`` with a symmetric nearest-rounding
  BFP format blocked along the last axis (reference block_kernel.cu:5-75
  rebase-add semantics, incl. fp32 double rounding and zero-block
  passthrough, via sentinel exponent -128);
- output cast: bit-exact vs the FLOAT16 fast path
  (numerics/format.py FloatingPoint.cast: clip to +-65504, RN-to-f16 grid,
  flush below the smallest normal);
- matmul: bf16 operands (lossless for <= 8 quantized mantissa bits),
  f32 accumulation.
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

    r5 note: a "cheaper" variant computing every pow2 factor on the
    block-shaped exponent array and broadcasting only the final multiplies
    measured FASTER in an isolated microbenchmark but cost qwen3-0.6b
    BASIC decode 37% end to end (1,037 vs 1,644 tok/s) — the mixed-shape
    factor chains break XLA's elementwise fusions around every cast site.
    On the dispatch-bound decode path, fusion structure beats jaxpr op
    count; keep this form full-width."""
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
    smallest normal.  Bit-exact vs clip().astype(f16) + subnormal flush.

    Deliberately NOT the native f32->f16->f32 convert pair: measured on the
    chip (r5), the f16 converts split XLA's elementwise fusions around every
    cast site and cost qwen3-0.6b BASIC decode 35% (1,069 vs 1,644 tok/s)
    even though the convert pair wins an isolated microbenchmark — the
    arithmetic emulation stays inside one fusion with its neighbors."""
    y = jnp.clip(y, -65504.0, 65504.0)
    e = jnp.maximum(R._exponent_of(y), -14)
    scaled = R._mul_pow2(y, 10 - e)  # |scaled| <= 2048: exact
    q = R._mul_pow2(jnp.round(scaled), e - 10)
    return jnp.where(jnp.abs(q) < jnp.float32(6.103515625e-05), 0.0, q)




def _exponent_with_sentinel(amax: Array) -> Array:
    """floor(log2(amax)) with -128 marking bit-level-zero blocks."""
    e = R._exponent_of(amax)
    return jnp.where(R._is_zero(amax), -128.0, e.astype(jnp.float32))


def cast_blocked_lastdim(x: Array, block: int, wl: int) -> Array:
    """Symmetric nearest BFP fake-quant, blocks along the last axis — the
    tight inline form (reference rebase-add numerics, identical to
    rounding.block_quantize_lastdim).  Pure jnp: on the dispatch-bound
    target chip XLA's fusion of this chain into the surrounding ops beats a
    hand-written Pallas kernel (measured 5 vs 14 us/call at decode shapes)."""
    sh = x.shape
    xr = x.astype(jnp.float32).reshape(*sh[:-1], sh[-1] // block, block)
    amax = jnp.max(jnp.abs(xr), axis=-1, keepdims=True)
    e = jnp.broadcast_to(_exponent_with_sentinel(amax), xr.shape)
    return _bfp_cast_with_exponents(xr, e, wl).reshape(sh)



def fused_basic_linear(
    x: Array,
    *,
    w_bf16: Optional[Array] = None,
    packed: Optional[PackedBFP] = None,
    bias: Optional[Array] = None,
    in_wl: Optional[int] = None,
    in_block: Optional[int] = None,
    out_fp16: bool = False,
    res_out: Optional[Array] = None,
    res_on_grid: bool = False,
    interpret: Optional[bool] = None,
) -> Array:
    """One-kernel fake-quant linear: y = fp16(cast_bfp(x) @ W_deq.T + b).

    ``x`` may have any leading shape.  Pass ``in_wl``/``in_block`` to apply
    the input BFP cast in the kernel prologue (None = input used as-is);
    exactly one of ``w_bf16`` (pre-dequantized bf16 weights [N, K]) or
    ``packed`` (int8 BFP payload) supplies the weights; ``out_fp16`` applies
    the FLOAT16 output cast in the epilogue; ``res_out`` (same shape as the
    output) additionally applies a FLOAT16 ResAdd in the epilogue.
    """
    lead = x.shape[:-1]
    K = x.shape[-1]
    N = w_bf16.shape[0] if w_bf16 is not None else packed.mantissa.shape[0]
    x2 = x.reshape(-1, K).astype(jnp.float32)
    if in_wl is not None:
        x2 = cast_blocked_lastdim(x2, in_block, in_wl)
    if w_bf16 is not None:
        # tight XLA path: bf16 MXU matmul, epilogue fused by XLA
        y = jnp.matmul(
            x2.astype(jnp.bfloat16), w_bf16.T,
            preferred_element_type=jnp.float32,
        )
        if bias is not None:
            y = y + bias
    else:
        # int8 payload: the Pallas dequant matmul halves the HBM weight
        # traffic (the decode win for deep-K layers); bias added in-kernel
        from .bfp_linear import bfp_linear

        y = bfp_linear(x2, packed, bias=bias, interpret=bool(interpret))
    if out_fp16:
        y = _fp16_cast_f32(y)
    if res_out is not None:
        # ResAdd epilogue: y is on the fp16 grid (out_fp16 just ran), so
        # its input cast is value-identity; only the output cast reapplies
        # (reference torch_modules.py:15-64, BASIC rule set).  res_on_grid
        # additionally skips the residual-side identity cast.
        r = res_out.reshape(-1, N)
        if not res_on_grid:
            r = _fp16_cast_f32(r)
        y = _fp16_cast_f32(y + r)
    return y.reshape(*lead, N).astype(x.dtype)
