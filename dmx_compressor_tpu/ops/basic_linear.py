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

    Every power-of-two factor is computed on the EXPONENT-shaped array
    (one scalar per block) and broadcast only at the final multiplies, so
    the per-element work is ~13 fused elementwise ops instead of ~45 (the
    old form ran the 8-op _mul_pow2 chain at full tensor width five
    times).  The two-multiply (f2 then f1) application of each 2^k keeps
    the |k| > 126 cases exact — identical op order to R._mul_pow2, so the
    result is bit-identical."""
    zero = e_full == -128.0
    e = jnp.where(zero, 0.0, e_full).astype(jnp.int32)

    def pow2_pair(k):
        """(f2, f1) with f2*f1 == 2^k exactly, each in fp32 range."""
        k1 = jnp.clip(k, -126, 126)
        return R._pow2f(k - k1), R._pow2f(k1)

    s2, s1 = pow2_pair(wl - 2 - e)   # x -> integer grid
    i2, i1 = pow2_pair(e + 2 - wl)   # back
    b2, b1 = pow2_pair(e + 2)        # rebase offset 6*2^e = 1.5*2^(e+2)
    base = 1.5 * b2 * b1
    t = xf + base  # fp32 add: reference double rounding
    q = jnp.round(t * s2 * s1)  # bitwise nearest-even; t > 0
    q = q * i2 * i1 - base
    l2, l1 = pow2_pair(e + 1)
    lim = l2 * l1
    m2, m1 = pow2_pair(e)
    maxv = (2.0 - 2.0 ** (-(wl - 2))) * m2 * m1
    q = jnp.where(jnp.abs(q) >= lim, jnp.sign(q) * maxv, q)
    return jnp.where(zero, xf, q)


def _fp16_cast_f32(y: Array) -> Array:
    """FLOAT16 fast path (format.py FloatingPoint.cast): clip to +-65504,
    round-nearest-even onto the fp16 grid, flush below the smallest normal.

    Implemented with the NATIVE f32->f16->f32 convert pair (hardware
    round-nearest-even — bit-identical to the bit-manipulation emulation,
    tests/test_basic_linear.py::test_fp16_cast_matches_reference_grid).
    This cast runs ~10x per layer on the fused BASIC decode path; the old
    emulation was ~20 jaxpr ops per call and made the BASIC decode body
    20x the op count of the fp32 baseline (the round-5 Qwen3/125m
    dispatch-bound gap)."""
    y = jnp.clip(y.astype(jnp.float32), -65504.0, 65504.0)
    q = y.astype(jnp.float16).astype(jnp.float32)
    return jnp.where(jnp.abs(q) < jnp.float32(6.103515625e-05), 0.0, q)


def _fp16_cast_f32_emulated(y: Array) -> Array:
    """The pre-r5 bit-manipulation form, kept as the parity oracle."""
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
    # exponents stay block-shaped [..., nb, 1]; _bfp_cast_with_exponents
    # broadcasts only its final multiplies
    e = _exponent_with_sentinel(amax)
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
        # ResAdd epilogue: both inputs already on the fp16 grid, so the
        # module's input casts are value-identity; only the output cast
        # reapplies (reference torch_modules.py:15-64, BASIC rule set)
        y = _fp16_cast_f32(y + _fp16_cast_f32(res_out.reshape(-1, N)))
    return y.reshape(*lead, N).astype(x.dtype)
