"""Bit-exact low-precision rounding primitives, TPU-native.

These are the JAX equivalents of the reference's C++/CUDA quantization kernel
library (reference: src/dmx/compressor/quant/quant_cpu/quant_cpu.cpp,
quant_cuda/block_kernel.cu, float_kernel.cu, fixed_point_kernel.cu).  The
reference simulates low-precision numerics by elementwise bit manipulation of
fp32 values in scalar C++/CUDA loops; here the same semantics are expressed as
vectorized fp32 grid arithmetic that XLA fuses onto the TPU VPU, and that can
be inlined into Pallas kernels (the code is pure jax.numpy).

Semantics reproduced exactly (verified by golden tests against a float64
oracle and the reference's published test vectors):

- "nearest" = round-half-to-even on the quantization grid.  The reference
  implements this either via ``nearbyint`` (fixed point, quant_cpu.cpp:119,
  sim_helper.cpp:14-21) or via bitwise add-half-then-truncate with an explicit
  tie-to-even correction (``round_bitwise``, quant_cpu.cpp:211-237).  Both are
  equivalent to round-half-even on a power-of-two grid.
- block (BFP) quantization rebases each element against the shared exponent of
  the block max (quant_cpu.cpp:239-275): grid step ``2^(e+2-wl)`` where ``e``
  is the exponent of ``max|block|``, with saturation to
  ``(2 - 2^-(wl-2)) * 2^e`` only when the rounded value reaches ``2^(e+1)``
  (clip_max_exponent, bit_helper.cpp:24-37).
- float quantization keeps ``man`` mantissa bits at the value's own exponent,
  handles subnormals w.r.t. an exponent bias via a shift trick
  (quant_cpu.cpp:359-402), and saturates at exponent ``2^(exp-1)`` computed
  from the *default* bias regardless of the custom bias (clip_exponent,
  bit_helper.cpp:4-22 — an intentional reference quirk we replicate).

All functions are pure; stochastic rounding takes an explicit PRNG key.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

_ROUNDINGS = ("nearest", "stochastic", "up", "down")


def _pow2f(k: Array) -> Array:
    """Exact 2^k as float32 for integer k in [-126, 127] (bit construction)."""
    k = k.astype(jnp.int32)
    bits = (k + 127) << 23
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _mul_pow2(x: Array, k: Array) -> Array:
    """x * 2^k, exact, supporting |k| up to 252 without overflow of 2^k."""
    k = jnp.asarray(k, jnp.int32)
    k1 = jnp.clip(k, -126, 126)
    k2 = k - k1
    # apply the small remainder first: going down through the subnormal range
    # in one final step avoids double rounding
    return x * _pow2f(k2) * _pow2f(k1)


def _is_zero(x: Array) -> Array:
    """Bit-level zero test (float compares may flush subnormals to zero)."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    return (bits & 0x7FFFFFFF) == 0


def _exponent_of(x: Array) -> Array:
    """floor(log2(|x|)) for normal fp32 x via bit extraction; 0 where x == 0."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    e = ((bits >> 23) & 0xFF) - 127
    return jnp.where(_is_zero(x), 0, e)


def _round_int_on_grid(
    scaled: Array, rounding: str, key: Optional[Array], bit_mode: bool = False
) -> Array:
    """Round pre-scaled values to integers per the reference rounding mode.

    ``scaled`` is x / step; the caller guarantees |scaled| is small enough for
    exact fp32 integer arithmetic (< 2^24).

    ``bit_mode`` selects the semantics of the reference's *bitwise* rounding
    (round_bitwise, quant_cpu.cpp:211-237), used by the float/block kernels:
    it operates on sign-magnitude fp32 bits, so "down" truncates toward zero
    and "up" adds a full ulp to the magnitude (bumping even exact-grid values
    away from zero).  The fixed-point kernel uses true ceil/floor
    (sim_helper.cpp:24-39), i.e. bit_mode=False.
    """
    if rounding == "nearest":
        # nearbyint == round-half-even (quant_cpu.cpp:119; fenv default).
        return jnp.round(scaled)
    elif rounding == "stochastic":
        if key is None:
            raise ValueError("stochastic rounding requires a PRNG key")
        r = jax.random.uniform(key, scaled.shape, dtype=jnp.float32)
        # reference: nearbyint(a + r - 0.5) with r ~ U[0,1) (sim_helper.cpp:14)
        return jnp.round(scaled + r - 0.5)
    elif rounding == "up":
        if bit_mode:
            return jnp.sign(scaled) * (jnp.floor(jnp.abs(scaled)) + 1.0)
        return jnp.ceil(scaled)
    elif rounding == "down":
        if bit_mode:
            return jnp.trunc(scaled)
        return jnp.floor(scaled)
    raise ValueError(f"unknown rounding mode: {rounding}")


# ---------------------------------------------------------------------------
# fixed point
# ---------------------------------------------------------------------------


def fixed_point_quantize(
    x: Array,
    wl: int,
    fl: int,
    clamp: bool = True,
    symmetric: bool = False,
    rounding: str = "nearest",
    key: Optional[Array] = None,
) -> Array:
    """Fake-quantize to a ``wl``-bit fixed point grid with ``fl`` fraction bits.

    Reference: fixed_point_quantize_{nearest,stochastic,up,down}
    (quant_cpu.cpp:125-209) + fixed_min_max (sim_helper.cpp:5-12).
    """
    assert rounding in _ROUNDINGS
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    scaled = _mul_pow2(xf, fl)  # x * 2^fl, exact
    q = _round_int_on_grid(scaled, rounding, key)
    q = _mul_pow2(q, -fl)
    if clamp:
        t_min = -(2.0 ** (wl - fl - 1))
        t_max = -t_min - 2.0 ** (-fl)
        if symmetric:
            t_min = t_min + 2.0 ** (-fl)
        q = jnp.clip(q, t_min, t_max)
    return q.astype(orig_dtype)


# ---------------------------------------------------------------------------
# low-bit floating point
# ---------------------------------------------------------------------------


def float_quantize(
    x: Array,
    man: int,
    exp: int,
    bias: Optional[int] = None,
    flush_subnormal: bool = True,
    rounding: str = "nearest",
    key: Optional[Array] = None,
) -> Array:
    """Fake-quantize to a float format with ``man`` mantissa / ``exp`` exponent bits.

    Reference: float_quantize (quant_cpu.cpp:359-402), float_kernel.cu.
    """
    assert rounding in _ROUNDINGS
    if bias is None:
        bias = 2 ** (exp - 1) - 1
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)

    zero = _is_zero(xf)
    e = _exponent_of(xf)
    min_exp = -(bias - 1)
    subnormal = (e < min_exp) & ~zero

    # --- normal path: grid step 2^(e - man), e clamped for safe arithmetic
    e_n = jnp.maximum(e, min_exp)
    scaled = _mul_pow2(xf, man - e_n)
    q = _round_int_on_grid(scaled, rounding, key, bit_mode=True)
    q_norm = _mul_pow2(q, e_n - man)
    # overflow clip (bit_helper.cpp clip_exponent): max exponent from the
    # DEFAULT bias, irrespective of the custom bias.
    emax = 2 ** (exp - 1)
    q_e = _exponent_of(q_norm)
    maxv = (2.0 - 2.0 ** (-man)) * 2.0**emax if emax + 1 <= 127 else jnp.inf
    q_norm = jnp.where(
        (q_e > emax) & ~_is_zero(q_norm), jnp.sign(q_norm) * maxv, q_norm
    )

    # --- subnormal path
    if flush_subnormal:
        q_sub = jnp.zeros_like(xf)
    else:
        # Fixed grid 2^(min_exp - man); the reference's shift trick
        # (quant_cpu.cpp:376-387) reduces to round-half-even on this grid.
        # Implemented via integer mantissa decomposition because XLA flushes
        # fp32-subnormal operands (DAZ), which would corrupt float arithmetic
        # on subnormal inputs or subnormal grid steps.
        bits = jax.lax.bitcast_convert_type(xf, jnp.int32)
        E = (bits >> 23) & 0xFF
        m_int = bits & 0x7FFFFF
        mant = jnp.where(E > 0, m_int + (1 << 23), m_int).astype(jnp.float32)
        sc = jnp.where(E > 0, E - 150, -149)  # |x| = mant * 2^sc exactly
        k = sc - (min_exp - man)
        # when the true scaled magnitude underflows fp32, any stand-in in
        # (0, 0.5) rounds identically (to 0 down/nearest, 1 up)
        mag = jnp.where(
            k >= -126,
            _mul_pow2(mant, jnp.maximum(k, -126)),
            jnp.float32(2.0**-103),
        )
        # The reference shift trick computes val = x + sign*2^min_exp in
        # fp32, which first rounds x onto the 2^(min_exp-23) grid (nearest
        # even) and THEN bit-rounds to the format grid: double rounding that
        # we replicate exactly.
        k1 = k + (23 - man)  # scale to the fp32-mantissa grid at min_exp
        fine = jnp.where(
            k1 >= -126,
            _mul_pow2(mant, jnp.maximum(k1, -126)),
            jnp.float32(2.0**-103),
        )
        s1 = jnp.round(jnp.where(bits < 0, -fine, fine))  # the fp32 add
        scaled_s = s1 * jnp.float32(2.0 ** (man - 23))  # exact
        qs = _round_int_on_grid(scaled_s, rounding, key, bit_mode=True)
        if rounding == "up":
            # bitwise-up bumps even exact zeros away from zero, with the
            # ORIGINAL sign (the shift carries x's sign, quant_cpu.cpp:380)
            qs = jnp.where(qs == 0.0, jnp.where(bits < 0, -1.0, 1.0), qs)
        if min_exp - man >= -126:
            q_sub = _mul_pow2(qs, min_exp - man)
        else:
            # subnormal result: build the bits directly; integer mantissa
            # carry into the exponent field is the correct IEEE encoding
            gb = (min_exp - man) + 149
            q_abs = (jnp.abs(qs).astype(jnp.int32)) << gb
            q_bits = jnp.where(qs < 0, q_abs | jnp.int32(-(2**31)), q_abs)
            q_sub = jax.lax.bitcast_convert_type(q_bits, jnp.float32)

    out = jnp.where(subnormal, q_sub, q_norm)
    out = jnp.where(zero, xf, out)
    return out.astype(orig_dtype)


# ---------------------------------------------------------------------------
# block floating point
# ---------------------------------------------------------------------------


def block_quantize(
    x: Array,
    wl: int,
    rounding: str = "nearest",
    key: Optional[Array] = None,
) -> Array:
    """Symmetric BFP fake-quantization of blocks laid out along the last axis.

    Each trailing-axis vector of ``x`` is one block sharing the exponent of its
    absolute max.  Reference: block_quantize_helper (quant_cpu.cpp:239-275) and
    block_kernel.cu:5-75.  The reference is always called with symmetric=True
    from the Format layer; asymmetric mantissas are produced by
    :func:`make_mantissa_asymmetric` as a post-pass.
    """
    assert rounding in _ROUNDINGS
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    e = _exponent_of(amax)
    # Reference rebase trick (quant_cpu.cpp:239-275): t = x + 6*2^e lands in
    # [5*2^e, 7*2^e] so its fp32 exponent is fixed at e+2 and bit-rounding
    # keeps wl mantissa bits => grid step 2^(e+2-wl).  Computing the ADD in
    # fp32 first replicates the reference's double rounding (the sum itself
    # rounds to 24-bit precision before the grid rounding) bit-exactly.
    base = _mul_pow2(jnp.full_like(xf, 1.5), e + 2)  # 6 * 2^e, exact
    t = xf + base  # fp32 add: first rounding
    scaled = _mul_pow2(t, wl - 2 - e)
    q = _round_int_on_grid(scaled, rounding, key, bit_mode=True)  # t > 0
    q = _mul_pow2(q, e + 2 - wl) - base
    q = jnp.where(_is_zero(amax), xf, q)  # all-zero blocks pass through
    # clip_max_exponent(wl-2, e): clamp only when the result reached 2^(e+1).
    lim = _mul_pow2(jnp.ones_like(amax), e + 1)  # 2^(e+1)
    maxv = (2.0 - 2.0 ** (-(wl - 2))) * _mul_pow2(jnp.ones_like(amax), e)
    q = jnp.where(jnp.abs(q) >= lim, jnp.sign(q) * maxv, q)
    return q.astype(orig_dtype)


def make_mantissa_asymmetric(q: Array, x: Array, n_mantissa_bits: int = 8) -> Array:
    """Asymmetric-mantissa post-pass for BFP blocks along the last axis.

    Where a symmetric-quantized element sits at the most-negative symmetric
    mantissa ``-(2^(n-1)-1)``, move it one step further down to ``-2^(n-1)``
    when that does not increase (ties included) the quantization error.
    Reference: BlockFloatingPoint.make_mantissa_asymmetric (format.py:349-372).
    """
    qf = q.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    man, ex = jnp.frexp(qf)
    ex = jnp.where((ex == 0) & (man == 0.0), -200, ex)
    max_exp = jnp.max(ex, axis=-1, keepdims=True) - n_mantissa_bits + 1
    int_man = _mul_pow2(man, ex - max_exp).astype(jnp.int32)
    edge = int_man == -(2 ** (n_mantissa_bits - 1) - 1)
    old_err = qf - xf
    step = _mul_pow2(jnp.ones_like(qf), max_exp)
    cand_err = old_err - step
    subtract = edge & (jnp.abs(cand_err) <= jnp.abs(old_err))
    new_q = jnp.where(subtract, qf - step, qf)
    return new_q.astype(q.dtype)


def block_quantize_lastdim(
    x: Array,
    wl: int,
    block_size: int,
    rounding: str = "nearest",
    key: Optional[Array] = None,
) -> Array:
    """Reshape-free symmetric BFP over the last axis (bit-identical to
    :func:`block_quantize` on a blocked view).

    The transpose/reshape/pad layout of ``apply_blockwise`` compiles into
    many small TPU kernels; on the serving path that op overhead dominates
    decode latency.  This variant keeps the data layout: per-block maxima via
    ``reduce_window`` and a lane-broadcast of the shared exponent via
    ``jnp.repeat`` — a handful of fusable ops.  Requires
    ``x.shape[-1] % block_size == 0``.
    """
    assert rounding in _ROUNDINGS
    assert x.shape[-1] % block_size == 0
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    window = (1,) * (xf.ndim - 1) + (block_size,)
    amax = jax.lax.reduce_window(
        jnp.abs(xf), -jnp.inf, jax.lax.max, window, window, "VALID"
    )  # [..., K // B]
    e = jnp.repeat(_exponent_of(amax), block_size, axis=-1)  # [..., K]
    zero = jnp.repeat(_is_zero(amax), block_size, axis=-1)
    base = _mul_pow2(jnp.full_like(xf, 1.5), e + 2)  # 6 * 2^e, exact
    t = xf + base  # fp32 add: reference double rounding
    scaled = _mul_pow2(t, wl - 2 - e)
    q = _round_int_on_grid(scaled, rounding, key, bit_mode=True)  # t > 0
    q = _mul_pow2(q, e + 2 - wl) - base
    lim = _mul_pow2(jnp.ones_like(xf), e + 1)
    maxv = (2.0 - 2.0 ** (-(wl - 2))) * _mul_pow2(jnp.ones_like(xf), e)
    q = jnp.where(jnp.abs(q) >= lim, jnp.sign(q) * maxv, q)
    q = jnp.where(zero, xf, q)
    return q.astype(orig_dtype)


# ---------------------------------------------------------------------------
# shaping helper: blocks along an arbitrary dim with remainder handling
# ---------------------------------------------------------------------------


def apply_blockwise(x: Array, block_dim: int, block_size: int, fn) -> Array:
    """Apply ``fn`` on an array reshaped so blocks lie along the last axis.

    Mirrors the reference's transpose -> reshape(-1, L) -> split(block_size)
    layout (format.py:322-341): blocks are *contiguous runs* of ``block_size``
    elements along ``block_dim``; a short final block is emulated by
    zero-padding (zeros never affect a block's absolute max and quantize to
    themselves under every supported format).
    """
    if x.ndim == 0:
        x = x.reshape(1, 1)
        squeeze = True
    else:
        squeeze = False
    block_dim = block_dim % x.ndim
    xt = jnp.moveaxis(x, block_dim, -1)
    shape = xt.shape
    L = shape[-1]
    pad = (-L) % block_size
    flat = xt.reshape(-1, L)
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, pad)))
    blocks = flat.reshape(flat.shape[0], -1, block_size)
    out = fn(blocks)
    out = out.reshape(flat.shape[0], L + pad)[:, :L]
    out = out.reshape(shape)
    out = jnp.moveaxis(out, -1, block_dim)
    if squeeze:
        out = out.reshape(())
    return out
