"""Physical BFP representation: packed integer mantissas + shared exponents.

The reference only ever *simulates* BFP in fp32 (its CUDA kernels output fp32,
quant/README.md); the fake-quant values are never stored packed.  On TPU the
physical representation is the performance path: BFP16_64 weights stored as
int8 mantissas + one uint8 exponent per 64-block cut HBM traffic ~4x vs fp32,
and decode-time GEMMs are bandwidth-bound — so the fused dequant-matmul
(ops/bfp_linear.py) beats the unquantized baseline rather than merely
matching it.

``bfp_pack`` produces exactly the mantissas/exponents whose reconstruction
``man * 2^(e + 2 - wl)`` is bit-identical to
``numerics.rounding.block_quantize`` (golden-tested).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..numerics import rounding as R

Array = jax.Array


class PackedBFP(NamedTuple):
    """BFP payload for a 2D tensor blocked along the last axis.

    mantissa: int8/int32 [..., N] integer mantissas in
        [-(2^(wl-1)-1), 2^(wl-1)-1]
    exponent: int8 [..., N // block_size] shared exponent e (biased by -127
        at reconstruction time is NOT applied: stored as the raw binary
        exponent of the block max, i.e. floor(log2(max|block|)))
    precision: wl
    block_size: B
    """

    mantissa: Array
    exponent: Array
    precision: int
    block_size: int

    @property
    def shape(self):
        return self.mantissa.shape


def bfp_pack(x: Array, precision: int = 8, block_size: int = 64) -> PackedBFP:
    """Pack a tensor into BFP mantissas/exponents along the last axis.

    Requires the last dim to be a multiple of ``block_size`` (weights in the
    zoo always are).  Rounding is nearest-even with the reference's
    saturate-at-2^(e+1) clip (numerics/rounding.py block_quantize semantics).
    """
    *lead, n = x.shape
    assert n % block_size == 0, f"{n} not a multiple of block {block_size}"
    xf = x.astype(jnp.float32).reshape(*lead, n // block_size, block_size)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    e = R._exponent_of(amax)
    # mantissa = round((x + 6*2^e) / 2^(e+2-wl)) - 3*2^(wl-1): the reference
    # rebase-add (with its fp32 double rounding) so packed values are
    # bit-identical to the simulated block_quantize; clip to the symmetric
    # range (overflow rule: values reaching 2^(e+1) clamp to the max mantissa)
    base = R._mul_pow2(jnp.full_like(xf, 1.5), e + 2)
    t = xf + base
    man = jnp.round(R._mul_pow2(t, precision - 2 - e)) - float(3 * 2 ** (precision - 1))
    limit = float(2 ** (precision - 1))
    man = jnp.where(jnp.abs(man) >= limit, jnp.sign(man) * (limit - 1), man)
    man_dtype = jnp.int8 if precision <= 8 else jnp.int32
    return PackedBFP(
        mantissa=man.reshape(*lead, n).astype(man_dtype),
        exponent=e[..., 0].astype(jnp.int8),
        precision=precision,
        block_size=block_size,
    )


def bfp_unpack(p: PackedBFP) -> Array:
    """Reconstruct fp32 values: man * 2^(e + 2 - wl)."""
    *lead, n = p.mantissa.shape
    man = p.mantissa.astype(jnp.float32).reshape(*lead, n // p.block_size, p.block_size)
    e = p.exponent.astype(jnp.int32)[..., None]
    out = R._mul_pow2(man, e + 2 - p.precision)
    return out.reshape(*lead, n)


def int_group_pack(
    x: Array, bits: int = 8, group_size: int = 64, symmetric: bool = True
) -> Tuple[Array, Array, Array]:
    """Affine integer group quantization along the last axis (the OPT-1.3B
    INT8-group weight path).  Returns (q_int8, scale_f32, zero_point_int32)
    with one (scale, zp) per group."""
    *lead, n = x.shape
    assert n % group_size == 0
    xf = x.astype(jnp.float32).reshape(*lead, n // group_size, group_size)
    qmax = 2 ** (bits - 1) - 1
    if symmetric:
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        scale = jnp.maximum(amax / qmax, 1e-10)
        zp = jnp.zeros_like(scale, jnp.int32)
    else:
        lo = jnp.minimum(jnp.min(xf, axis=-1, keepdims=True), 0.0)
        hi = jnp.maximum(jnp.max(xf, axis=-1, keepdims=True), 0.0)
        qmin = -(2 ** (bits - 1))
        scale = jnp.maximum((hi - lo) / (qmax - qmin), 1e-10)
        zp = jnp.clip(qmin - jnp.round(lo / scale), qmin, qmax).astype(jnp.int32)
    q = jnp.clip(jnp.round(xf / scale) + zp, -(2 ** (bits - 1)), qmax)
    return (
        q.reshape(*lead, n).astype(jnp.int8),
        scale[..., 0],
        zp[..., 0],
    )


def int_group_unpack(q: Array, scale: Array, zp: Array, group_size: int = 64) -> Array:
    *lead, n = q.shape
    qf = q.astype(jnp.float32).reshape(*lead, n // group_size, group_size)
    out = (qf - zp[..., None].astype(jnp.float32)) * scale[..., None]
    return out.reshape(*lead, n)


class PackedSBFP(NamedTuple):
    """SBFP payload for a 2D tensor blocked along the last axis
    (numerics/format.py ScaledBlockFloatingPoint; reference format.py:400-511).

    nibbles: uint8 [..., N // 2] — two two's-complement int4 mantissas per
        byte (low nibble = even index); mantissas are the INT4 values of
        ``block_format.cast(block / chunk_max)``, i.e. in [-7, 7]
    scale: float32 [..., N // block_size] — the scaler_format-cast chunk max
        (zero for all-zero blocks)
    block_size: B (16 for SBFP12_16)
    """

    nibbles: Array
    scale: Array
    block_size: int

    @property
    def n(self):
        return self.nibbles.shape[-1] * 2


def sbfp_pack(x: Array, fmt) -> PackedSBFP:
    """Pack along the last axis; reconstruction is bit-identical to
    ``fmt.cast(x, -1)`` (all-zero blocks included)."""
    *lead, n = x.shape
    B = fmt.block_size
    assert n % B == 0, f"{n} not a multiple of block {B}"
    assert fmt.block_format.precision <= 4, "nibble packing is int4"
    xf = x.astype(jnp.float32).reshape(*lead, n // B, B)
    chunk_max = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / fmt.man_scaling
    safe_max = jnp.where(chunk_max > 0.0, chunk_max, 1.0)
    man = fmt.block_format.cast(xf / safe_max)  # integer-valued floats
    scale = jnp.where(
        chunk_max > 0.0, fmt.scaler_format.cast(chunk_max), 0.0
    )[..., 0]
    man = man.reshape(*lead, n).astype(jnp.int32)
    lo = man[..., 0::2] & 0xF
    hi = man[..., 1::2] & 0xF
    return PackedSBFP(
        nibbles=(lo | (hi << 4)).astype(jnp.uint8),
        scale=scale.astype(jnp.float32),
        block_size=B,
    )


def sbfp_unpack(p: PackedSBFP) -> Array:
    """Dequantize to f32; == the simulated SBFP cast bit-for-bit."""
    b = p.nibbles.astype(jnp.int32)
    lo = b & 0xF
    lo = lo - ((lo > 7) << 4)
    hi = (b >> 4) & 0xF
    hi = hi - ((hi > 7) << 4)
    *lead, half = b.shape
    man = jnp.stack([lo, hi], axis=-1).reshape(*lead, half * 2)
    man = man.reshape(*lead, half * 2 // p.block_size, p.block_size)
    return (
        man.astype(jnp.float32) * p.scale[..., None]
    ).reshape(*lead, half * 2)
