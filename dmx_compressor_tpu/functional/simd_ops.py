"""SIMD-accurate surrogate implementations of nonlinear ops.

The reference dispatches approximations to an external, closed-source
``dmx.common.vsimd`` op-reference package (reference:
src/dmx/compressor/functional/approximate.py:9-14); only the parameter
surfaces are public (knorm/kmax/use_exp_large for EXP, input_clamp/max_adjust
for SOFTMAX, tile_size for LAYER_NORM, norm for SLaNC-tuned norms).  This
module provides faithful fixed-point-style surrogates with those same
parameter surfaces so the AFT / SLaNC tuning hooks remain meaningful, written
as pure jax functions that XLA fuses on the TPU VPU.

All functions return the approximated output; callers combine them with the
exact op via the reference's value-replacement trick (see approximate.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

LN2 = 0.6931471805599453
INV_LN2 = 1.4426950408889634


def poly2exp(x: Array, knorm: int = 0, kmax: int = 15, use_exp_large: bool = True) -> Array:
    """Base-2 decomposition exponential surrogate.

    exp(x) = 2^k * exp(r) with k = round(x/ln2), r = x - k*ln2, |r| <= ln2/2;
    exp(r) evaluated by a degree-4 polynomial (SIMD-friendly: one table-free
    range reduction + Horner).  ``kmax`` clamps the exponent shift (hardware
    register width); ``knorm`` pre-biases the input by 2^-knorm as the vsimd
    parameter surface does; ``use_exp_large`` enables the large-argument path
    (without it, inputs with k > kmax saturate).
    """
    xf = x.astype(jnp.float32)
    if knorm:
        xf = xf * (2.0**-knorm)
    k_raw = jnp.round(xf * INV_LN2)
    k = jnp.clip(k_raw, -kmax, kmax if use_exp_large else 0)
    # hardware range reduction: the mantissa argument is bounded even when the
    # exponent shift saturates; values below 2^-kmax flush to zero
    r = jnp.clip(xf - k * LN2, -0.5 * LN2, 0.5 * LN2)
    # degree-4 polynomial for exp(r), |r| <= ln2/2
    p = 1.0 + r * (1.0 + r * (0.5 + r * (0.16666667 + r * 0.041666668)))
    out = p * jnp.exp2(k)
    out = jnp.where(k_raw < -kmax, 0.0, out)
    if knorm:
        out = out ** (2.0**knorm)
    return out.astype(x.dtype)


def exp(x: Array, knorm: int = 0, kmax: int = 15, use_exp_large: bool = True) -> Array:
    """EXP surrogate (vsimd parameter surface)."""
    return poly2exp(x, knorm=knorm, kmax=kmax, use_exp_large=use_exp_large)


def softmax(
    x: Array,
    dim: int = -1,
    input_clamp: Optional[float] = None,
    max_adjust: float = 0.0,
    knorm: int = 0,
    kmax: int = 15,
) -> Array:
    """Softmax surrogate: clamp -> max-subtract (with adjustable bias) ->
    poly2 exp -> normalize with Newton-refined reciprocal.

    ``input_clamp`` clips the logits from below (vsimd wrapper param,
    reference torch_modules.py:989-994); ``max_adjust`` offsets the subtracted
    max, emulating the hardware's inexact running-max.
    """
    xf = x.astype(jnp.float32)
    if input_clamp is not None:
        xf = jnp.maximum(xf, input_clamp)
    m = jnp.max(xf, axis=dim, keepdims=True) - max_adjust
    e = poly2exp(xf - m, knorm=knorm, kmax=kmax)
    s = jnp.sum(e, axis=dim, keepdims=True)
    # Newton-refined reciprocal (hardware rcp + 1 NR step)
    r0 = 1.0 / s
    r = r0 * (2.0 - s * r0)
    return (e * r).astype(x.dtype)


def _tiled_moments(x: Array, tile_size: Optional[int]) -> Tuple[Array, Array]:
    """Two-pass tiled mean/variance over the last axis (SIMD accumulation
    order: per-tile partial sums combined hierarchically)."""
    n = x.shape[-1]
    if tile_size is None or n % tile_size != 0 or tile_size >= n:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        return mean, var
    t = x.reshape(x.shape[:-1] + (n // tile_size, tile_size))
    tile_sum = jnp.sum(t, axis=-1)
    mean = jnp.sum(tile_sum, axis=-1, keepdims=True) / n
    d = t - mean[..., None]
    tile_sq = jnp.sum(jnp.square(d), axis=-1)
    var = jnp.sum(tile_sq, axis=-1, keepdims=True) / n
    return mean, var


def layer_norm(
    x: Array,
    normalized_shape,
    weight: Optional[Array] = None,
    bias: Optional[Array] = None,
    eps: float = 1e-5,
    tile_size: Optional[int] = None,
    norm: Optional[float] = None,
) -> Array:
    """LayerNorm surrogate with tiled accumulation and rsqrt + one NR step.

    ``norm`` is the SLaNC pre-scale 1/||W|| injected by the SLaNC recipe
    (reference layer_reconstruction.py:120-202): the input is pre-multiplied
    so intermediate squares stay in range on fixed-point hardware.
    """
    xf = x.astype(jnp.float32)
    if norm is not None:
        xf = xf * norm
    mean, var = _tiled_moments(xf, tile_size)
    r0 = jax.lax.rsqrt(var + eps)
    r = r0 * (1.5 - 0.5 * (var + eps) * r0 * r0)  # one Newton step
    y = (xf - mean) * r
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(
    x: Array,
    normalized_shape,
    weight: Optional[Array] = None,
    eps: float = 1e-6,
    tile_size: Optional[int] = None,
    norm: Optional[float] = None,
) -> Array:
    """RMSNorm surrogate; same tiling/NR structure as layer_norm."""
    xf = x.astype(jnp.float32)
    if norm is not None:
        xf = xf * norm
    n = x.shape[-1]
    if tile_size is not None and n % tile_size == 0 and tile_size < n:
        t = xf.reshape(xf.shape[:-1] + (n // tile_size, tile_size))
        ms = jnp.sum(jnp.sum(jnp.square(t), axis=-1), axis=-1, keepdims=True) / n
    else:
        ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    r0 = jax.lax.rsqrt(ms + eps)
    r = r0 * (1.5 - 0.5 * (ms + eps) * r0 * r0)
    y = xf * r
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    return y.astype(x.dtype)


def _sigmoid_via_exp(x: Array, **exp_kw) -> Array:
    e = poly2exp(-jnp.abs(x), **exp_kw)
    pos = 1.0 / (1.0 + e)
    return jnp.where(x >= 0, pos, 1.0 - pos)


def silu(x: Array, knorm: int = 0, kmax: int = 15) -> Array:
    """SiLU surrogate: x * sigmoid(x) with the poly2 exponential."""
    xf = x.astype(jnp.float32)
    return (xf * _sigmoid_via_exp(xf, knorm=knorm, kmax=kmax)).astype(x.dtype)


def quick_gelu(x: Array, knorm: int = 0, kmax: int = 15) -> Array:
    """QuickGELU surrogate: x * sigmoid(1.702 x) (reference HF activation)."""
    xf = x.astype(jnp.float32)
    return (xf * _sigmoid_via_exp(1.702 * xf, knorm=knorm, kmax=kmax)).astype(x.dtype)


def gelu(x: Array, approximate: str = "tanh") -> Array:
    """GELU surrogate (tanh form, SIMD polynomial tanh)."""
    xf = x.astype(jnp.float32)
    c = 0.7978845608028654  # sqrt(2/pi)
    u = c * (xf + 0.044715 * xf * xf * xf)
    e = poly2exp(-2.0 * jnp.abs(u))
    t = (1.0 - e) / (1.0 + e)
    t = jnp.where(u >= 0, t, -t)
    return (0.5 * xf * (1.0 + t)).astype(x.dtype)


def apply_rotary_pos_emb(
    q: Array, k: Array, cos: Array, sin: Array, unsqueeze_dim: int = 1
) -> Tuple[Array, Array]:
    """Llama-style RoPE surrogate (reference custom_function_mapping
    APPLY_LLAMA_ROPE): rotate-half formulation evaluated in fp32."""
    cos = jnp.expand_dims(cos, unsqueeze_dim).astype(jnp.float32)
    sin = jnp.expand_dims(sin, unsqueeze_dim).astype(jnp.float32)

    def rotate_half(x):
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate([-x2, x1], axis=-1)

    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    q_out = qf * cos + rotate_half(qf) * sin
    k_out = kf * cos + rotate_half(kf) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


FUNCTIONS = {
    "softmax": softmax,
    "exp": exp,
    "layer_norm": layer_norm,
    "rms_norm": rms_norm,
    "silu": silu,
    "gelu": gelu,
    "quick_gelu": quick_gelu,
    "apply_rotary_pos_emb": apply_rotary_pos_emb,
}
