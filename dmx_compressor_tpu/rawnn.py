"""Raw (un-quantized) op modules for authoring transformable models.

The reference intercepts *functional* ops (bare ``torch.matmul``, ``+``,
softmax, SDPA) by tracing models with torch.fx and substituting graph nodes
(reference: src/dmx/compressor/fx/).  JAX tracing (jaxpr) erases module
structure, so this build makes op interception *static*: models are authored
with these light nnx wrapper modules at the places the reference's tracer
would have caught a functional op.  The substitution pass
(transform/substitute.py) then maps each to its Dmx-aware counterpart — the
same op-substitution table, applied to a module tree instead of an fx graph.

All wrappers are exact; they carry no quantization state.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx


class ResAdd(nnx.Module):
    def __call__(self, x, residual):
        return x + residual


class Mul(nnx.Module):
    def __call__(self, x, multiplier):
        return x * multiplier


class MatMul(nnx.Module):
    """Activation x activation matmul (maps to dmxnn.ActActMatMul)."""

    def __call__(self, a, b):
        return jnp.matmul(a, b)


class TiedLinear(nnx.Module):
    """LM head tied to an embedding table: y = x @ E.T.

    Holds a shared reference to the embedding module, so substitution maps it
    to a dmxnn.Linear whose weight Param *is* the embedding table (pointer
    tying, like the reference's update_params_with_raw, core.py:277-299).
    HF models represent tied heads as nn.Linear and the reference quantizes
    them as Linears — this wrapper preserves that semantics.
    """

    def __init__(self, embed):
        self.embed_ref = embed

    def _table(self):
        e = self.embed_ref
        p = getattr(e, "embedding", None) or getattr(e, "weight")
        return p.value

    def __call__(self, x):
        return x @ self._table().T.astype(x.dtype)


class BAddBMM(nnx.Module):
    def __call__(self, x, batch1, batch2, beta=1, alpha=1):
        return beta * x + alpha * jnp.matmul(batch1, batch2)


class Exp(nnx.Module):
    def __call__(self, x):
        return jnp.exp(x)


class Softmax(nnx.Module):
    def __init__(self, dim: int = -1):
        self.dim = dim

    def __call__(self, x):
        return jax.nn.softmax(x, axis=self.dim)


class ReLU(nnx.Module):
    def __call__(self, x):
        return jax.nn.relu(x)


class ReLU6(nnx.Module):
    def __call__(self, x):
        return jnp.clip(x, 0.0, 6.0)


class SiLU(nnx.Module):
    def __call__(self, x):
        return jax.nn.silu(x)


class Tanh(nnx.Module):
    def __call__(self, x):
        return jnp.tanh(x)


class GELU(nnx.Module):
    def __init__(self, approximate: str = "none"):
        self.approximate = approximate

    def __call__(self, x):
        return jax.nn.gelu(x, approximate=self.approximate == "tanh")


class NewGELU(nnx.Module):
    def __call__(self, x):
        return jax.nn.gelu(x, approximate=True)


class FastGELU(nnx.Module):
    def __call__(self, x):
        return 0.5 * x * (1.0 + jnp.tanh(x * 0.7978845608 * (1.0 + 0.044715 * x * x)))


class QuickGELU(nnx.Module):
    def __call__(self, x):
        return x * jax.nn.sigmoid(1.702 * x)


class BloomGELU(nnx.Module):
    def __call__(self, x):
        return jax.nn.gelu(x, approximate=True)


class Dropout(nnx.Module):
    def __init__(self, p: float = 0.0):
        self.p = p

    def __call__(self, x):
        return x  # inference-mode identity; Dmx Dropout handles train mode


class ScaledDotProductAttention(nnx.Module):
    """Exact SDPA (maps to the compound dmxnn.ScaledDotProductAttention)."""

    def __init__(self, dropout_p: float = 0.0):
        self.dropout_p = dropout_p

    def __call__(self, query, key, value, attn_mask=None, is_causal=False, scale=None,
                 enable_gqa=False):
        d = query.shape[-1]
        scale_factor = 1.0 / math.sqrt(d) if scale is None else scale
        if enable_gqa:
            key = jnp.repeat(key, query.shape[-3] // key.shape[-3], axis=-3)
            value = jnp.repeat(value, query.shape[-3] // value.shape[-3], axis=-3)
        logits = jnp.matmul(query, jnp.swapaxes(key, -2, -1)) * scale_factor
        L, S = query.shape[-2], key.shape[-2]
        if is_causal:
            causal = jnp.tril(jnp.ones((L, S), bool))
            logits = jnp.where(causal, logits, -jnp.inf)
        if attn_mask is not None:
            if attn_mask.dtype == jnp.bool_:
                logits = jnp.where(attn_mask, logits, -jnp.inf)
            else:
                logits = logits + attn_mask
        w = jax.nn.softmax(logits, axis=-1)
        return jnp.matmul(w, value)


class ApplyRotaryPosEmb(nnx.Module):
    def __call__(self, q, k, cos, sin, unsqueeze_dim=1):
        cos_e = jnp.expand_dims(cos, unsqueeze_dim)
        sin_e = jnp.expand_dims(sin, unsqueeze_dim)

        def rotate_half(x):
            x1, x2 = jnp.split(x, 2, axis=-1)
            return jnp.concatenate([-x2, x1], axis=-1)

        return q * cos_e + rotate_half(q) * sin_e, k * cos_e + rotate_half(k) * sin_e


class RotaryEmbedding(nnx.Module):
    def __init__(self, dim: int, max_position_embeddings: int = 2048,
                 base: float = 10000.0, attention_scaling: float = 1.0):
        self.dim = dim
        self.max_position_embeddings = max_position_embeddings
        self.base = base
        self.attention_scaling = attention_scaling
        self.inv_freq = nnx.Variable(
            1.0 / (base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
        )

    def __call__(self, x, position_ids):
        freqs = position_ids[..., None].astype(jnp.float32) * self.inv_freq.value[None, None, :]
        emb = jnp.concatenate([freqs, freqs], axis=-1)
        return (
            (jnp.cos(emb) * self.attention_scaling).astype(x.dtype),
            (jnp.sin(emb) * self.attention_scaling).astype(x.dtype),
        )


class GemmaRMSNorm(nnx.Module):
    """Raw Gemma-style (1 + weight) RMSNorm."""

    def __init__(self, dim: int, eps: float = 1e-6):
        self.weight = nnx.Param(jnp.zeros((dim,)))
        self.eps = eps

    def __call__(self, x):
        xf = x.astype(jnp.float32)
        y = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + self.eps)
        return (y * (1.0 + self.weight.value.astype(jnp.float32))).astype(x.dtype)


class ClippedGELU(nnx.Module):
    def __init__(self, min: float = -10, max: float = 10):
        self.min, self.max = min, max

    def __call__(self, x):
        return jnp.clip(jax.nn.gelu(x), self.min, self.max)


class RMSNorm(nnx.Module):
    """Raw RMSNorm with torch-style weight (for models authored here)."""

    def __init__(self, dim: int, eps: float = 1e-6):
        self.weight = nnx.Param(jnp.ones((dim,)))
        self.eps = eps

    def __call__(self, x):
        xf = x.astype(jnp.float32)
        y = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + self.eps)
        return (y * self.weight.value.astype(jnp.float32)).astype(x.dtype)
