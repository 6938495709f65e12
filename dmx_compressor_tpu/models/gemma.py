"""Gemma-family decoder: Llama topology with Gemma's quirks.

Covers the reference's Gemma substitution surface (reference
fx/transformer/utils.py:30-51 maps GemmaRMSNorm / GemmaRotaryEmbedding into
the dmx module zoo) as an authored zoo model.  Gemma differs from Llama by:

- ``GemmaRMSNorm`` — the (1 + weight) variant (rawnn.GemmaRMSNorm, matching
  reference custom_modules.py:14);
- hidden states scaled by ``sqrt(hidden_size)`` after the embedding;
- an explicit ``head_dim`` decoupled from ``hidden_size / num_heads``
  (Gemma-2B: 2048 hidden, 8 heads, head_dim 256);
- a GeGLU MLP with tanh-approximated GELU (``gelu_pytorch_tanh``);
- always-tied input/output embeddings.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp
from flax import nnx

from .. import rawnn
from ..ops.kv_cache import cache_seq_len, KVCache, make_caches


@dataclasses.dataclass
class GemmaConfig:
    vocab_size: int = 256000
    hidden_size: int = 2048
    intermediate_size: int = 16384
    num_hidden_layers: int = 18
    num_attention_heads: int = 8
    num_key_value_heads: int = 1
    head_dim: int = 256
    max_position_embeddings: int = 8192
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    dtype: Any = jnp.float32

    @classmethod
    def from_hf(cls, j):
        return cls(
            vocab_size=j["vocab_size"],
            hidden_size=j["hidden_size"],
            intermediate_size=j["intermediate_size"],
            num_hidden_layers=j["num_hidden_layers"],
            num_attention_heads=j["num_attention_heads"],
            num_key_value_heads=j.get("num_key_value_heads", 1),
            head_dim=j.get(
                "head_dim", j["hidden_size"] // j["num_attention_heads"]
            ),
            max_position_embeddings=j.get("max_position_embeddings", 8192),
            rms_norm_eps=j.get("rms_norm_eps", 1e-6),
            rope_theta=j.get("rope_theta", 10000.0),
        )

    @classmethod
    def tiny(cls):
        return cls(
            vocab_size=512,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=1,
            head_dim=32,  # decoupled from hidden/heads (= 16) on purpose
            max_position_embeddings=64,
        )


class GemmaAttention(nnx.Module):
    def __init__(self, cfg: GemmaConfig, *, rngs: nnx.Rngs):
        d = cfg.hidden_size
        self.num_heads = cfg.num_attention_heads
        self.num_kv_heads = cfg.num_key_value_heads
        self.head_dim = cfg.head_dim
        q_dim = self.num_heads * self.head_dim
        kv_dim = self.num_kv_heads * self.head_dim
        self.q_proj = nnx.Linear(d, q_dim, use_bias=False, rngs=rngs)
        self.k_proj = nnx.Linear(d, kv_dim, use_bias=False, rngs=rngs)
        self.v_proj = nnx.Linear(d, kv_dim, use_bias=False, rngs=rngs)
        self.o_proj = nnx.Linear(q_dim, d, use_bias=False, rngs=rngs)
        self.apply_rope = rawnn.ApplyRotaryPosEmb()
        self.sdpa = rawnn.ScaledDotProductAttention()

    def _split(self, x, heads):
        B, T, _ = x.shape
        return x.reshape(B, T, heads, self.head_dim).transpose(0, 2, 1, 3)

    def fuse_for_inference(self) -> None:
        """Merge q/k/v into one packed projection when possible (called by
        ops.compress.compress_for_inference; bit-exact — GQA widths and the
        decoupled head_dim included)."""
        from ..ops.compress import merge_parallel_linears

        merged = merge_parallel_linears([self.q_proj, self.k_proj, self.v_proj])
        if merged is not None:
            self.qkv_merged = merged

    def _project_qkv(self, x):
        merged = getattr(self, "qkv_merged", None)
        if merged is not None:
            qkv = merged(x)
            d = self.num_heads * self.head_dim
            kv = self.num_kv_heads * self.head_dim
            return qkv[..., :d], qkv[..., d : d + kv], qkv[..., d + kv :]
        return self.q_proj(x), self.k_proj(x), self.v_proj(x)

    def __call__(self, x, cos, sin, attn_mask=None, cache: Optional[KVCache] = None,
                 prefill_offset: Optional[int] = None):
        B, T, _ = x.shape
        _q, _k, _v = self._project_qkv(x)
        q = self._split(_q, self.num_heads)
        k = self._split(_k, self.num_kv_heads)
        v = self._split(_v, self.num_kv_heads)
        q, k = self.apply_rope(q, k, cos, sin)
        gqa = self.num_kv_heads != self.num_heads
        if prefill_offset is not None:
            from ..ops.flash_attention import flash_chunked_prefill, flash_prefill

            out = (
                flash_prefill(self.sdpa, q, k, v, cache=cache)
                if prefill_offset == 0
                else flash_chunked_prefill(
                    self.sdpa, q, k, v, cache=cache, offset=prefill_offset
                )
            )
            if out is not None:
                out = out.transpose(0, 2, 1, 3).reshape(
                    B, T, self.num_heads * self.head_dim
                )
                return self.o_proj(out)
        from ..ops.flash_decode import cached_attend

        out = cached_attend(self.sdpa, q, k, v, cache, attn_mask,
                            enable_gqa=gqa)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, self.num_heads * self.head_dim)
        return self.o_proj(out)


class GemmaMLP(nnx.Module):
    def __init__(self, cfg: GemmaConfig, *, rngs: nnx.Rngs):
        d, m = cfg.hidden_size, cfg.intermediate_size
        self.intermediate_size = m
        self.gate_proj = nnx.Linear(d, m, use_bias=False, rngs=rngs)
        self.up_proj = nnx.Linear(d, m, use_bias=False, rngs=rngs)
        self.down_proj = nnx.Linear(m, d, use_bias=False, rngs=rngs)
        self.act_fn = rawnn.GELU(approximate="tanh")  # gelu_pytorch_tanh
        self.mul = rawnn.Mul()

    def fuse_for_inference(self) -> None:
        """Merge gate/up into one packed projection (one fused kernel + one
        shared input cast; bit-exact, see merge_parallel_linears)."""
        from ..ops.compress import merge_parallel_linears

        merged = merge_parallel_linears([self.gate_proj, self.up_proj])
        if merged is not None:
            self.gateup_merged = merged

    def __call__(self, x):
        merged = getattr(self, "gateup_merged", None)
        if merged is not None:
            gu = merged(x)
            m = self.intermediate_size
            return self.down_proj(self.mul(self.act_fn(gu[..., :m]), gu[..., m:]))
        return self.down_proj(self.mul(self.act_fn(self.gate_proj(x)), self.up_proj(x)))


class GemmaDecoderLayer(nnx.Module):
    def __init__(self, cfg: GemmaConfig, *, rngs: nnx.Rngs):
        d = cfg.hidden_size
        self.self_attn = GemmaAttention(cfg, rngs=rngs)
        self.mlp = GemmaMLP(cfg, rngs=rngs)
        self.input_layernorm = rawnn.GemmaRMSNorm(d, eps=cfg.rms_norm_eps)
        self.post_attention_layernorm = rawnn.GemmaRMSNorm(d, eps=cfg.rms_norm_eps)
        self.resadd1 = rawnn.ResAdd()
        self.resadd2 = rawnn.ResAdd()

    def __call__(self, x, cos, sin, attn_mask=None, cache=None,
                 prefill_offset: Optional[int] = None):
        if (
            x.shape[1] == 1
            and cache is not None
            and attn_mask is not None
            and jnp.issubdtype(jnp.asarray(attn_mask).dtype, jnp.floating)
        ):
            from ..ops.basic_layer import (
                basic_gemma_layer_plan,
                fused_llama_family_step,
            )

            plan = basic_gemma_layer_plan(self)
            if plan is not None:
                return fused_llama_family_step(
                    self, x, cos, sin, attn_mask, cache, plan
                )
        x = self.resadd1(
            self.self_attn(self.input_layernorm(x), cos, sin, attn_mask, cache,
                           prefill_offset=prefill_offset), x
        )
        x = self.resadd2(self.mlp(self.post_attention_layernorm(x)), x)
        return x


class GemmaModel(nnx.Module):
    def __init__(self, cfg: GemmaConfig, *, rngs: nnx.Rngs):
        self.cfg = cfg
        self.embed_tokens = nnx.Embed(cfg.vocab_size, cfg.hidden_size, rngs=rngs)
        self.layers = nnx.data(
            [GemmaDecoderLayer(cfg, rngs=rngs) for _ in range(cfg.num_hidden_layers)]
        )
        self.norm = rawnn.GemmaRMSNorm(cfg.hidden_size, eps=cfg.rms_norm_eps)
        self.rotary_emb = rawnn.RotaryEmbedding(
            cfg.head_dim, cfg.max_position_embeddings, base=cfg.rope_theta
        )

    def __call__(self, input_ids, caches=None, position_offset=0,
                 apply_final_norm: bool = True):
        B, T = input_ids.shape
        x = self.embed_tokens(input_ids)
        # HF GemmaModel scales hidden states by sqrt(hidden) in x's dtype
        x = x * jnp.asarray(self.cfg.hidden_size**0.5, x.dtype)
        from .positions import causal_mask, resolve_positions

        pos, _ = resolve_positions(T, position_offset)
        cos, sin = self.rotary_emb(x, pos)
        if caches is not None:
            S = cache_seq_len(caches[0])
            mask = causal_mask(T, S, position_offset, x.dtype)
        else:
            mask = causal_mask(T, T, 0, x.dtype)
        prefill_offset = (
            position_offset
            if (
                T > 1
                and isinstance(position_offset, int)
                and (position_offset == 0 or caches is not None)
            )
            else None
        )
        for i, layer in enumerate(self.layers):
            x = layer(x, cos, sin, attn_mask=mask,
                      cache=None if caches is None else caches[i],
                      prefill_offset=prefill_offset)
        return self.norm(x) if apply_final_norm else x


class GemmaForCausalLM(nnx.Module):
    def __init__(self, cfg: GemmaConfig, *, rngs: nnx.Rngs):
        self.cfg = cfg
        self.model = GemmaModel(cfg, rngs=rngs)
        self.lm_head = rawnn.TiedLinear(self.model.embed_tokens)  # always tied

    @property
    def config(self):
        return self.cfg

    def __call__(self, input_ids, caches=None, position_offset=0):
        if input_ids.shape[1] == 1 and caches is not None:
            # decode tail: fuse the final RMSNorm into the LM-head kernel
            # when the BASIC shapes prove out (ops/basic_layer.py)
            from ..ops.basic_layer import basic_rms_head_plan, fused_rms_head

            plan = basic_rms_head_plan(
                self.model.norm, self.lm_head, gemma_norm=True
            )
            if plan is not None:
                h = self.model(input_ids, caches=caches,
                               position_offset=position_offset,
                               apply_final_norm=False)
                return fused_rms_head(
                    h, self.model.norm, self.lm_head, plan, gemma_norm=True
                )
        h = self.model(input_ids, caches=caches, position_offset=position_offset)
        return self.lm_head(h)

    def init_cache(self, batch: int, max_len: int, dtype=None,
                   quantized: bool = False, per_row: bool = False,
                   split_base_len: Optional[int] = None):
        cfg = self.cfg
        return make_caches(
            cfg.num_hidden_layers,
            batch,
            cfg.num_key_value_heads,
            max_len,
            cfg.head_dim,
            dtype or cfg.dtype,
            quantized=quantized,
            per_row=per_row,
            split_base_len=split_base_len,
        )
