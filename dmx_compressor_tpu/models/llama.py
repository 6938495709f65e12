"""Llama-family decoder (Llama-2/3, TinyLlama shapes) with GQA and RoPE.

Uses the rawnn RotaryEmbedding / ApplyRotaryPosEmb wrapper modules so the
substitution pass can intercept RoPE exactly where the reference's tracer
monkey-patches HF apply_rotary_pos_emb (reference fx/transformer/
custom_ops.py:7-23, transformer_function_mapping utils.py:68-72).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from .. import rawnn
from ..ops.kv_cache import cache_seq_len, KVCache, make_caches


@dataclasses.dataclass
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = False
    dtype: Any = jnp.float32

    @classmethod
    def from_hf(cls, j):
        return cls(
            vocab_size=j["vocab_size"],
            hidden_size=j["hidden_size"],
            intermediate_size=j["intermediate_size"],
            num_hidden_layers=j["num_hidden_layers"],
            num_attention_heads=j["num_attention_heads"],
            num_key_value_heads=j.get(
                "num_key_value_heads", j["num_attention_heads"]
            ),
            max_position_embeddings=j.get("max_position_embeddings", 4096),
            rms_norm_eps=j.get("rms_norm_eps", 1e-5),
            rope_theta=j.get("rope_theta", 10000.0),
            tie_word_embeddings=j.get("tie_word_embeddings", False),
        )

    @classmethod
    def tiny(cls):
        return cls(
            vocab_size=512,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=64,
        )


class LlamaAttention(nnx.Module):
    def __init__(self, cfg: LlamaConfig, *, rngs: nnx.Rngs):
        d = cfg.hidden_size
        self.num_heads = cfg.num_attention_heads
        self.num_kv_heads = cfg.num_key_value_heads
        self.head_dim = d // cfg.num_attention_heads
        kv_dim = self.num_kv_heads * self.head_dim
        self.q_proj = nnx.Linear(d, d, use_bias=False, rngs=rngs)
        self.k_proj = nnx.Linear(d, kv_dim, use_bias=False, rngs=rngs)
        self.v_proj = nnx.Linear(d, kv_dim, use_bias=False, rngs=rngs)
        self.o_proj = nnx.Linear(d, d, use_bias=False, rngs=rngs)
        self.apply_rope = rawnn.ApplyRotaryPosEmb()
        self.sdpa = rawnn.ScaledDotProductAttention()

    def _split(self, x, heads):
        B, T, _ = x.shape
        return x.reshape(B, T, heads, self.head_dim).transpose(0, 2, 1, 3)

    def fuse_for_inference(self) -> None:
        """Merge q/k/v into one packed projection when possible (called by
        ops.compress.compress_for_inference; bit-exact, decode-kernel-count
        optimization — same as OPT's, GQA widths included)."""
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
                 prefill_offset: Optional[int] = None, plain_causal: bool = True):
        B, T, D = x.shape
        _q, _k, _v = self._project_qkv(x)
        q = self._split(_q, self.num_heads)
        k = self._split(_k, self.num_kv_heads)
        v = self._split(_v, self.num_kv_heads)
        q, k = self.apply_rope(q, k, cos, sin)
        gqa = self.num_kv_heads != self.num_heads
        if prefill_offset is not None:
            # causal prefill: blockwise flash kernel, O(T·D) memory (roadmap
            # §2c; GQA head repeat inside the helper; offset>0 = chunked
            # prefill over cache prefix + fresh suffix)
            from ..ops.flash_attention import flash_chunked_prefill, flash_prefill

            out = (
                flash_prefill(self.sdpa, q, k, v, cache=cache)
                if prefill_offset == 0
                else flash_chunked_prefill(
                    self.sdpa, q, k, v, cache=cache, offset=prefill_offset
                )
            )
            if out is not None:
                out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
                return self.o_proj(out)
        from ..ops.flash_decode import cached_attend

        out = cached_attend(self.sdpa, q, k, v, cache, attn_mask,
                            enable_gqa=gqa, plain_causal=plain_causal)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
        return self.o_proj(out)


class LlamaMLP(nnx.Module):
    def __init__(self, cfg: LlamaConfig, *, rngs: nnx.Rngs):
        d, m = cfg.hidden_size, cfg.intermediate_size
        self.intermediate_size = m
        self.gate_proj = nnx.Linear(d, m, use_bias=False, rngs=rngs)
        self.up_proj = nnx.Linear(d, m, use_bias=False, rngs=rngs)
        self.down_proj = nnx.Linear(m, d, use_bias=False, rngs=rngs)
        self.act_fn = rawnn.SiLU()
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


class LlamaDecoderLayer(nnx.Module):
    def __init__(self, cfg: LlamaConfig, *, rngs: nnx.Rngs):
        d = cfg.hidden_size
        self.self_attn = LlamaAttention(cfg, rngs=rngs)
        self.mlp = LlamaMLP(cfg, rngs=rngs)
        self.input_layernorm = rawnn.RMSNorm(d, eps=cfg.rms_norm_eps)
        self.post_attention_layernorm = rawnn.RMSNorm(d, eps=cfg.rms_norm_eps)
        self.resadd1 = rawnn.ResAdd()
        self.resadd2 = rawnn.ResAdd()

    def __call__(self, x, cos, sin, attn_mask=None, cache=None,
                 prefill_offset: Optional[int] = None, plain_causal: bool = True):
        if (
            x.shape[1] == 1
            and cache is not None
            and attn_mask is not None
            and jnp.issubdtype(jnp.asarray(attn_mask).dtype, jnp.floating)
        ):
            # banded (sliding-window) masks fuse too: the fused SDPA applies
            # the mask additively (ops/basic_layer.fused_llama_family_step)
            from ..ops.basic_layer import basic_llama_layer_plan

            plan = basic_llama_layer_plan(self)
            if plan is not None:
                return self._fused_basic_step(
                    x, cos, sin, attn_mask, cache, plan,
                    plain_causal=plain_causal,
                )
        x = self.resadd1(
            self.self_attn(self.input_layernorm(x), cos, sin, attn_mask, cache,
                           prefill_offset=prefill_offset,
                           plain_causal=plain_causal), x
        )
        x = self.resadd2(self.mlp(self.post_attention_layernorm(x)), x)
        return x

    def _fused_basic_step(self, x, cos, sin, attn_mask, cache, plan,
                          plain_causal: bool = True):
        """BASIC decode step via the fused chains (ops/basic_layer.py):
        RMS1+qkv / RoPE surrogate / fused SDPA (split-cache, GQA) / o_proj /
        resadd1+RMS2+gate-up / SiLU*up / down_proj+resadd2 — numerics-
        identical to the modular module pipeline (bounded only by f32
        reduction order in the RMS moments)."""
        from ..ops.basic_layer import fused_llama_family_step

        return fused_llama_family_step(self, x, cos, sin, attn_mask, cache,
                                       plan, plain_causal=plain_causal)


class LlamaModel(nnx.Module):
    def __init__(self, cfg: LlamaConfig, *, rngs: nnx.Rngs):
        self.cfg = cfg
        self.embed_tokens = nnx.Embed(cfg.vocab_size, cfg.hidden_size, rngs=rngs)
        self.layers = nnx.data(
            [LlamaDecoderLayer(cfg, rngs=rngs) for _ in range(cfg.num_hidden_layers)]
        )
        self.norm = rawnn.RMSNorm(cfg.hidden_size, eps=cfg.rms_norm_eps)
        self.rotary_emb = rawnn.RotaryEmbedding(
            cfg.hidden_size // cfg.num_attention_heads, cfg.max_position_embeddings,
            base=cfg.rope_theta,
        )

    def __call__(self, input_ids, caches=None, position_offset=0,
                 apply_final_norm: bool = True):
        from .positions import causal_mask, resolve_positions

        B, T = input_ids.shape
        x = self.embed_tokens(input_ids)
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


class LlamaForCausalLM(nnx.Module):
    def __init__(self, cfg: LlamaConfig, *, rngs: nnx.Rngs):
        self.cfg = cfg
        self.model = LlamaModel(cfg, rngs=rngs)
        if cfg.tie_word_embeddings:
            self.lm_head = rawnn.TiedLinear(self.model.embed_tokens)
        else:
            self.lm_head = nnx.Linear(
                cfg.hidden_size, cfg.vocab_size, use_bias=False, rngs=rngs
            )

    @property
    def config(self):
        return self.cfg

    def __call__(self, input_ids, caches=None, position_offset=0):
        if input_ids.shape[1] == 1 and caches is not None:
            # decode tail: fuse the final RMSNorm into the LM-head kernel
            # when the BASIC shapes prove out (ops/basic_layer.py)
            from ..ops.basic_layer import basic_rms_head_plan, fused_rms_head

            plan = basic_rms_head_plan(
                self.model.norm, self.lm_head
            )
            if plan is not None:
                h = self.model(input_ids, caches=caches,
                               position_offset=position_offset,
                               apply_final_norm=False)
                return fused_rms_head(
                    h, self.model.norm, self.lm_head, plan
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
            cfg.hidden_size // cfg.num_attention_heads,
            dtype or cfg.dtype,
            quantized=quantized,
            per_row=per_row,
            split_base_len=split_base_len,
        )
