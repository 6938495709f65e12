"""Mistral-family decoder: Llama architecture + sliding-window attention.

Covers the reference's Mistral substitution surface (reference
fx/transformer/utils.py:30-51 maps MistralRMSNorm / MistralRotaryEmbedding
into the dmx module zoo) as an authored zoo model: identical module classes
to models/llama.py — GQA projections, rawnn RoPE wrappers, RMSNorm, SiLU
gate MLP — plus the Mistral-specific banded causal mask (tokens attend to
at most ``sliding_window`` previous positions, config.json
"sliding_window"; null disables the band).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp
from flax import nnx

from .. import rawnn
from ..ops.kv_cache import cache_seq_len, make_caches
from .llama import LlamaDecoderLayer

MistralDecoderLayer = LlamaDecoderLayer  # identical block structure


@dataclasses.dataclass
class MistralConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    max_position_embeddings: int = 32768
    sliding_window: Optional[int] = 4096
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
            num_key_value_heads=j.get("num_key_value_heads", 8),
            max_position_embeddings=j.get("max_position_embeddings", 32768),
            sliding_window=j.get("sliding_window", 4096),
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
            sliding_window=16,
        )


class MistralModel(nnx.Module):
    def __init__(self, cfg: MistralConfig, *, rngs: nnx.Rngs):
        self.cfg = cfg
        self.embed_tokens = nnx.Embed(cfg.vocab_size, cfg.hidden_size, rngs=rngs)
        self.layers = nnx.data(
            [MistralDecoderLayer(cfg, rngs=rngs) for _ in range(cfg.num_hidden_layers)]
        )
        self.norm = rawnn.RMSNorm(cfg.hidden_size, eps=cfg.rms_norm_eps)
        self.rotary_emb = rawnn.RotaryEmbedding(
            cfg.hidden_size // cfg.num_attention_heads, cfg.max_position_embeddings,
            base=cfg.rope_theta,
        )

    def _mask(self, T, S, position_offset, dtype):
        from .positions import causal_mask

        return causal_mask(T, S, position_offset, dtype,
                           sliding_window=self.cfg.sliding_window)

    def __call__(self, input_ids, caches=None, position_offset=0,
                 apply_final_norm: bool = True):
        B, T = input_ids.shape
        from .positions import resolve_positions

        x = self.embed_tokens(input_ids)
        pos, _ = resolve_positions(T, position_offset)
        cos, sin = self.rotary_emb(x, pos)
        S = cache_seq_len(caches[0]) if caches is not None else T
        mask = self._mask(T, S, position_offset if caches is not None else 0, x.dtype)
        prefill_offset = (
            position_offset
            if (
                self.cfg.sliding_window is None  # banded mask excludes flash
                and T > 1
                and isinstance(position_offset, int)
                and (position_offset == 0 or caches is not None)
            )
            else None
        )
        for i, layer in enumerate(self.layers):
            x = layer(x, cos, sin, attn_mask=mask,
                      cache=None if caches is None else caches[i],
                      prefill_offset=prefill_offset,
                      plain_causal=self.cfg.sliding_window is None)
        return self.norm(x) if apply_final_norm else x


class MistralForCausalLM(nnx.Module):
    def __init__(self, cfg: MistralConfig, *, rngs: nnx.Rngs):
        self.cfg = cfg
        self.model = MistralModel(cfg, rngs=rngs)
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
