"""GPT-2 decoder (gpt2 .. gpt2-xl / distilgpt2 shapes).

HF GPT-2 stores matmul weights as Conv1D [in, out]; this zoo keeps standard
[out, in] Linears and transposes at import (the reference does the same
conversion in Linear.from_raw, torch_modules.py:362-375).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from .. import rawnn
from ..ops.kv_cache import cache_seq_len, KVCache, make_caches


@dataclasses.dataclass
class GPT2Config:
    vocab_size: int = 50257
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    n_positions: int = 1024
    layer_norm_epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @property
    def max_position_embeddings(self):
        return self.n_positions

    @classmethod
    def from_hf(cls, j):
        return cls(
            vocab_size=j["vocab_size"],
            n_embd=j["n_embd"],
            n_layer=j["n_layer"],
            n_head=j["n_head"],
            n_positions=j["n_positions"],
            layer_norm_epsilon=j.get("layer_norm_epsilon", 1e-5),
        )

    @classmethod
    def tiny(cls):
        return cls(vocab_size=512, n_embd=64, n_layer=2, n_head=4, n_positions=64)


class GPT2Attention(nnx.Module):
    def __init__(self, cfg: GPT2Config, *, rngs: nnx.Rngs):
        d = cfg.n_embd
        self.num_heads = cfg.n_head
        self.head_dim = d // cfg.n_head
        self.c_attn = nnx.Linear(d, 3 * d, rngs=rngs)
        self.c_proj = nnx.Linear(d, d, rngs=rngs)
        self.sdpa = rawnn.ScaledDotProductAttention()

    def __call__(self, x, attn_mask=None, cache: Optional[KVCache] = None,
                 prefill_offset: Optional[int] = None):
        B, T, D = x.shape
        qkv = self.c_attn(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            return t.reshape(B, T, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
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
                return self.c_proj(out.transpose(0, 2, 1, 3).reshape(B, T, D))
        from ..ops.flash_decode import cached_attend

        out = cached_attend(self.sdpa, q, k, v, cache, attn_mask)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
        return self.c_proj(out)


class GPT2MLP(nnx.Module):
    def __init__(self, cfg: GPT2Config, *, rngs: nnx.Rngs):
        self.c_fc = nnx.Linear(cfg.n_embd, 4 * cfg.n_embd, rngs=rngs)
        self.act = rawnn.NewGELU()
        self.c_proj = nnx.Linear(4 * cfg.n_embd, cfg.n_embd, rngs=rngs)

    def __call__(self, x):
        return self.c_proj(self.act(self.c_fc(x)))


class GPT2Block(nnx.Module):
    def __init__(self, cfg: GPT2Config, *, rngs: nnx.Rngs):
        self.ln_1 = nnx.LayerNorm(cfg.n_embd, epsilon=cfg.layer_norm_epsilon, rngs=rngs)
        self.attn = GPT2Attention(cfg, rngs=rngs)
        self.ln_2 = nnx.LayerNorm(cfg.n_embd, epsilon=cfg.layer_norm_epsilon, rngs=rngs)
        self.mlp = GPT2MLP(cfg, rngs=rngs)
        self.resadd1 = rawnn.ResAdd()
        self.resadd2 = rawnn.ResAdd()

    def __call__(self, x, attn_mask=None, cache=None,
                 prefill_offset: Optional[int] = None):
        x = self.resadd1(
            self.attn(self.ln_1(x), attn_mask=attn_mask, cache=cache,
                      prefill_offset=prefill_offset), x)
        x = self.resadd2(self.mlp(self.ln_2(x)), x)
        return x


class GPT2Model(nnx.Module):
    def __init__(self, cfg: GPT2Config, *, rngs: nnx.Rngs):
        self.cfg = cfg
        self.wte = nnx.Embed(cfg.vocab_size, cfg.n_embd, rngs=rngs)
        self.wpe = nnx.Embed(cfg.n_positions, cfg.n_embd, rngs=rngs)
        self.h = nnx.data([GPT2Block(cfg, rngs=rngs) for _ in range(cfg.n_layer)])
        self.ln_f = nnx.LayerNorm(cfg.n_embd, epsilon=cfg.layer_norm_epsilon, rngs=rngs)

    def __call__(self, input_ids, caches=None, position_offset=0):
        from .positions import causal_mask, resolve_positions

        B, T = input_ids.shape
        pos, _ = resolve_positions(T, position_offset)  # [1|B, T]
        x = self.wte(input_ids) + self.wpe(pos)
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
        for i, block in enumerate(self.h):
            x = block(x, attn_mask=mask, cache=None if caches is None else caches[i],
                      prefill_offset=prefill_offset)
        return self.ln_f(x)


class GPT2LMHeadModel(nnx.Module):
    def __init__(self, cfg: GPT2Config, *, rngs: nnx.Rngs):
        self.cfg = cfg
        self.transformer = GPT2Model(cfg, rngs=rngs)
        self.lm_head = rawnn.TiedLinear(self.transformer.wte)

    @property
    def config(self):
        return self.cfg

    def __call__(self, input_ids, caches=None, position_offset=0):
        h = self.transformer(input_ids, caches=caches, position_offset=position_offset)
        return self.lm_head(h)

    def init_cache(self, batch: int, max_len: int, dtype=None,
                   quantized: bool = False, per_row: bool = False):
        cfg = self.cfg
        return make_caches(cfg.n_layer, batch, cfg.n_head, max_len,
                           cfg.n_embd // cfg.n_head, dtype or cfg.dtype,
                           quantized=quantized, per_row=per_row)

    @staticmethod
    def hf_tensor_converter(tensors):
        """HF GPT-2 Conv1D [in,out] -> Linear [out,in]; drop attention bias
        buffers."""
        out = {}
        for k, v in tensors.items():
            if k.endswith(".attn.bias") or k.endswith(".attn.masked_bias"):
                continue
            if any(
                k.endswith(f"{m}.weight")
                for m in ("c_attn", "c_proj", "c_fc")
            ):
                v = np.asarray(v).T
            out[k] = v
        return out
