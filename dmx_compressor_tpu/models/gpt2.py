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
        if (
            x.shape[1] == 1
            and cache is not None
            and attn_mask is not None
            and jnp.issubdtype(jnp.asarray(attn_mask).dtype, jnp.floating)
        ):
            from ..ops.basic_layer import basic_gpt2_block_plan

            plan = basic_gpt2_block_plan(self)
            if plan is not None:
                return self._fused_basic_step(x, attn_mask, cache, plan)
        x = self.resadd1(
            self.attn(self.ln_1(x), attn_mask=attn_mask, cache=cache,
                      prefill_offset=prefill_offset), x)
        x = self.resadd2(self.mlp(self.ln_2(x)), x)
        return x

    def _fused_basic_step(self, x, attn_mask, cache, plan):
        """BASIC decode step via the fused chains (ops/basic_layer.py):
        LN1+c_attn / fused SDPA / c_proj / resadd1+LN2+c_fc / tanh-GELU /
        mlp.c_proj+resadd2 — numerics-identical to the modular module
        pipeline (bounded only by f32 reduction order in the LN moments).
        Same shape as OPT's fused step with the ReLU swapped for the exact
        tanh-GELU between FLOAT16 casts (the BASIC rule set leaves GELUBase
        at approximation NONE)."""
        from ..ops.basic_layer import fused_ln_linear, gelu_tanh_fp16
        from ..ops.basic_linear import fused_basic_linear
        from ..ops.flash_decode import cached_attend

        def w_kw(m):
            if m.weight_bf16 is not None:
                return {"w_bf16": m.weight_bf16.value}
            return {"packed": m.packed}

        B, T, D = x.shape
        attn = self.attn
        qkv = fused_ln_linear(
            x,
            **w_kw(attn.c_attn),
            bias=attn.c_attn.bias.value,
            ln_w=self.ln_1._weight,
            ln_b=self.ln_1._bias,
            eps=plan.ln1_eps,
            wl=plan.wl,
            in_block=plan.block,
        )

        def split(t):
            return t.reshape(B, T, attn.num_heads, attn.head_dim).transpose(
                0, 2, 1, 3
            )

        q, k, v = jnp.split(qkv, 3, axis=-1)
        ctx = cached_attend(attn.sdpa, split(q), split(k), split(v), cache,
                            attn_mask)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, D)
        y = attn.c_proj(ctx)  # PackedBFPLinear: one fused kernel
        h, r = fused_ln_linear(
            y,
            **w_kw(self.mlp.c_fc),
            bias=self.mlp.c_fc.bias.value,
            ln_w=self.ln_2._weight,
            ln_b=self.ln_2._bias,
            eps=plan.ln2_eps,
            wl=plan.wl,
            in_block=plan.block,
            residual=x,
            emit_pre=True,
            input_on_grid=True,  # y: out-projection's FLOAT16 output cast
        )
        h = gelu_tanh_fp16(h, on_grid=True)  # h: fc1's FLOAT16 out
        fc2 = self.mlp.c_proj
        return fused_basic_linear(
            h,
            w_bf16=fc2.weight_bf16.value if fc2.weight_bf16 is not None else None,
            packed=None if fc2.weight_bf16 is not None else fc2.packed,
            bias=fc2.bias.value,
            in_wl=plan.wl,
            in_block=plan.block,
            out_fp16=True,
            res_out=r,
            res_on_grid=True,  # r: resadd's FLOAT16 output cast
        )


class GPT2Model(nnx.Module):
    def __init__(self, cfg: GPT2Config, *, rngs: nnx.Rngs):
        self.cfg = cfg
        self.wte = nnx.Embed(cfg.vocab_size, cfg.n_embd, rngs=rngs)
        self.wpe = nnx.Embed(cfg.n_positions, cfg.n_embd, rngs=rngs)
        self.h = nnx.data([GPT2Block(cfg, rngs=rngs) for _ in range(cfg.n_layer)])
        self.ln_f = nnx.LayerNorm(cfg.n_embd, epsilon=cfg.layer_norm_epsilon, rngs=rngs)

    def __call__(self, input_ids, caches=None, position_offset=0,
                 apply_final_ln: bool = True):
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
        return self.ln_f(x) if apply_final_ln else x


class GPT2LMHeadModel(nnx.Module):
    def __init__(self, cfg: GPT2Config, *, rngs: nnx.Rngs):
        self.cfg = cfg
        self.transformer = GPT2Model(cfg, rngs=rngs)
        self.lm_head = rawnn.TiedLinear(self.transformer.wte)

    @property
    def config(self):
        return self.cfg

    def __call__(self, input_ids, caches=None, position_offset=0):
        if input_ids.shape[1] == 1 and caches is not None:
            from ..ops.basic_layer import basic_head_plan, fused_ln_linear

            final_ln = self.transformer.ln_f
            plan = basic_head_plan(final_ln, self.lm_head)
            if plan is not None:
                h = self.transformer(
                    input_ids, caches=caches,
                    position_offset=position_offset, apply_final_ln=False,
                )
                head = self.lm_head
                return fused_ln_linear(
                    h,
                    w_bf16=head.weight_bf16.value
                    if head.weight_bf16 is not None else None,
                    packed=None if head.weight_bf16 is not None else head.packed,
                    bias=head.bias.value if head.bias is not None
                    else jnp.zeros((head.out_features,), jnp.float32),
                    ln_w=final_ln._weight,
                    ln_b=final_ln._bias,
                    eps=plan.ln_eps,
                    wl=plan.wl,
                    in_block=plan.block,
                    # h: decoder's final residual, FLOAT16 resadd out
                    input_on_grid=True,
                )
        h = self.transformer(input_ids, caches=caches, position_offset=position_offset)
        return self.lm_head(h)

    def init_cache(self, batch: int, max_len: int, dtype=None,
                   quantized: bool = False, per_row: bool = False,
                   split_base_len: Optional[int] = None):
        cfg = self.cfg
        return make_caches(cfg.n_layer, batch, cfg.n_head, max_len,
                           cfg.n_embd // cfg.n_head, dtype or cfg.dtype,
                           quantized=quantized, per_row=per_row,
                           split_base_len=split_base_len)

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
