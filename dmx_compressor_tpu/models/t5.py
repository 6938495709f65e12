"""T5 encoder-decoder (t5-small .. t5-11b shapes, plus v1.1 gated-GELU).

Covers the reference's T5 substitution surface (reference
fx/transformer/utils.py:30-51 maps T5LayerNorm — an RMSNorm — into the dmx
module zoo) as an authored zoo model.  T5 specifics faithfully reproduced
from HF modeling_t5:

- pre-norm blocks with T5LayerNorm == RMSNorm (rawnn.RMSNorm);
- *unscaled* attention (no 1/sqrt(d_kv) factor — folded into init);
- an explicit ``d_kv`` decoupled from ``d_model / num_heads``;
- bucketed relative position bias, computed by the first self-attention
  layer of each stack and shared down the stack (bidirectional buckets in
  the encoder, causal in the decoder);
- ``DenseReluDense`` feed-forward, or the v1.1 ``DenseGatedActDense``;
- shared embedding table across encoder/decoder/lm_head; tied heads
  rescale hidden states by ``d_model**-0.5`` before projection.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from .. import rawnn
from ..ops.kv_cache import cache_seq_len, KVCache, make_caches


@dataclasses.dataclass
class T5Config:
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 6
    num_decoder_layers: int = 6
    num_heads: int = 8
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    is_gated_act: bool = False
    tie_word_embeddings: bool = True
    dtype: Any = jnp.float32

    @classmethod
    def from_hf(cls, j):
        return cls(
            vocab_size=j["vocab_size"],
            d_model=j["d_model"],
            d_kv=j["d_kv"],
            d_ff=j["d_ff"],
            num_layers=j["num_layers"],
            num_decoder_layers=j.get("num_decoder_layers", j["num_layers"]),
            num_heads=j["num_heads"],
            relative_attention_num_buckets=j.get(
                "relative_attention_num_buckets", 32
            ),
            relative_attention_max_distance=j.get(
                "relative_attention_max_distance", 128
            ),
            layer_norm_epsilon=j.get("layer_norm_epsilon", 1e-6),
            is_gated_act=str(j.get("feed_forward_proj", "relu")).startswith(
                "gated"
            ),
            tie_word_embeddings=j.get("tie_word_embeddings", True),
        )

    @classmethod
    def tiny(cls):
        return cls(
            vocab_size=512,
            d_model=64,
            d_kv=16,  # decoupled from d_model/num_heads (= 16 anyway) on 4 heads
            d_ff=128,
            num_layers=2,
            num_decoder_layers=2,
            num_heads=4,
        )


def relative_position_bucket(
    relative_position, bidirectional: bool, num_buckets: int, max_distance: int
):
    """HF T5Attention._relative_position_bucket, vectorized in jnp.
    ``relative_position`` = key_pos - query_pos (int32 array)."""
    relative_buckets = jnp.zeros_like(relative_position)
    if bidirectional:
        num_buckets //= 2
        relative_buckets += (relative_position > 0).astype(jnp.int32) * num_buckets
        relative_position = jnp.abs(relative_position)
    else:
        relative_position = -jnp.minimum(
            relative_position, jnp.zeros_like(relative_position)
        )
    max_exact = num_buckets // 2
    is_small = relative_position < max_exact
    scaled = max_exact + (
        jnp.log(relative_position.astype(jnp.float32) / max_exact + 1e-20)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    scaled = jnp.minimum(scaled, num_buckets - 1)
    return relative_buckets + jnp.where(is_small, relative_position, scaled)


class T5Attention(nnx.Module):
    def __init__(
        self,
        cfg: T5Config,
        has_relative_attention_bias: bool = False,
        bidirectional: bool = True,
        *,
        rngs: nnx.Rngs,
    ):
        d = cfg.d_model
        self.num_heads = cfg.num_heads
        self.head_dim = cfg.d_kv
        self.bidirectional = bidirectional
        self.num_buckets = cfg.relative_attention_num_buckets
        self.max_distance = cfg.relative_attention_max_distance
        inner = cfg.num_heads * cfg.d_kv
        self.q = nnx.Linear(d, inner, use_bias=False, rngs=rngs)
        self.k = nnx.Linear(d, inner, use_bias=False, rngs=rngs)
        self.v = nnx.Linear(d, inner, use_bias=False, rngs=rngs)
        self.o = nnx.Linear(inner, d, use_bias=False, rngs=rngs)
        if has_relative_attention_bias:
            self.relative_attention_bias = nnx.Embed(
                self.num_buckets, cfg.num_heads, rngs=rngs
            )
        else:
            self.relative_attention_bias = None
        self.sdpa = rawnn.ScaledDotProductAttention()

    def compute_bias(self, query_length: int, key_length: int, query_offset=0):
        """Additive position bias: [1, heads, Tq, Tk], or [B, heads, Tq, Tk]
        for per-row ``query_offset`` arrays (continuous batching)."""
        from .positions import is_per_row

        if is_per_row(query_offset):
            off = jnp.asarray(query_offset, jnp.int32)  # [B]
            q_pos = (jnp.arange(query_length)[None, :] + off[:, None])[..., None]
            k_pos = jnp.arange(key_length)[None, None, :]
            buckets = relative_position_bucket(
                k_pos - q_pos,
                bidirectional=self.bidirectional,
                num_buckets=self.num_buckets,
                max_distance=self.max_distance,
            )  # [B, Tq, Tk]
            values = self.relative_attention_bias(buckets)  # [B, Tq, Tk, H]
            return values.transpose(0, 3, 1, 2)
        q_pos = (jnp.arange(query_length) + query_offset)[:, None]
        k_pos = jnp.arange(key_length)[None, :]
        buckets = relative_position_bucket(
            k_pos - q_pos,
            bidirectional=self.bidirectional,
            num_buckets=self.num_buckets,
            max_distance=self.max_distance,
        )
        values = self.relative_attention_bias(buckets)  # [Tq, Tk, H]
        return values.transpose(2, 0, 1)[None]

    def _split(self, x):
        B, T, _ = x.shape
        return x.reshape(B, T, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)

    def __call__(self, x, kv=None, position_bias=None, cache: Optional[KVCache] = None):
        B, T, _ = x.shape
        kv_in = x if kv is None else kv
        q = self._split(self.q(x))
        k = self._split(self.k(kv_in))
        v = self._split(self.v(kv_in))
        if cache is not None:
            k, v, _ = cache.update(k, v)
        # T5 attention is UNSCALED (scale folded into initialization)
        out = self.sdpa(q, k, v, attn_mask=position_bias, scale=1.0)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, self.num_heads * self.head_dim)
        return self.o(out)


class T5DenseReluDense(nnx.Module):
    def __init__(self, cfg: T5Config, *, rngs: nnx.Rngs):
        self.wi = nnx.Linear(cfg.d_model, cfg.d_ff, use_bias=False, rngs=rngs)
        self.wo = nnx.Linear(cfg.d_ff, cfg.d_model, use_bias=False, rngs=rngs)
        self.act = rawnn.ReLU()

    def __call__(self, x):
        return self.wo(self.act(self.wi(x)))


class T5DenseGatedActDense(nnx.Module):
    """v1.1 gated-GELU feed-forward."""

    def __init__(self, cfg: T5Config, *, rngs: nnx.Rngs):
        self.wi_0 = nnx.Linear(cfg.d_model, cfg.d_ff, use_bias=False, rngs=rngs)
        self.wi_1 = nnx.Linear(cfg.d_model, cfg.d_ff, use_bias=False, rngs=rngs)
        self.wo = nnx.Linear(cfg.d_ff, cfg.d_model, use_bias=False, rngs=rngs)
        self.act = rawnn.NewGELU()
        self.mul = rawnn.Mul()

    def __call__(self, x):
        return self.wo(self.mul(self.act(self.wi_0(x)), self.wi_1(x)))


class T5Block(nnx.Module):
    def __init__(
        self,
        cfg: T5Config,
        is_decoder: bool,
        has_relative_attention_bias: bool,
        *,
        rngs: nnx.Rngs,
    ):
        self.is_decoder = is_decoder
        self.self_attn = T5Attention(
            cfg,
            has_relative_attention_bias=has_relative_attention_bias,
            bidirectional=not is_decoder,
            rngs=rngs,
        )
        self.self_attn_layer_norm = rawnn.RMSNorm(
            cfg.d_model, eps=cfg.layer_norm_epsilon
        )
        if is_decoder:
            self.cross_attn = T5Attention(cfg, bidirectional=True, rngs=rngs)
            self.cross_attn_layer_norm = rawnn.RMSNorm(
                cfg.d_model, eps=cfg.layer_norm_epsilon
            )
            self.resadd3 = rawnn.ResAdd()
        self.ff = (
            T5DenseGatedActDense(cfg, rngs=rngs)
            if cfg.is_gated_act
            else T5DenseReluDense(cfg, rngs=rngs)
        )
        self.ff_layer_norm = rawnn.RMSNorm(cfg.d_model, eps=cfg.layer_norm_epsilon)
        self.resadd1 = rawnn.ResAdd()
        self.resadd2 = rawnn.ResAdd()

    def __call__(self, x, enc=None, position_bias=None, cache=None,
                 enc_mask=None):
        x = self.resadd1(
            self.self_attn(
                self.self_attn_layer_norm(x),
                position_bias=position_bias,
                cache=cache,
            ),
            x,
        )
        if self.is_decoder:
            x = self.resadd3(
                self.cross_attn(self.cross_attn_layer_norm(x), kv=enc,
                                position_bias=enc_mask), x
            )
        return self.resadd2(self.ff(self.ff_layer_norm(x)), x)


class T5Stack(nnx.Module):
    def __init__(self, cfg: T5Config, embed_tokens, is_decoder: bool, *, rngs: nnx.Rngs):
        self.cfg = cfg
        self.is_decoder = is_decoder
        self.embed_tokens = embed_tokens  # shared table
        n = cfg.num_decoder_layers if is_decoder else cfg.num_layers
        self.block = nnx.data(
            [
                T5Block(
                    cfg,
                    is_decoder,
                    has_relative_attention_bias=(i == 0),
                    rngs=rngs,
                )
                for i in range(n)
            ]
        )
        self.final_layer_norm = rawnn.RMSNorm(cfg.d_model, eps=cfg.layer_norm_epsilon)

    def __call__(self, input_ids, enc=None, caches=None, position_offset=0,
                 attn_mask=None, enc_mask=None):
        """``attn_mask``: additive mask over THIS stack's keys (encoder
        padding); ``enc_mask``: additive mask over the encoder keys for
        the decoder's cross-attention (both broadcastable to
        [B, H, T, S])."""
        from .positions import causal_mask

        B, T = input_ids.shape
        x = self.embed_tokens(input_ids)
        S = cache_seq_len(caches[0]) if caches is not None else T
        off = position_offset if caches is not None else 0
        bias = self.block[0].self_attn.compute_bias(
            T, S, query_offset=off
        ).astype(x.dtype)
        if self.is_decoder:
            cm = causal_mask(T, S, off, x.dtype)  # [T,S] or [B,1,T,S]
            bias = bias + cm
        if attn_mask is not None:
            bias = bias + attn_mask.astype(x.dtype)
        for i, blk in enumerate(self.block):
            x = blk(
                x,
                enc=enc,
                position_bias=bias,
                cache=None if caches is None else caches[i],
                enc_mask=enc_mask,
            )
        return self.final_layer_norm(x)


class T5ForConditionalGeneration(nnx.Module):
    def __init__(self, cfg: T5Config, *, rngs: nnx.Rngs):
        self.cfg = cfg
        self.shared = nnx.Embed(cfg.vocab_size, cfg.d_model, rngs=rngs)
        self.encoder = T5Stack(cfg, self.shared, is_decoder=False, rngs=rngs)
        self.decoder = T5Stack(cfg, self.shared, is_decoder=True, rngs=rngs)
        if cfg.tie_word_embeddings:
            self.lm_head = rawnn.TiedLinear(self.shared)
        else:
            self.lm_head = nnx.Linear(
                cfg.d_model, cfg.vocab_size, use_bias=False, rngs=rngs
            )

    @property
    def config(self):
        return self.cfg

    def encode(self, input_ids, attn_mask=None):
        return self.encoder(input_ids, attn_mask=attn_mask)

    def decode(self, decoder_input_ids, enc, caches=None, position_offset=0,
               enc_mask=None):
        h = self.decoder(
            decoder_input_ids, enc=enc, caches=caches,
            position_offset=position_offset, enc_mask=enc_mask,
        )
        if self.cfg.tie_word_embeddings:
            h = h * jnp.asarray(self.cfg.d_model**-0.5, h.dtype)
        return self.lm_head(h)

    def __call__(self, input_ids, decoder_input_ids, caches=None, position_offset=0):
        enc = self.encode(input_ids)
        return self.decode(decoder_input_ids, enc, caches, position_offset)

    def init_cache(self, batch: int, max_len: int, dtype=None,
                   quantized: bool = False, per_row: bool = False):
        cfg = self.cfg
        return make_caches(
            cfg.num_decoder_layers,
            batch,
            cfg.num_heads,
            max_len,
            cfg.d_kv,
            dtype or cfg.dtype,
            quantized=quantized,
            per_row=per_row,
        )

    def generate(
        self,
        input_ids,
        decoder_start_ids,
        max_new_tokens: int = 32,
        eos_token_id: Optional[int] = None,
    ):
        """Greedy seq2seq generation: encode once, device-side lax.scan
        decode loop over the KV cache (same machinery as Whisper.generate)."""
        from flax import nnx as _nnx

        ids = jnp.asarray(decoder_start_ids, jnp.int32)
        B, T0 = ids.shape
        caches = self.init_cache(B, T0 + max_new_tokens)
        graphdef, state = _nnx.split((self, caches))

        @jax.jit
        def run(state, input_ids, ids):
            mod, cs = _nnx.merge(graphdef, state)
            enc = mod.encode(input_ids)
            logits = mod.decode(ids, enc, caches=cs, position_offset=0)
            _, state = _nnx.split((mod, cs))
            tok = jnp.argmax(logits[:, -1], axis=-1)
            done = jnp.zeros((B,), bool)
            if eos_token_id is not None:
                done = tok == eos_token_id

            def body(carry, i):
                state, tok, done = carry
                mod, cs = _nnx.merge(graphdef, state)
                lg = mod.decode(tok[:, None], enc, caches=cs, position_offset=T0 + i)
                _, s2 = _nnx.split((mod, cs))
                nxt = jnp.argmax(lg[:, -1], axis=-1)
                if eos_token_id is not None:
                    nxt = jnp.where(done, eos_token_id, nxt)
                    done = done | (nxt == eos_token_id)
                return (s2, nxt, done), tok

            (state, tok, done), toks = jax.lax.scan(
                body, (state, tok, done), jnp.arange(max_new_tokens - 1)
            )
            return jnp.concatenate([toks.T, tok[:, None]], axis=1)

        gen = run(state, jnp.asarray(input_ids, jnp.int32), ids)
        return jnp.concatenate([ids, gen], axis=1)

    @staticmethod
    def hf_tensor_converter(tensors):
        """HF T5 names (block.{i}.layer.{j}.SelfAttention...) -> zoo paths."""
        renames = [
            (".layer.0.SelfAttention.", ".self_attn."),
            (".layer.0.layer_norm.", ".self_attn_layer_norm."),
            (".layer.1.EncDecAttention.", ".cross_attn."),
            # encoder FF lives in layer.1, decoder FF in layer.2
            (".layer.1.DenseReluDense.", ".ff."),
            (".layer.2.DenseReluDense.", ".ff."),
            (".layer.1.DenseGatedActDense.", ".ff."),
            (".layer.2.DenseGatedActDense.", ".ff."),
        ]
        out = {}
        for k, v in tensors.items():
            if ".layer.1.layer_norm." in k:
                new = (
                    ".cross_attn_layer_norm."
                    if k.startswith("decoder.")
                    else ".ff_layer_norm."
                )
                k = k.replace(".layer.1.layer_norm.", new)
            k = k.replace(".layer.2.layer_norm.", ".ff_layer_norm.")
            for old, new in renames:
                k = k.replace(old, new)
            out[k] = v
        return out
