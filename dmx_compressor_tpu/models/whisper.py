"""Whisper encoder-decoder (whisper-tiny .. whisper-small shapes).

The encoder front-end convs use the Conv1dUnfold lowering per the reference's
Whisper recipe (reference experimental.py Conv1dUnfold; BASELINE.md config
"Whisper-small, approximated conv1d + norm calibration (SLaNC)").  Module
paths mirror HF WhisperForConditionalGeneration.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from .. import rawnn
from ..nn.experimental import Conv1dUnfold
from ..ops.kv_cache import cache_seq_len, KVCache, make_caches


@dataclasses.dataclass
class WhisperConfig:
    vocab_size: int = 51865
    num_mel_bins: int = 80
    d_model: int = 768
    encoder_layers: int = 12
    decoder_layers: int = 12
    encoder_attention_heads: int = 12
    decoder_attention_heads: int = 12
    encoder_ffn_dim: int = 3072
    decoder_ffn_dim: int = 3072
    max_source_positions: int = 1500
    max_target_positions: int = 448
    dtype: Any = jnp.float32

    @classmethod
    def small(cls):
        return cls()

    @classmethod
    def tiny(cls):
        return cls(
            vocab_size=512,
            num_mel_bins=16,
            d_model=64,
            encoder_layers=2,
            decoder_layers=2,
            encoder_attention_heads=4,
            decoder_attention_heads=4,
            encoder_ffn_dim=128,
            decoder_ffn_dim=128,
            max_source_positions=50,
            max_target_positions=32,
        )

    @classmethod
    def from_hf(cls, j):
        return cls(
            vocab_size=j["vocab_size"],
            num_mel_bins=j["num_mel_bins"],
            d_model=j["d_model"],
            encoder_layers=j["encoder_layers"],
            decoder_layers=j["decoder_layers"],
            encoder_attention_heads=j["encoder_attention_heads"],
            decoder_attention_heads=j["decoder_attention_heads"],
            encoder_ffn_dim=j["encoder_ffn_dim"],
            decoder_ffn_dim=j["decoder_ffn_dim"],
            max_source_positions=j["max_source_positions"],
            max_target_positions=j["max_target_positions"],
        )


def sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed sinusoidal encoder positions."""
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


class WhisperAttention(nnx.Module):
    def __init__(self, d: int, heads: int, *, rngs: nnx.Rngs):
        self.num_heads = heads
        self.head_dim = d // heads
        self.scaling = self.head_dim**-0.5
        self.q_proj = nnx.Linear(d, d, rngs=rngs)
        self.k_proj = nnx.Linear(d, d, use_bias=False, rngs=rngs)
        self.v_proj = nnx.Linear(d, d, rngs=rngs)
        self.out_proj = nnx.Linear(d, d, rngs=rngs)
        self.sdpa = rawnn.ScaledDotProductAttention()

    def _split(self, x):
        B, T, _ = x.shape
        return x.reshape(B, T, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)

    def __call__(self, x, kv=None, attn_mask=None, cache: Optional[KVCache] = None,
                 prefill_offset: Optional[int] = None):
        B, T, D = x.shape
        kv = x if kv is None else kv
        q = self._split(self.q_proj(x))
        k = self._split(self.k_proj(kv))
        v = self._split(self.v_proj(kv))
        if prefill_offset is not None:
            from ..ops.flash_attention import flash_chunked_prefill, flash_prefill

            out = (
                flash_prefill(self.sdpa, q, k, v, scale=self.scaling,
                              cache=cache)
                if prefill_offset == 0
                else flash_chunked_prefill(
                    self.sdpa, q, k, v, cache=cache, offset=prefill_offset,
                    scale=self.scaling,
                )
            )
            if out is not None:
                return self.out_proj(out.transpose(0, 2, 1, 3).reshape(B, T, D))
        from ..ops.flash_decode import cached_attend

        out = cached_attend(self.sdpa, q, k, v, cache, attn_mask,
                            scale=self.scaling)
        return self.out_proj(out.transpose(0, 2, 1, 3).reshape(B, T, D))


class WhisperEncoderLayer(nnx.Module):
    def __init__(self, cfg: WhisperConfig, *, rngs: nnx.Rngs):
        d = cfg.d_model
        self.self_attn = WhisperAttention(d, cfg.encoder_attention_heads, rngs=rngs)
        self.self_attn_layer_norm = nnx.LayerNorm(d, epsilon=1e-5, rngs=rngs)
        self.fc1 = nnx.Linear(d, cfg.encoder_ffn_dim, rngs=rngs)
        self.activation_fn = rawnn.GELU()
        self.fc2 = nnx.Linear(cfg.encoder_ffn_dim, d, rngs=rngs)
        self.final_layer_norm = nnx.LayerNorm(d, epsilon=1e-5, rngs=rngs)
        self.resadd1 = rawnn.ResAdd()
        self.resadd2 = rawnn.ResAdd()

    def __call__(self, x):
        x = self.resadd1(self.self_attn(self.self_attn_layer_norm(x)), x)
        x = self.resadd2(
            self.fc2(self.activation_fn(self.fc1(self.final_layer_norm(x)))), x
        )
        return x


class WhisperDecoderLayer(nnx.Module):
    def __init__(self, cfg: WhisperConfig, *, rngs: nnx.Rngs):
        d = cfg.d_model
        self.self_attn = WhisperAttention(d, cfg.decoder_attention_heads, rngs=rngs)
        self.self_attn_layer_norm = nnx.LayerNorm(d, epsilon=1e-5, rngs=rngs)
        self.encoder_attn = WhisperAttention(d, cfg.decoder_attention_heads, rngs=rngs)
        self.encoder_attn_layer_norm = nnx.LayerNorm(d, epsilon=1e-5, rngs=rngs)
        self.fc1 = nnx.Linear(d, cfg.decoder_ffn_dim, rngs=rngs)
        self.activation_fn = rawnn.GELU()
        self.fc2 = nnx.Linear(cfg.decoder_ffn_dim, d, rngs=rngs)
        self.final_layer_norm = nnx.LayerNorm(d, epsilon=1e-5, rngs=rngs)
        self.resadd1 = rawnn.ResAdd()
        self.resadd2 = rawnn.ResAdd()
        self.resadd3 = rawnn.ResAdd()

    def __call__(self, x, enc, attn_mask=None, cache=None,
                 prefill_offset: Optional[int] = None):
        x = self.resadd1(
            self.self_attn(self.self_attn_layer_norm(x), attn_mask=attn_mask,
                           cache=cache, prefill_offset=prefill_offset),
            x,
        )
        x = self.resadd2(self.encoder_attn(self.encoder_attn_layer_norm(x), kv=enc), x)
        x = self.resadd3(
            self.fc2(self.activation_fn(self.fc1(self.final_layer_norm(x)))), x
        )
        return x


class WhisperEncoder(nnx.Module):
    def __init__(self, cfg: WhisperConfig, *, rngs: nnx.Rngs):
        self.cfg = cfg
        # unfold-lowered convs (the Whisper recipe's hardware-friendly path)
        self.conv1 = Conv1dUnfold(cfg.num_mel_bins, cfg.d_model, 3, padding=1, rngs=rngs)
        self.conv2 = Conv1dUnfold(cfg.d_model, cfg.d_model, 3, stride=2, padding=1, rngs=rngs)
        self.gelu1 = rawnn.GELU()
        self.gelu2 = rawnn.GELU()
        self.embed_positions = nnx.Variable(
            jnp.asarray(sinusoids(cfg.max_source_positions, cfg.d_model))
        )
        self.layers = nnx.data(
            [WhisperEncoderLayer(cfg, rngs=rngs) for _ in range(cfg.encoder_layers)]
        )
        self.layer_norm = nnx.LayerNorm(cfg.d_model, epsilon=1e-5, rngs=rngs)

    def __call__(self, input_features):
        # input_features: [B, mels, frames]
        x = self.gelu1(self.conv1(input_features))
        x = self.gelu2(self.conv2(x))
        x = x.transpose(0, 2, 1)  # [B, T, D]
        x = x + self.embed_positions.value[None, : x.shape[1]]
        for layer in self.layers:
            x = layer(x)
        return self.layer_norm(x)


class WhisperDecoder(nnx.Module):
    def __init__(self, cfg: WhisperConfig, *, rngs: nnx.Rngs):
        self.cfg = cfg
        self.embed_tokens = nnx.Embed(cfg.vocab_size, cfg.d_model, rngs=rngs)
        self.embed_positions = nnx.Embed(cfg.max_target_positions, cfg.d_model, rngs=rngs)
        self.layers = nnx.data(
            [WhisperDecoderLayer(cfg, rngs=rngs) for _ in range(cfg.decoder_layers)]
        )
        self.layer_norm = nnx.LayerNorm(cfg.d_model, epsilon=1e-5, rngs=rngs)

    def __call__(self, input_ids, enc, caches=None, position_offset=0):
        from .positions import causal_mask, resolve_positions

        B, T = input_ids.shape
        pos, _ = resolve_positions(T, position_offset)  # [1|B, T]
        x = self.embed_tokens(input_ids) + self.embed_positions(pos)
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
            x = layer(x, enc, attn_mask=mask,
                      cache=None if caches is None else caches[i],
                      prefill_offset=prefill_offset)
        return self.layer_norm(x)


class WhisperModel(nnx.Module):
    def __init__(self, cfg: WhisperConfig, *, rngs: nnx.Rngs):
        self.encoder = WhisperEncoder(cfg, rngs=rngs)
        self.decoder = WhisperDecoder(cfg, rngs=rngs)


class WhisperForConditionalGeneration(nnx.Module):
    def __init__(self, cfg: WhisperConfig, *, rngs: nnx.Rngs):
        self.cfg = cfg
        self.model = WhisperModel(cfg, rngs=rngs)
        self.proj_out = rawnn.TiedLinear(self.model.decoder.embed_tokens)

    @property
    def config(self):
        return self.cfg

    def encode(self, input_features):
        return self.model.encoder(input_features)

    def __call__(self, input_features, decoder_input_ids, caches=None,
                 position_offset=0):
        enc = self.model.encoder(input_features)
        return self.decode(decoder_input_ids, enc, caches, position_offset)

    def decode(self, decoder_input_ids, enc, caches=None, position_offset=0):
        h = self.model.decoder(decoder_input_ids, enc, caches, position_offset)
        return self.proj_out(h)

    def init_cache(self, batch: int, max_len: int, dtype=None,
                   quantized: bool = False, per_row: bool = False):
        cfg = self.cfg
        return make_caches(cfg.decoder_layers, batch, cfg.decoder_attention_heads,
                           max_len, cfg.d_model // cfg.decoder_attention_heads,
                           dtype or cfg.dtype, quantized=quantized,
                           per_row=per_row)

    def generate(
        self,
        input_features,
        decoder_start_ids,
        max_new_tokens: int = 32,
        eos_token_id: Optional[int] = None,
        quantized_cache: bool = False,
    ):
        """Greedy transcription: encode once, then a device-side lax.scan
        decode loop over the KV cache (the OPT scan machinery applied to the
        encoder-decoder case; one host dispatch total — essential on
        tunneled TPUs).  Returns [B, T0 + max_new_tokens] token ids; after
        ``eos_token_id`` is emitted the row keeps repeating eos."""
        from flax import nnx as _nnx

        ids = jnp.asarray(decoder_start_ids, jnp.int32)
        B, T0 = ids.shape
        caches = self.init_cache(B, T0 + max_new_tokens, quantized=quantized_cache)
        graphdef, state = _nnx.split((self, caches))

        @jax.jit
        def run(state, feats, ids):
            mod, cs = _nnx.merge(graphdef, state)
            enc = mod.encode(feats)
            logits = mod.decode(ids, enc, caches=cs, position_offset=0)
            _, state = _nnx.split((mod, cs))
            tok = jnp.argmax(logits[:, -1], axis=-1)
            done = jnp.zeros((B,), bool)
            if eos_token_id is not None:
                done = tok == eos_token_id

            def body(carry, i):
                state, tok, done = carry
                mod, cs = _nnx.merge(graphdef, state)
                lg = mod.decode(tok[:, None], enc, caches=cs,
                                position_offset=T0 + i)
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

        gen = run(state, jnp.asarray(input_features), ids)
        return jnp.concatenate([ids, gen], axis=1)

    @staticmethod
    def hf_tensor_converter(tensors):
        """HF conv weights [out, in, k] -> unfold GEMM layout [out, in*k]."""
        out = {}
        for k, v in tensors.items():
            if ".conv1.weight" in k or ".conv2.weight" in k:
                v = np.asarray(v).reshape(v.shape[0], -1)
            out[k] = v
        return out
