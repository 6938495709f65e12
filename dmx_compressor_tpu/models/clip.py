"""CLIP dual-encoder (ViT-B/32 shapes): vision + text transformers.

The vision patch-embedding conv uses the Conv2dUnfold (im2col) lowering per
the reference's CLIP recipe (reference experimental.py Conv2dUnfold;
BASELINE.md: "CLIP ViT-B/32, alternative conv2d (im2col) lowering +
structured weight sparsity (BTOPK)").  Module paths mirror HF CLIPModel.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from .. import rawnn
from ..nn.experimental import Conv2dUnfold


@dataclasses.dataclass
class CLIPVisionConfig:
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    image_size: int = 224
    patch_size: int = 32
    num_channels: int = 3


@dataclasses.dataclass
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 512
    intermediate_size: int = 2048
    num_hidden_layers: int = 12
    num_attention_heads: int = 8
    max_position_embeddings: int = 77


@dataclasses.dataclass
class CLIPConfig:
    vision: CLIPVisionConfig = dataclasses.field(default_factory=CLIPVisionConfig)
    text: CLIPTextConfig = dataclasses.field(default_factory=CLIPTextConfig)
    projection_dim: int = 512
    logit_scale_init: float = 2.6592
    dtype: Any = jnp.float32

    @classmethod
    def vit_b_32(cls):
        return cls()

    @classmethod
    def tiny(cls):
        return cls(
            vision=CLIPVisionConfig(
                hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                num_attention_heads=4, image_size=32, patch_size=8,
            ),
            text=CLIPTextConfig(
                vocab_size=256, hidden_size=64, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=4,
                max_position_embeddings=16,
            ),
            projection_dim=32,
        )


class CLIPAttention(nnx.Module):
    def __init__(self, d: int, heads: int, *, rngs: nnx.Rngs):
        self.num_heads = heads
        self.head_dim = d // heads
        self.q_proj = nnx.Linear(d, d, rngs=rngs)
        self.k_proj = nnx.Linear(d, d, rngs=rngs)
        self.v_proj = nnx.Linear(d, d, rngs=rngs)
        self.out_proj = nnx.Linear(d, d, rngs=rngs)
        self.sdpa = rawnn.ScaledDotProductAttention()

    def __call__(self, x, attn_mask=None):
        B, T, D = x.shape

        def split(t):
            return t.reshape(B, T, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)

        out = self.sdpa(
            split(self.q_proj(x)), split(self.k_proj(x)), split(self.v_proj(x)),
            attn_mask=attn_mask,
        )
        return self.out_proj(out.transpose(0, 2, 1, 3).reshape(B, T, D))


class CLIPMLP(nnx.Module):
    def __init__(self, d: int, m: int, *, rngs: nnx.Rngs):
        self.fc1 = nnx.Linear(d, m, rngs=rngs)
        self.activation_fn = rawnn.QuickGELU()
        self.fc2 = nnx.Linear(m, d, rngs=rngs)

    def __call__(self, x):
        return self.fc2(self.activation_fn(self.fc1(x)))


class CLIPEncoderLayer(nnx.Module):
    def __init__(self, d: int, m: int, heads: int, *, rngs: nnx.Rngs):
        self.self_attn = CLIPAttention(d, heads, rngs=rngs)
        self.layer_norm1 = nnx.LayerNorm(d, epsilon=1e-5, rngs=rngs)
        self.mlp = CLIPMLP(d, m, rngs=rngs)
        self.layer_norm2 = nnx.LayerNorm(d, epsilon=1e-5, rngs=rngs)
        self.resadd1 = rawnn.ResAdd()
        self.resadd2 = rawnn.ResAdd()

    def __call__(self, x, attn_mask=None):
        x = self.resadd1(self.self_attn(self.layer_norm1(x), attn_mask), x)
        x = self.resadd2(self.mlp(self.layer_norm2(x)), x)
        return x


class CLIPVisionTransformer(nnx.Module):
    def __init__(self, cfg: CLIPVisionConfig, *, rngs: nnx.Rngs):
        self.cfg = cfg
        d = cfg.hidden_size
        # im2col-lowered patch embedding (stride = kernel = patch size)
        self.patch_embedding = Conv2dUnfold(
            cfg.num_channels, d, cfg.patch_size, stride=cfg.patch_size, bias=False,
            rngs=rngs,
        )
        n_patches = (cfg.image_size // cfg.patch_size) ** 2
        self.class_embedding = nnx.Param(jax.random.normal(rngs.params(), (d,)) * 0.02)
        self.position_embedding = nnx.Embed(n_patches + 1, d, rngs=rngs)
        self.pre_layrnorm = nnx.LayerNorm(d, epsilon=1e-5, rngs=rngs)
        self.layers = nnx.data(
            [
                CLIPEncoderLayer(d, cfg.intermediate_size, cfg.num_attention_heads, rngs=rngs)
                for _ in range(cfg.num_hidden_layers)
            ]
        )
        self.post_layernorm = nnx.LayerNorm(d, epsilon=1e-5, rngs=rngs)

    def __call__(self, pixel_values):
        # pixel_values: [B, 3, H, W]
        B = pixel_values.shape[0]
        patches = self.patch_embedding(pixel_values)  # [B, D, h, w]
        x = patches.reshape(B, patches.shape[1], -1).transpose(0, 2, 1)
        cls = jnp.broadcast_to(self.class_embedding.value, (B, 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self.position_embedding(jnp.arange(x.shape[1]))[None]
        x = self.pre_layrnorm(x)
        for layer in self.layers:
            x = layer(x)
        return self.post_layernorm(x[:, 0])  # pooled CLS


class CLIPTextTransformer(nnx.Module):
    def __init__(self, cfg: CLIPTextConfig, *, rngs: nnx.Rngs):
        self.cfg = cfg
        d = cfg.hidden_size
        self.token_embedding = nnx.Embed(cfg.vocab_size, d, rngs=rngs)
        self.position_embedding = nnx.Embed(cfg.max_position_embeddings, d, rngs=rngs)
        self.layers = nnx.data(
            [
                CLIPEncoderLayer(d, cfg.intermediate_size, cfg.num_attention_heads, rngs=rngs)
                for _ in range(cfg.num_hidden_layers)
            ]
        )
        self.final_layer_norm = nnx.LayerNorm(d, epsilon=1e-5, rngs=rngs)

    def __call__(self, input_ids):
        B, T = input_ids.shape
        x = self.token_embedding(input_ids) + self.position_embedding(jnp.arange(T))[None]
        mask = jnp.where(
            jnp.arange(T)[None, :] <= jnp.arange(T)[:, None], 0.0, -1e4
        ).astype(x.dtype)
        for layer in self.layers:
            x = layer(x, attn_mask=mask)
        x = self.final_layer_norm(x)
        # pool at EOT (= argmax token id, HF convention)
        eot = jnp.argmax(input_ids, axis=-1)
        return x[jnp.arange(B), eot]


class CLIPModel(nnx.Module):
    def __init__(self, cfg: CLIPConfig, *, rngs: nnx.Rngs):
        self.cfg = cfg
        self.vision_model = CLIPVisionTransformer(cfg.vision, rngs=rngs)
        self.text_model = CLIPTextTransformer(cfg.text, rngs=rngs)
        self.visual_projection = nnx.Linear(
            cfg.vision.hidden_size, cfg.projection_dim, use_bias=False, rngs=rngs
        )
        self.text_projection = nnx.Linear(
            cfg.text.hidden_size, cfg.projection_dim, use_bias=False, rngs=rngs
        )
        self.logit_scale = nnx.Param(jnp.asarray(cfg.logit_scale_init))

    @property
    def config(self):
        return self.cfg

    def get_image_features(self, pixel_values):
        return self.visual_projection(self.vision_model(pixel_values))

    def get_text_features(self, input_ids):
        return self.text_projection(self.text_model(input_ids))

    def __call__(self, input_ids, pixel_values):
        img = self.get_image_features(pixel_values)
        txt = self.get_text_features(input_ids)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale.value)
        logits_per_text = scale * (txt @ img.T)
        return logits_per_text.T, logits_per_text  # (per_image, per_text)

    def zero_shot_classify(self, pixel_values, class_text_ids):
        """Zero-shot image classification: softmax over image-text cosine
        similarity against one tokenized prompt per class (the reference's
        CLIP benchmark task, examples/benchmarking/benchmark_clip.py).

        ``class_text_ids`` [n_classes, T]; returns probabilities
        [B, n_classes]."""
        img = self.get_image_features(pixel_values)
        txt = self.get_text_features(jnp.asarray(class_text_ids, jnp.int32))
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        logits = jnp.exp(self.logit_scale.value) * (img @ txt.T)
        return jax.nn.softmax(logits, axis=-1)

    @staticmethod
    def hf_tensor_converter(tensors):
        """HF CLIP layout -> zoo paths: drop the ``embeddings.`` /
        ``encoder.`` grouping levels, and reshape the patch conv
        [out, in, k, k] to the im2col GEMM layout [out, in*k*k]."""
        out = {}
        for k, v in tensors.items():
            if "patch_embedding.weight" in k:
                v = np.asarray(v).reshape(v.shape[0], -1)
            k = k.replace(".embeddings.", ".").replace(".encoder.layers.", ".layers.")
            out[k] = v
        return out
