"""Gemma + Qwen3 zoo families (reference transformer_module_mapping,
fx/transformer/utils.py:30-51): logit parity vs the installed HF torch
implementations, cached decode, and BASIC transformability."""

import numpy as np
import pytest
from flax import nnx

from dmx_compressor_tpu.modeling.hf import load_hf_state_dict
from dmx_compressor_tpu.modeling.model import DmxModel


def ids(b, t, v, seed=0):
    return np.random.RandomState(seed).randint(0, v, size=(b, t)).astype("int32")


# ---------------------------------------------------------------------------
# HF torch parity: same random weights -> same logits
# ---------------------------------------------------------------------------


def _torch_state_to_numpy(hf_model):
    return {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}


def test_gemma_matches_hf_torch():
    torch = pytest.importorskip("torch")
    from transformers import GemmaConfig as HFGemmaConfig
    from transformers import GemmaForCausalLM as HFGemma

    from dmx_compressor_tpu.models.gemma import GemmaConfig, GemmaForCausalLM

    cfg = GemmaConfig.tiny()
    hf_cfg = HFGemmaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        attention_dropout=0.0,
        hidden_act="gelu_pytorch_tanh",
    )
    torch.manual_seed(0)
    hf = HFGemma(hf_cfg).eval()
    model = GemmaForCausalLM(cfg, rngs=nnx.Rngs(0))
    missed = load_hf_state_dict(model, _torch_state_to_numpy(hf))
    # HF state dict carries only the tied lm_head copy + rotary buffers
    assert all(
        "rotary" in m or "inv_freq" in m or m == "lm_head.weight"
        for m in missed
    ), missed

    x = ids(2, 12, cfg.vocab_size)
    with torch.no_grad():
        want = hf(torch.tensor(x, dtype=torch.long)).logits.numpy()
    got = np.asarray(model(x))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_qwen3_matches_hf_torch():
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config as HFQwen3Config
    from transformers import Qwen3ForCausalLM as HFQwen3

    from dmx_compressor_tpu.models.qwen3 import Qwen3Config, Qwen3ForCausalLM

    cfg = Qwen3Config.tiny()
    hf_cfg = HFQwen3Config(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        attention_dropout=0.0,
        attention_bias=False,
        tie_word_embeddings=True,
        use_sliding_window=False,
    )
    torch.manual_seed(0)
    hf = HFQwen3(hf_cfg).eval()
    model = Qwen3ForCausalLM(cfg, rngs=nnx.Rngs(0))
    missed = load_hf_state_dict(model, _torch_state_to_numpy(hf))
    assert all(
        "rotary" in m or "inv_freq" in m or m == "lm_head.weight"
        for m in missed
    ), missed

    x = ids(2, 12, cfg.vocab_size)
    with torch.no_grad():
        want = hf(torch.tensor(x, dtype=torch.long)).logits.numpy()
    got = np.asarray(model(x))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# decode + transform
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("family", ["gemma", "qwen3"])
def test_cached_decode_matches_full(family):
    if family == "gemma":
        from dmx_compressor_tpu.models.gemma import (
            GemmaConfig as Config,
            GemmaForCausalLM as Model,
        )
    else:
        from dmx_compressor_tpu.models.qwen3 import (
            Qwen3Config as Config,
            Qwen3ForCausalLM as Model,
        )

    cfg = Config.tiny()
    model = Model(cfg, rngs=nnx.Rngs(0))
    x = ids(2, 6, cfg.vocab_size)
    full = np.asarray(model(x))
    caches = model.init_cache(2, 8)
    model(x[:, :5], caches=caches, position_offset=0)
    step = model(x[:, 5:6], caches=caches, position_offset=5)
    np.testing.assert_allclose(np.asarray(step)[:, 0], full[:, 5], atol=2e-3)


@pytest.mark.parametrize("family", ["gemma", "qwen3"])
def test_basic_transform(family):
    if family == "gemma":
        from dmx_compressor_tpu.models.gemma import (
            GemmaConfig as Config,
            GemmaForCausalLM as Model,
        )
    else:
        from dmx_compressor_tpu.models.qwen3 import (
            Qwen3Config as Config,
            Qwen3ForCausalLM as Model,
        )

    cfg = Config.tiny()
    model = Model(cfg, rngs=nnx.Rngs(0))
    dm = DmxModel.from_raw(model)
    dm.to_basic_mode()
    x = ids(2, 16, cfg.vocab_size)
    q = np.asarray(dm(x))
    assert np.isfinite(q).all()
    names = [n for n, _ in dm.named_dmx_modules()]
    assert any("apply_rope" in n for n in names)
    if family == "gemma":
        # GemmaRMSNorm must substitute into the (1+weight) dmx variant
        from dmx_compressor_tpu.nn.modules import GemmaRMSNorm

        assert any(
            isinstance(m, GemmaRMSNorm) for _, m in dm.named_dmx_modules()
        )
    else:
        # the per-head q/k norms are substitution sites too
        assert any("q_norm" in n for n in names)
        assert any("k_norm" in n for n in names)


def test_gemma_checkpoint_import(tmp_path):
    import json
    import os

    from safetensors.numpy import save_file

    from dmx_compressor_tpu.models.gemma import GemmaConfig, GemmaForCausalLM
    from dmx_compressor_tpu.modeling.hf import model_from_checkpoint

    cfg = GemmaConfig.tiny()
    src = GemmaForCausalLM(cfg, rngs=nnx.Rngs(3))
    with open(os.path.join(tmp_path, "config.json"), "w") as f:
        json.dump(
            {
                "model_type": "gemma",
                "vocab_size": cfg.vocab_size,
                "hidden_size": cfg.hidden_size,
                "intermediate_size": cfg.intermediate_size,
                "num_hidden_layers": cfg.num_hidden_layers,
                "num_attention_heads": cfg.num_attention_heads,
                "num_key_value_heads": cfg.num_key_value_heads,
                "head_dim": cfg.head_dim,
                "max_position_embeddings": cfg.max_position_embeddings,
                "rms_norm_eps": cfg.rms_norm_eps,
            },
            f,
        )
    tensors = {
        "model.embed_tokens.weight": np.asarray(
            src.model.embed_tokens.embedding.value
        )
    }
    for i, layer in enumerate(src.model.layers):
        p = f"model.layers.{i}"
        a, m = layer.self_attn, layer.mlp
        for name, lin in [
            ("self_attn.q_proj", a.q_proj),
            ("self_attn.k_proj", a.k_proj),
            ("self_attn.v_proj", a.v_proj),
            ("self_attn.o_proj", a.o_proj),
            ("mlp.gate_proj", m.gate_proj),
            ("mlp.up_proj", m.up_proj),
            ("mlp.down_proj", m.down_proj),
        ]:
            tensors[f"{p}.{name}.weight"] = np.ascontiguousarray(
                np.asarray(lin.kernel.value).T
            )
        tensors[f"{p}.input_layernorm.weight"] = np.asarray(
            layer.input_layernorm.weight.value
        )
        tensors[f"{p}.post_attention_layernorm.weight"] = np.asarray(
            layer.post_attention_layernorm.weight.value
        )
    tensors["model.norm.weight"] = np.asarray(src.model.norm.weight.value)
    save_file(tensors, os.path.join(tmp_path, "model.safetensors"))

    loaded, missed = model_from_checkpoint(str(tmp_path))
    assert missed == []
    x = ids(2, 8, cfg.vocab_size)
    np.testing.assert_allclose(
        np.asarray(loaded(x)), np.asarray(src(x)), atol=1e-5
    )
