"""T5 zoo family (reference transformer_module_mapping maps T5LayerNorm,
fx/transformer/utils.py:30-51): logit parity vs the installed HF torch
implementation, relative-position-bucket golden check, cached decode,
seq2seq generation, BASIC transformability."""

import numpy as np
import pytest
from flax import nnx

from dmx_compressor_tpu.models.t5 import (
    T5Config,
    T5ForConditionalGeneration,
    relative_position_bucket,
)
from dmx_compressor_tpu.modeling.hf import load_hf_state_dict
from dmx_compressor_tpu.modeling.model import DmxModel


def ids(b, t, v, seed=0):
    return np.random.RandomState(seed).randint(0, v, size=(b, t)).astype("int32")


def test_relative_position_bucket_matches_hf():
    torch = pytest.importorskip("torch")
    from transformers.models.t5.modeling_t5 import T5Attention as HFT5Attention

    rel = np.arange(-300, 301).reshape(1, -1)
    for bidirectional in (True, False):
        want = HFT5Attention._relative_position_bucket(
            torch.tensor(rel), bidirectional=bidirectional, num_buckets=32,
            max_distance=128,
        ).numpy()
        got = np.asarray(
            relative_position_bucket(
                np.asarray(rel, np.int32),
                bidirectional=bidirectional,
                num_buckets=32,
                max_distance=128,
            )
        )
        np.testing.assert_array_equal(got, want)


def test_t5_matches_hf_torch():
    torch = pytest.importorskip("torch")
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration as HFT5

    cfg = T5Config.tiny()
    hf_cfg = HFT5Config(
        vocab_size=cfg.vocab_size,
        d_model=cfg.d_model,
        d_kv=cfg.d_kv,
        d_ff=cfg.d_ff,
        num_layers=cfg.num_layers,
        num_decoder_layers=cfg.num_decoder_layers,
        num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        relative_attention_max_distance=cfg.relative_attention_max_distance,
        layer_norm_epsilon=cfg.layer_norm_epsilon,
        dropout_rate=0.0,
        feed_forward_proj="relu",
        tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    hf = HFT5(hf_cfg).eval()
    model = T5ForConditionalGeneration(cfg, rngs=nnx.Rngs(0))
    tensors = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    tensors = T5ForConditionalGeneration.hf_tensor_converter(tensors)
    missed = load_hf_state_dict(model, tensors)
    assert all(m == "lm_head.weight" for m in missed), missed

    x = ids(2, 10, cfg.vocab_size)
    d = ids(2, 7, cfg.vocab_size, seed=1)
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(x, dtype=torch.long),
            decoder_input_ids=torch.tensor(d, dtype=torch.long),
        ).logits.numpy()
    got = np.asarray(model(x, d))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_t5_gated_v11_matches_hf_torch():
    torch = pytest.importorskip("torch")
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration as HFT5

    cfg = T5Config.tiny()
    cfg.is_gated_act = True
    cfg.tie_word_embeddings = False
    hf_cfg = HFT5Config(
        vocab_size=cfg.vocab_size,
        d_model=cfg.d_model,
        d_kv=cfg.d_kv,
        d_ff=cfg.d_ff,
        num_layers=cfg.num_layers,
        num_decoder_layers=cfg.num_decoder_layers,
        num_heads=cfg.num_heads,
        dropout_rate=0.0,
        feed_forward_proj="gated-gelu",
        tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    hf = HFT5(hf_cfg).eval()
    model = T5ForConditionalGeneration(cfg, rngs=nnx.Rngs(0))
    tensors = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    tensors = T5ForConditionalGeneration.hf_tensor_converter(tensors)
    missed = load_hf_state_dict(model, tensors)
    assert missed == []

    x = ids(2, 8, cfg.vocab_size)
    d = ids(2, 5, cfg.vocab_size, seed=1)
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(x, dtype=torch.long),
            decoder_input_ids=torch.tensor(d, dtype=torch.long),
        ).logits.numpy()
    np.testing.assert_allclose(np.asarray(model(x, d)), want, atol=2e-4, rtol=1e-4)


def test_t5_cached_decode_matches_full():
    cfg = T5Config.tiny()
    model = T5ForConditionalGeneration(cfg, rngs=nnx.Rngs(0))
    x = ids(2, 10, cfg.vocab_size)
    d = ids(2, 6, cfg.vocab_size, seed=1)
    full = np.asarray(model(x, d))
    enc = model.encode(x)
    caches = model.init_cache(2, 8)
    model.decode(d[:, :5], enc, caches=caches, position_offset=0)
    step = np.asarray(model.decode(d[:, 5:6], enc, caches=caches, position_offset=5))
    np.testing.assert_allclose(step[:, 0], full[:, 5], atol=2e-3)


def test_t5_generate():
    cfg = T5Config.tiny()
    model = T5ForConditionalGeneration(cfg, rngs=nnx.Rngs(0))
    x = ids(2, 10, cfg.vocab_size)
    start = np.zeros((2, 1), np.int32)  # decoder_start_token_id = pad = 0
    out = np.asarray(model.generate(x, start, max_new_tokens=6))
    assert out.shape == (2, 7)
    assert (out[:, 0] == 0).all()
    assert (out >= 0).all() and (out < cfg.vocab_size).all()


def test_t5_basic_transform():
    cfg = T5Config.tiny()
    model = T5ForConditionalGeneration(cfg, rngs=nnx.Rngs(0))
    dm = DmxModel.from_raw(model)
    dm.to_basic_mode()
    x = ids(2, 16, cfg.vocab_size)
    d = ids(2, 8, cfg.vocab_size, seed=1)
    q = np.asarray(dm(x, d))
    assert np.isfinite(q).all()
    names = [n for n, _ in dm.named_dmx_modules()]
    # T5LayerNorm (RMSNorm) is a substitution site per the reference mapping
    assert any("layer_norm" in n for n in names)
    assert any("self_attn.q" in n for n in names)


def test_t5_checkpoint_import(tmp_path):
    import json
    import os

    from safetensors.numpy import save_file

    from dmx_compressor_tpu.modeling.hf import model_from_checkpoint

    torch = pytest.importorskip("torch")
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration as HFT5

    cfg = T5Config.tiny()
    hf_cfg = HFT5Config(
        vocab_size=cfg.vocab_size,
        d_model=cfg.d_model,
        d_kv=cfg.d_kv,
        d_ff=cfg.d_ff,
        num_layers=cfg.num_layers,
        num_decoder_layers=cfg.num_decoder_layers,
        num_heads=cfg.num_heads,
        dropout_rate=0.0,
        feed_forward_proj="relu",
        tie_word_embeddings=True,
    )
    torch.manual_seed(2)
    hf = HFT5(hf_cfg).eval()
    with open(os.path.join(tmp_path, "config.json"), "w") as f:
        json.dump(
            {
                "model_type": "t5",
                "vocab_size": cfg.vocab_size,
                "d_model": cfg.d_model,
                "d_kv": cfg.d_kv,
                "d_ff": cfg.d_ff,
                "num_layers": cfg.num_layers,
                "num_decoder_layers": cfg.num_decoder_layers,
                "num_heads": cfg.num_heads,
                "feed_forward_proj": "relu",
                "tie_word_embeddings": True,
            },
            f,
        )
    tensors = {
        k: v.detach().numpy() for k, v in hf.state_dict().items()
        if k != "lm_head.weight"
    }
    save_file(tensors, os.path.join(tmp_path, "model.safetensors"))

    loaded, missed = model_from_checkpoint(str(tmp_path))
    assert missed == []
    x = ids(2, 8, cfg.vocab_size)
    d = ids(2, 5, cfg.vocab_size, seed=1)
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(x, dtype=torch.long),
            decoder_input_ids=torch.tensor(d, dtype=torch.long),
        ).logits.numpy()
    np.testing.assert_allclose(np.asarray(loaded(x, d)), want, atol=2e-4, rtol=1e-4)


def test_t5_pipeline_seq2seq(tmp_path):
    """Pipeline task surface for encoder-decoder models: checkpoint ->
    BASIC-configured pipeline -> generate_seq2seq."""
    import json
    import os

    import torch
    from safetensors.numpy import save_file
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration as HFT5

    from dmx_compressor_tpu.modeling.hf import pipeline

    cfg = T5Config.tiny()
    hf_cfg = HFT5Config(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model, d_kv=cfg.d_kv,
        d_ff=cfg.d_ff, num_layers=cfg.num_layers,
        num_decoder_layers=cfg.num_decoder_layers, num_heads=cfg.num_heads,
        dropout_rate=0.0, feed_forward_proj="relu", tie_word_embeddings=True,
    )
    torch.manual_seed(4)
    hf = HFT5(hf_cfg).eval()
    with open(os.path.join(tmp_path, "config.json"), "w") as f:
        json.dump({
            "model_type": "t5", "vocab_size": cfg.vocab_size,
            "d_model": cfg.d_model, "d_kv": cfg.d_kv, "d_ff": cfg.d_ff,
            "num_layers": cfg.num_layers,
            "num_decoder_layers": cfg.num_decoder_layers,
            "num_heads": cfg.num_heads, "feed_forward_proj": "relu",
            "tie_word_embeddings": True,
        }, f)
    save_file(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()
         if k != "lm_head.weight"},
        os.path.join(tmp_path, "model.safetensors"),
    )
    pipe = pipeline("text2text-generation", str(tmp_path), dmx_config="BASIC")
    assert pipe.missed_keys == []
    x = ids(2, 10, cfg.vocab_size)
    out = np.asarray(pipe.generate_seq2seq(x, max_new_tokens=5))
    assert out.shape == (2, 6)
    assert (out >= 0).all() and (out < cfg.vocab_size).all()
