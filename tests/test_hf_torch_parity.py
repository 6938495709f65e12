"""Model-math parity vs the installed HF torch implementations for the
round-1 zoo families (OPT / GPT-2 / Llama / Mistral / Whisper / CLIP):
same random weights -> same outputs.  Gemma/Qwen3/T5 have the same checks
in test_gemma_qwen3.py / test_t5.py.  This is the model-level counterpart
of tests/test_reference_parity.py's kernel-level oracle, and the strongest
zero-egress evidence toward the BASELINE.md Δ<=0.05 perplexity bar."""

import numpy as np
import pytest
from flax import nnx

from dmx_compressor_tpu.modeling.hf import load_hf_state_dict

torch = pytest.importorskip("torch")

ATOL = 3e-4


def ids(b, t, v, seed=0):
    return np.random.RandomState(seed).randint(0, v, size=(b, t)).astype("int32")


def _to_numpy(hf_model):
    return {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}


def _load(model, hf_model, allow_missed=()):
    tensors = _to_numpy(hf_model)
    converter = getattr(type(model), "hf_tensor_converter", None)
    if converter is not None:
        tensors = converter(tensors)
    missed = load_hf_state_dict(model, tensors)
    unexpected = [
        m for m in missed
        if not any(tag in m for tag in allow_missed)
        and "rotary" not in m and "inv_freq" not in m
        and "position_ids" not in m
    ]
    assert unexpected == [], unexpected


def test_opt_matches_hf_torch():
    from transformers import OPTConfig as HFOPTConfig
    from transformers import OPTForCausalLM as HFOPT

    from dmx_compressor_tpu.models.opt import OPTConfig, OPTForCausalLM

    cfg = OPTConfig.tiny()
    hf_cfg = HFOPTConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        ffn_dim=cfg.ffn_dim,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        do_layer_norm_before=cfg.do_layer_norm_before,
        word_embed_proj_dim=cfg.hidden_size,
        dropout=0.0,
        activation_function="relu",
    )
    torch.manual_seed(0)
    hf = HFOPT(hf_cfg).eval()
    model = OPTForCausalLM(cfg, rngs=nnx.Rngs(0))
    _load(model, hf, allow_missed=("lm_head.weight",))
    x = ids(2, 12, cfg.vocab_size)
    with torch.no_grad():
        want = hf(torch.tensor(x, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(np.asarray(model(x)), want, atol=ATOL, rtol=1e-4)


def test_gpt2_matches_hf_torch():
    from transformers import GPT2Config as HFGPT2Config
    from transformers import GPT2LMHeadModel as HFGPT2

    from dmx_compressor_tpu.models.gpt2 import GPT2Config, GPT2LMHeadModel

    cfg = GPT2Config.tiny()
    hf_cfg = HFGPT2Config(
        vocab_size=cfg.vocab_size,
        n_embd=cfg.n_embd,
        n_layer=cfg.n_layer,
        n_head=cfg.n_head,
        n_positions=cfg.n_positions,
        resid_pdrop=0.0,
        embd_pdrop=0.0,
        attn_pdrop=0.0,
        activation_function="gelu_new",
    )
    torch.manual_seed(0)
    hf = HFGPT2(hf_cfg).eval()
    model = GPT2LMHeadModel(cfg, rngs=nnx.Rngs(0))
    _load(model, hf, allow_missed=("lm_head.weight", ".attn.bias"))
    x = ids(2, 12, cfg.vocab_size)
    with torch.no_grad():
        want = hf(torch.tensor(x, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(np.asarray(model(x)), want, atol=ATOL, rtol=1e-4)


def test_llama_matches_hf_torch():
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM as HFLlama

    from dmx_compressor_tpu.models.llama import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig.tiny()
    hf_cfg = HFLlamaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        attention_bias=False,
        mlp_bias=False,
        attention_dropout=0.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = HFLlama(hf_cfg).eval()
    model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
    _load(model, hf)
    x = ids(2, 12, cfg.vocab_size)
    with torch.no_grad():
        want = hf(torch.tensor(x, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(np.asarray(model(x)), want, atol=ATOL, rtol=1e-4)


def test_mistral_sliding_window_matches_hf_torch():
    from transformers import MistralConfig as HFMistralConfig
    from transformers import MistralForCausalLM as HFMistral

    from dmx_compressor_tpu.models.mistral import (
        MistralConfig,
        MistralForCausalLM,
    )

    cfg = MistralConfig.tiny()  # sliding_window=16
    hf_cfg = HFMistralConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        sliding_window=cfg.sliding_window,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        attention_dropout=0.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = HFMistral(hf_cfg).eval()
    model = MistralForCausalLM(cfg, rngs=nnx.Rngs(0))
    _load(model, hf)
    # T=32 > sliding_window=16, so the band genuinely matters here
    x = ids(2, 32, cfg.vocab_size)
    with torch.no_grad():
        want = hf(torch.tensor(x, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(np.asarray(model(x)), want, atol=ATOL, rtol=1e-4)


def test_whisper_matches_hf_torch():
    from transformers import WhisperConfig as HFWhisperConfig
    from transformers import (
        WhisperForConditionalGeneration as HFWhisper,
    )

    from dmx_compressor_tpu.models.whisper import (
        WhisperConfig,
        WhisperForConditionalGeneration,
    )

    cfg = WhisperConfig.tiny()
    hf_cfg = HFWhisperConfig(
        vocab_size=cfg.vocab_size,
        num_mel_bins=cfg.num_mel_bins,
        d_model=cfg.d_model,
        encoder_layers=cfg.encoder_layers,
        decoder_layers=cfg.decoder_layers,
        encoder_attention_heads=cfg.encoder_attention_heads,
        decoder_attention_heads=cfg.decoder_attention_heads,
        encoder_ffn_dim=cfg.encoder_ffn_dim,
        decoder_ffn_dim=cfg.decoder_ffn_dim,
        max_source_positions=cfg.max_source_positions,
        max_target_positions=cfg.max_target_positions,
        dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        activation_function="gelu",
        # token-id defaults exceed the tiny vocab
        pad_token_id=0,
        bos_token_id=0,
        eos_token_id=1,
        decoder_start_token_id=1,
        begin_suppress_tokens=None,
        suppress_tokens=None,
    )
    torch.manual_seed(0)
    hf = HFWhisper(hf_cfg).eval()
    model = WhisperForConditionalGeneration(cfg, rngs=nnx.Rngs(0))
    _load(model, hf, allow_missed=("proj_out.weight", "embed_positions"))
    # HF adds the FULL positional table, so frames/2 must equal
    # max_source_positions
    feats = np.random.RandomState(0).randn(
        2, cfg.num_mel_bins, 2 * cfg.max_source_positions
    ).astype("float32")
    dec = ids(2, 7, cfg.vocab_size, seed=1)
    # our decoder's positional table is learned; copy HF's
    pe = hf.model.decoder.embed_positions.weight.detach().numpy()
    model.model.decoder.embed_positions.embedding.value = pe
    se = hf.model.encoder.embed_positions.weight.detach().numpy()
    import jax.numpy as jnp

    model.model.encoder.embed_positions.value = jnp.asarray(se)
    with torch.no_grad():
        want = hf(
            input_features=torch.tensor(feats),
            decoder_input_ids=torch.tensor(dec, dtype=torch.long),
        ).logits.numpy()
    got = np.asarray(model(feats, dec))
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-4)


def test_clip_matches_hf_torch():
    from transformers import CLIPConfig as HFCLIPConfig
    from transformers import CLIPModel as HFCLIP

    from dmx_compressor_tpu.models.clip import CLIPConfig, CLIPModel

    cfg = CLIPConfig.tiny()
    hf_cfg = HFCLIPConfig(
        text_config={
            "vocab_size": cfg.text.vocab_size,
            "hidden_size": cfg.text.hidden_size,
            "intermediate_size": cfg.text.intermediate_size,
            "num_hidden_layers": cfg.text.num_hidden_layers,
            "num_attention_heads": cfg.text.num_attention_heads,
            "max_position_embeddings": cfg.text.max_position_embeddings,
            "hidden_act": "quick_gelu",
            "attention_dropout": 0.0,
            # HF pools at the first eos position; our model pools at
            # argmax(ids) (the CLIP convention) — with eos = the largest
            # token id placed once per row the two coincide
            "bos_token_id": 0,
            "eos_token_id": cfg.text.vocab_size - 1,
        },
        vision_config={
            "hidden_size": cfg.vision.hidden_size,
            "intermediate_size": cfg.vision.intermediate_size,
            "num_hidden_layers": cfg.vision.num_hidden_layers,
            "num_attention_heads": cfg.vision.num_attention_heads,
            "image_size": cfg.vision.image_size,
            "patch_size": cfg.vision.patch_size,
            "hidden_act": "quick_gelu",
            "attention_dropout": 0.0,
        },
        projection_dim=cfg.projection_dim,
        logit_scale_init_value=cfg.logit_scale_init,
    )
    torch.manual_seed(0)
    hf = HFCLIP(hf_cfg).eval()
    model = CLIPModel(cfg, rngs=nnx.Rngs(0))
    _load(model, hf)
    rs = np.random.RandomState(0)
    pix = rs.randn(2, 3, cfg.vision.image_size, cfg.vision.image_size).astype(
        "float32"
    )
    # text pooling follows HF's argmax(input_ids) eos convention: make the
    # largest token id the "eos" at a distinct position per row
    txt = ids(2, cfg.text.max_position_embeddings, cfg.text.vocab_size - 1, seed=1)
    txt[0, 5] = cfg.text.vocab_size - 1
    txt[1, 9] = cfg.text.vocab_size - 1
    with torch.no_grad():
        out = hf(
            input_ids=torch.tensor(txt, dtype=torch.long),
            pixel_values=torch.tensor(pix),
        )
        want = out.logits_per_image.numpy()
    got_img, _ = model(txt, pix)
    np.testing.assert_allclose(np.asarray(got_img), want, atol=ATOL, rtol=1e-4)
