"""GPT-2 fused BASIC decode vs the modular module pipeline — the OPT fused
step shape with the ReLU swapped for the exact tanh-GELU between FLOAT16
casts, plus the fused final-LN + tied-LM-head kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from dmx_compressor_tpu.modeling.model import DmxModel
from dmx_compressor_tpu.models.gpt2 import GPT2Config, GPT2LMHeadModel
from dmx_compressor_tpu.ops.compress import (
    compress_for_inference,
    set_inference_mode,
)


@pytest.fixture(autouse=True)
def _inference_mode():
    set_inference_mode(True)
    yield
    set_inference_mode(False)


def _cfg():
    # head_dim 64 == the BASIC BFP block size so the fused SDPA engages
    return GPT2Config(vocab_size=256, n_embd=128, n_layer=2, n_head=2,
                      n_positions=256)


def _basic_model():
    cfg = _cfg()
    model = GPT2LMHeadModel(cfg, rngs=nnx.Rngs(0))
    dm = DmxModel.from_raw(model)
    dm.to_basic_mode()
    compress_for_inference(dm)
    return cfg, model


def test_plan_detected_after_compress():
    from dmx_compressor_tpu.ops.basic_layer import (
        basic_gpt2_block_plan,
        basic_head_plan,
    )

    _, model = _basic_model()
    plan = basic_gpt2_block_plan(model.transformer.h[0])
    assert plan is not None
    assert plan.wl == 8 and plan.block == 64
    hp = basic_head_plan(model.transformer.ln_f, model.lm_head)
    assert hp is not None


def test_fused_decode_matches_modular(monkeypatch):
    cfg, model = _basic_model()

    B, P = 2, 64
    ids = jax.random.randint(jax.random.key(17), (B, P), 0, cfg.vocab_size)
    tok = jnp.ones((B, 1), jnp.int32)

    from dmx_compressor_tpu.ops import basic_layer as bl

    # modular reference: same weights, fused dispatch disabled
    mono = model.init_cache(B, P + 64)
    model(ids, caches=mono, position_offset=0)
    with monkeypatch.context() as mp:
        mp.setattr(bl, "basic_gpt2_block_plan", lambda *_: None)
        mp.setattr(bl, "basic_head_plan", lambda *_: None)
        want = model(tok, caches=mono, position_offset=P)

    calls = []
    orig = bl.basic_gpt2_block_plan

    def spy(*a, **k):
        p = orig(*a, **k)
        if p is not None:
            calls.append(1)
        return p

    caches = model.init_cache(B, P + 64)
    model(ids, caches=caches, position_offset=0)
    with monkeypatch.context() as mp:
        mp.setattr(bl, "basic_gpt2_block_plan", spy)
        got = model(tok, caches=caches, position_offset=P)
    assert calls, "fused step did not engage"
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-4
    )


def test_fused_split_decode_matches_modular(monkeypatch):
    cfg, model = _basic_model()

    B, P = 2, 64
    ids = jax.random.randint(jax.random.key(19), (B, P), 0, cfg.vocab_size)
    tok = jnp.ones((B, 1), jnp.int32)

    from dmx_compressor_tpu.ops import basic_layer as bl

    mono = model.init_cache(B, P + 64)
    model(ids, caches=mono, position_offset=0)
    with monkeypatch.context() as mp:
        mp.setattr(bl, "basic_gpt2_block_plan", lambda *_: None)
        mp.setattr(bl, "basic_head_plan", lambda *_: None)
        want = model(tok, caches=mono, position_offset=P)

    split = model.init_cache(B, P + 64, split_base_len=P)
    model(ids, caches=split, position_offset=0)
    got = model(tok, caches=split, position_offset=P)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-4
    )
