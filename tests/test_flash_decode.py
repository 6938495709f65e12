"""Flash-decode kernels (ops/flash_decode.py): blockwise single-query
attention over fp and int8 caches, validated in Pallas interpret mode
against the unblocked references and the quantized_sdpa factorization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmx_compressor_tpu.ops.flash_decode import (
    flash_decode,
    flash_decode_int8,
    flash_decode_int8_ref,
    flash_decode_ref,
)
from dmx_compressor_tpu.ops.kv_cache import QuantKV, QuantizedKVCache, quantized_sdpa

RNG = np.random.default_rng(0)


def rand(*shape, dtype=np.float32):
    return jnp.asarray(RNG.standard_normal(shape).astype(dtype))


@pytest.mark.parametrize("rep", [1, 4])
def test_flash_decode_matches_ref(rep):
    B, H, S, D = 3, 8, 256, 64
    q = rand(B, H, 1, D)
    k = rand(B, H // rep, S, D)
    v = rand(B, H // rep, S, D)
    lengths = jnp.asarray([17, 256, 130], jnp.int32)
    out = flash_decode(q, k, v, lengths, use_pallas=True, interpret=True)
    ref = flash_decode_ref(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)


def test_flash_decode_scalar_length_and_ref_fallback():
    B, H, S, D = 2, 4, 192, 32
    q, k, v = rand(B, H, 1, D), rand(B, H, S, D), rand(B, H, S, D)
    out = flash_decode(q, k, v, 100, use_pallas=True, interpret=True,
                       block_k=64)
    ref = flash_decode_ref(q, k, v, 100)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)
    # S % block_k != 0 silently routes to the unblocked reference
    out2 = flash_decode(q, k, v, 100, use_pallas=True, block_k=128)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=0)


def quantize_kv(k, v):
    kq, ks = QuantizedKVCache._quantize(k.astype(jnp.float32))
    vq, vs = QuantizedKVCache._quantize(v.astype(jnp.float32))
    return QuantKV(kq, vq, ks, vs)


@pytest.mark.parametrize("rep", [1, 2])
def test_flash_decode_int8_matches_quantized_sdpa(rep):
    """The int8 kernel must reproduce quantized_sdpa's scale-after-matmul
    factorization (masked to the valid length) up to tiled fp32 reduction
    order."""
    B, H, S, D = 2, 8, 256, 64
    q = rand(B, H, 1, D)
    kv = quantize_kv(rand(B, H // rep, S, D), rand(B, H // rep, S, D))
    lengths = jnp.asarray([255, 64], jnp.int32)
    out = flash_decode_int8(q, kv, lengths, use_pallas=True, interpret=True)
    ref = flash_decode_int8_ref(q, kv, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)
    # cross-check the reference itself against quantized_sdpa + mask
    mask = jnp.where(
        jnp.arange(S)[None, None, None, :] < lengths[:, None, None, None],
        0.0, -1e30,
    )
    sdpa = quantized_sdpa(q, kv, attn_mask=mask, enable_gqa=rep > 1)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(sdpa),
                               atol=2e-5, rtol=1e-4)


def test_flash_decode_int8_full_length():
    B, H, S, D = 1, 4, 128, 64
    q = rand(B, H, 1, D)
    kv = quantize_kv(rand(B, H, S, D), rand(B, H, S, D))
    out = flash_decode_int8(q, kv, S, use_pallas=True, interpret=True)
    ref = flash_decode_int8_ref(q, kv, S)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)


def _tiny_opt():
    from flax import nnx

    from dmx_compressor_tpu.models.opt import OPTConfig, OPTForCausalLM

    cfg = OPTConfig(vocab_size=97, hidden_size=64, ffn_dim=128,
                    num_hidden_layers=2, num_attention_heads=4,
                    max_position_embeddings=256)
    return OPTForCausalLM(cfg, rngs=nnx.Rngs(0))


def _decode_logits(model, ids, n_steps, quantized):
    caches = model.init_cache(1, 128, quantized=quantized)
    logits = model(ids, caches=caches, position_offset=0)
    outs = [logits[:, -1]]
    tok = jnp.argmax(logits[:, -1], axis=-1)[:, None].astype(jnp.int32)
    for i in range(n_steps):
        logits = model(tok, caches=caches, position_offset=ids.shape[1] + i)
        outs.append(logits[:, -1])
        tok = jnp.argmax(logits[:, -1], axis=-1)[:, None].astype(jnp.int32)
    return jnp.stack(outs)


@pytest.mark.parametrize("quantized", [False, True])
def test_opt_decode_routes_through_flash_decode(monkeypatch, quantized):
    """The OPT attend wiring (models/opt.py): with the viability gate forced
    on (interpret-mode kernels standing in for the TPU), decode logits must
    match the einsum reference paths."""

    from dmx_compressor_tpu.ops import flash_decode as fd

    model = _tiny_opt()
    ids = jnp.asarray(RNG.integers(1, 97, (1, 7)), jnp.int32)
    want = _decode_logits(model, ids, 4, quantized)

    calls = []
    orig_fp, orig_int8 = fd.flash_decode, fd.flash_decode_int8

    def spy(fn):
        def wrapped(*a, **kw):
            calls.append(fn.__name__)
            return fn(*a, use_pallas=True, interpret=True, **kw)

        return wrapped

    monkeypatch.setattr(fd, "flash_decode_viable",
                        lambda S, block_k=128, kind="fp":
                        S % min(block_k, S) == 0)
    monkeypatch.setattr(fd, "flash_decode", spy(orig_fp))
    monkeypatch.setattr(fd, "flash_decode_int8", spy(orig_int8))
    got = _decode_logits(model, ids, 4, quantized)
    expect_name = "flash_decode_int8" if quantized else "flash_decode"
    assert expect_name in calls, f"route not taken: {calls}"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("rep,block_h", [(1, 4), (2, 3), (4, 2)])
def test_flash_decode_multihead_blocking(rep, block_h):
    """The r4 pipelined kernel's head-blocked path (G KV heads per grid
    step, K-block dim in the grid): parity across G x rep combinations
    with several K blocks and ragged lengths."""
    from dmx_compressor_tpu.ops import flash_decode as fd

    B, H, S, D = 2, 12, 512, 64
    q = rand(B, H, 1, D)
    kT = rand(B, H // rep, D, S)
    vT = rand(B, H // rep, D, S)
    lengths = jnp.asarray([313, 512], jnp.int32)
    out = fd._decode_pallas_T(
        q, kT, vT, lengths, 0.125, 128, rep, interpret=True, block_h=block_h
    )
    ref = flash_decode_ref(q, kT.swapaxes(-1, -2), vT.swapaxes(-1, -2),
                           lengths, 0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)


@pytest.mark.parametrize("block_h", [2, 4])
def test_flash_decode_int8_multihead_blocking(block_h):
    from dmx_compressor_tpu.ops import flash_decode as fd

    B, H, S, D = 2, 8, 384, 64
    rep = 2
    q = rand(B, H, 1, D)
    k = rand(B, H // rep, S, D)
    v = rand(B, H // rep, S, D)
    kv = quantize_kv(k, v)
    kvT = QuantKV(kv.k_q.swapaxes(-1, -2), kv.v_q.swapaxes(-1, -2),
                  kv.k_scale, kv.v_scale, s_minor=True)
    lengths = jnp.asarray([129, 384], jnp.int32)
    Hkv = H // rep
    out = fd._decode_int8_pallas_T(
        q, kvT.k_q, kvT.v_q,
        kvT.k_scale.astype(jnp.float32).reshape(B, Hkv, 1, S),
        kvT.v_scale.astype(jnp.float32).reshape(B, Hkv, 1, S),
        lengths, 0.125, 128, rep, interpret=True, block_h=block_h,
    )
    ref = flash_decode_int8_ref(q, kvT, lengths, 0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)
