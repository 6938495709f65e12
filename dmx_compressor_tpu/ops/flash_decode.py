"""Flash-decode: single-query attention over a long KV cache, blockwise.

Decode at long context is HBM-bound on the cache read.  The einsum
decomposition (``quantized_sdpa`` / modular sdpa) makes XLA pick a
D-on-lanes layout for the attention operands while the ``lax.scan`` decode
carry keeps the cache S-minor — at 2k context that materializes a full
layout copy of every per-layer KV buffer per step (the fp32 baseline leg
of ``bench.py ... long`` OOMs on exactly this, docs/ROADMAP.md §2a).

This kernel consumes the cache buffers in their native ``[B, H, S, D]``
layout, streams K/V tiles through VMEM with an online softmax, and never
materializes logits in HBM:

- :func:`flash_decode` — float K/V, per-row valid lengths instead of an
  additive mask (the decode mask is always ``col < filled_length``).
- :func:`flash_decode_int8` — int8 K/V payloads with per-position scales
  applied in VMEM *after* the matmuls (identical factorization to
  ops/kv_cache.quantized_sdpa: the per-key scale commutes out of the QK
  contraction, the per-value scale folds into the probabilities), so HBM
  reads stay int8 at any context length.

GQA is handled by the index map (query head h reads KV head h // rep) —
no ``jnp.repeat`` materialization.

Reference provenance: the reference has no serving/decode runtime at all
(its SDPA is the unblocked compound module, torch_modules.py:108-191);
this is TPU-native new surface like ops/flash_attention.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

NEG_INF = -1e30


def flash_decode_viable(S: int, block_k: int = 128) -> bool:
    """Kernel routing gate: on-TPU and a tileable cache length."""
    return jax.devices()[0].platform == "tpu" and S % min(block_k, S) == 0


def post_update_lengths(cache):
    """Per-row valid lengths AFTER this step's append — exactly what the
    plain causal decode mask (col <= position_offset) encodes, in array
    form for the flash-decode kernels."""
    if hasattr(cache, "lengths"):
        return cache.lengths.value  # [B] row caches
    return cache.length.value  # scalar fill point, broadcast by the kernel


def cached_attend(
    sdpa,
    q: Array,  # [B, H, T, D] (RoPE etc. already applied)
    k: Array,  # [B, Hkv, T, D] fresh keys for this step
    v: Array,
    cache,
    attn_mask,
    *,
    scale: Optional[float] = None,
    enable_gqa: bool = False,
    plain_causal: bool = True,
):
    """Shared cached-attention tail for the decoder families (Llama /
    Gemma / Qwen3 / GPT-2 / Whisper-decoder / Mistral):

    - honors the SDPA numerics contract: quantized storage with a
      non-transparent ``sdpa`` DEQUANTIZES and routes through the module's
      cast/surrogate pipeline (int8 changes only the storage, never the
      cast points — reference cast-point contract torch_modules.py:129-168,
      VERDICT r1 weak #3), using the fused BASIC decode kernels when the
      shapes match;
    - routes transparent T==1 decode through the flash-decode kernels when
      the mask is the plain causal ``col < filled-length`` form
      (``plain_causal=False`` for sliding-window models keeps the banded
      einsum path).
    """
    from .basic_attention import basic_sdpa_decode, basic_sdpa_shape
    from .flash_attention import sdpa_transparent
    from .kv_cache import quantized_sdpa

    T, D = q.shape[-2], q.shape[-1]
    scale_v = (D**-0.5) if scale is None else float(scale)
    quant = cache is not None and getattr(cache, "quantized", False)
    transparent = sdpa_transparent(sdpa)
    if cache is not None and getattr(cache, "split", False):
        return _split_cache_attend(
            sdpa, q, k, v, cache, attn_mask, scale_v, transparent,
            enable_gqa=enable_gqa,
        )
    if quant and transparent:
        kv = cache.update_quantized(k, v)
        S = kv.k_q.shape[-1] if kv.s_minor else kv.k_q.shape[-2]
        if (
            T == 1 and plain_causal and attn_mask is not None
            and flash_decode_viable(S)
        ):
            return flash_decode_int8(
                q, kv, post_update_lengths(cache), scale=scale_v
            )
        return quantized_sdpa(
            q, kv, attn_mask=attn_mask, scale=scale, enable_gqa=enable_gqa
        )
    if cache is not None:
        k, v, _ = cache.update(k, v)  # quantized storage dequantizes here
    if (
        transparent and cache is not None and T == 1 and plain_causal
        and attn_mask is not None and flash_decode_viable(k.shape[-2])
    ):
        if getattr(cache, "s_minor", False) and not cache.quantized:
            # read the cache buffers in their native (unpadded) layout
            return flash_decode(
                q, cache.k.value, cache.v.value,
                post_update_lengths(cache), scale=scale_v, s_minor=True,
            )
        return flash_decode(q, k, v, post_update_lengths(cache), scale=scale_v)
    if (
        not transparent and cache is not None and T == 1
        and attn_mask is not None
        and jnp.issubdtype(jnp.asarray(attn_mask).dtype, jnp.floating)
    ):
        # GQA handled inside the fused kernel (query heads grouped per KV
        # head — no repeat materialization)
        p = basic_sdpa_shape(sdpa, D, k.shape[-2])
        if p is not None:
            return basic_sdpa_decode(
                q, k, v, attn_mask, scale=scale_v, params=p
            )
    return sdpa(q, k, v, attn_mask=attn_mask, scale=scale,
                enable_gqa=enable_gqa)


def _split_cache_attend(
    sdpa, q, k, v, cache, attn_mask, scale: float, transparent: bool,
    *, enable_gqa: bool = False,
):
    """Attention over a SplitKVCache for any decoder family (the shared
    version of the OPT-only round-2 path): prefill writes the invariant
    base segment, T==1 decode appends the small mutable tail and runs the
    fused BASIC split kernel over precomputed base casts
    (ops/basic_attention.basic_sdpa_decode_split, GQA-aware).

    Caller contract: a T>1 call is a FRESH prefill of the base segment
    starting at position 0 (split caches are a monolithic-prefill serving
    configuration; chunked prefill uses row caches, and
    flash_chunked_prefill refuses write_base caches for the same reason).
    """
    from .basic_attention import basic_sdpa_decode_split, basic_sdpa_shape

    T = q.shape[-2]
    if T > 1:
        # prefill (tail appends are always single-token)
        cache.write_base(k, v)
        if transparent:
            from .flash_attention import flash_attention

            kf, vf = k, v
            if enable_gqa and kf.shape[-3] != q.shape[-3]:
                rep = q.shape[-3] // kf.shape[-3]
                kf = jnp.repeat(kf, rep, axis=-3)
                vf = jnp.repeat(vf, rep, axis=-3)
            return flash_attention(q, kf, vf, causal=True, scale=scale)
        # fresh k/v cover positions [0, T): slice the cache-wide mask
        m = attn_mask[..., : k.shape[-2]] if attn_mask is not None else None
        return sdpa(q, k, v, attn_mask=m, scale=scale,
                    enable_gqa=enable_gqa)
    if T == 1 and attn_mask is not None:
        p = basic_sdpa_shape(sdpa, q.shape[-1], cache.tail_len)
        if p is not None and cache.base_len % p.block == 0:
            bk, bv, tk, tv = cache.append_tail(k, v)  # raw s_minor segments
            precast = cache.base_cast_key == (p.wl, p.block)
            return basic_sdpa_decode_split(
                q, bk, bv, tk, tv, attn_mask, scale=scale, params=p,
                base_k_cast=cache.base_k_cast.value if precast else None,
                base_v_cast=cache.base_v_cast.value if precast else None,
                s_minor=cache.s_minor,
            )
    # modular fallback: concatenate segments (correct, slower)
    kf, vf, _ = cache.update(k, v)
    return sdpa(q, kf, vf, attn_mask=attn_mask, scale=scale,
                enable_gqa=enable_gqa)


def _lengths_2d(lengths, B):
    le = jnp.asarray(lengths, jnp.int32)
    if le.ndim == 0:
        le = jnp.broadcast_to(le[None], (B,))
    return le.reshape(B, 1)


def flash_decode_ref(q, k, v, lengths, scale=None):
    """Unblocked reference: masked softmax attention for T==1 queries,
    numerics matching the modular sdpa path."""
    D = q.shape[-1]
    scale = (D**-0.5) if scale is None else scale
    if k.shape[-3] != q.shape[-3]:
        rep = q.shape[-3] // k.shape[-3]
        k = jnp.repeat(k, rep, axis=-3)
        v = jnp.repeat(v, rep, axis=-3)
    logits = jnp.einsum(
        "bhld,bhsd->bhls", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    le = _lengths_2d(lengths, q.shape[0])  # [B, 1]
    mask = jnp.arange(k.shape[-2])[None, :] < le  # [B, S]
    logits = jnp.where(mask[:, None, None, :], logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhls,bhsd->bhld", w, v.astype(jnp.float32)).astype(
        q.dtype
    )


@functools.partial(
    jax.jit, static_argnames=("scale", "block_k", "rep", "interpret")
)
def _decode_pallas(q, k, v, lengths, scale, block_k, rep, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, _, D = q.shape
    S = k.shape[2]
    nk = S // block_k

    def kernel(q_ref, k_ref, v_ref, l_ref, o_ref):
        qv = q_ref[0, 0].astype(jnp.float32) * scale  # [1, D]
        # lengths live whole in SMEM (a [B] blocked spec is not a legal
        # Mosaic tile); indexed by the grid's batch coordinate
        le = l_ref[pl.program_id(0)]

        def body(kt, carry):
            m_prev, l_prev, acc = carry
            kv_ = k_ref[0, 0, pl.ds(kt * block_k, block_k), :].astype(
                jnp.float32
            )  # [BK, D]
            vv = v_ref[0, 0, pl.ds(kt * block_k, block_k), :].astype(
                jnp.float32
            )
            s = jax.lax.dot_general(
                qv, kv_, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [1, BK]
            col = kt * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_k), 1
            )
            s = jnp.where(col < le, s, NEG_INF)
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p, vv, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc

        m0 = jnp.full((1, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((1, 1), jnp.float32)
        a0 = jnp.zeros((1, D), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, a0))
        o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, 1, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, S, D), lambda b, h: (b, h // rep, 0, 0)),
            pl.BlockSpec((1, 1, S, D), lambda b, h: (b, h // rep, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, D), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, 1, D), q.dtype),
        interpret=interpret,
    )(q, k, v, lengths)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_k", "rep", "interpret")
)
def _decode_pallas_T(q, kT, vT, lengths, scale, block_k, rep, interpret=False):
    """s_minor variant: K/V arrive [B, Hkv, D, S] — the KV cache's physical
    layout (ops/kv_cache.KVCache).  D on sublanes / S on lanes tiles with
    ZERO padding for head_dim 64 (the D-minor layout pads 64 lanes to 128:
    2x the HBM stream), and the contractions need no in-kernel transpose:
    qk reads K^T directly, WV contracts the probabilities' lane dim with
    V^T's lane dim."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, _, D = q.shape
    S = kT.shape[-1]
    nk = S // block_k

    def kernel(q_ref, k_ref, v_ref, l_ref, o_ref):
        qv = q_ref[0, 0].astype(jnp.float32) * scale  # [1, D]
        le = l_ref[pl.program_id(0)]

        def body(kt, carry):
            m_prev, l_prev, acc = carry
            sl = pl.ds(kt * block_k, block_k)
            kv_ = k_ref[0, 0, :, sl].astype(jnp.float32)  # [D, BK]
            vv = v_ref[0, 0, :, sl].astype(jnp.float32)  # [D, BK]
            s = jax.lax.dot_general(
                qv, kv_, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [1, BK]
            col = kt * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_k), 1
            )
            s = jnp.where(col < le, s, NEG_INF)
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p, vv, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [1, D]
            return m_new, l_new, acc

        m0 = jnp.full((1, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((1, 1), jnp.float32)
        a0 = jnp.zeros((1, D), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, a0))
        o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, 1, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, D, S), lambda b, h: (b, h // rep, 0, 0)),
            pl.BlockSpec((1, 1, D, S), lambda b, h: (b, h // rep, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, D), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, 1, D), q.dtype),
        interpret=interpret,
    )(q, kT, vT, lengths)


def flash_decode(
    q: Array,  # [B, H, 1, D]
    k: Array,  # [B, Hkv, S, D] — or [B, Hkv, D, S] with s_minor=True
    v: Array,
    lengths,  # [B] per-row valid lengths (or a scalar), int32
    scale: Optional[float] = None,
    block_k: int = 128,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
    s_minor: bool = False,
) -> Array:
    """softmax((q k^T)*scale masked to col < lengths[b]) v for one query
    per row.  Returns [B, H, 1, D].  ``s_minor=True`` consumes the KV
    cache's native [B, Hkv, D, S] layout with no transpose or padding."""
    B, H, T, D = q.shape
    assert T == 1, "flash_decode is the single-query decode kernel"
    S = k.shape[-1] if s_minor else k.shape[-2]
    scale = (D**-0.5) if scale is None else float(scale)
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu" or interpret
    bk = min(block_k, S)
    if not use_pallas or S % bk != 0:
        if s_minor:
            k, v = k.swapaxes(-1, -2), v.swapaxes(-1, -2)
        return flash_decode_ref(q, k, v, lengths, scale)
    rep = H // k.shape[1]
    fn = _decode_pallas_T if s_minor else _decode_pallas
    return fn(
        q, k, v, _lengths_2d(lengths, B).reshape(B), scale, bk, rep,
        interpret=interpret,
    )


def flash_decode_int8_ref(q, kv, lengths, scale=None):
    """Unblocked reference with quantized_sdpa's exact factorization."""
    D = q.shape[-1]
    scale = (D**-0.5) if scale is None else scale
    k_q, v_q, k_s, v_s = kv.k_q, kv.v_q, kv.k_scale, kv.v_scale
    if kv.s_minor:
        k_q, v_q = k_q.swapaxes(-1, -2), v_q.swapaxes(-1, -2)
    if k_q.shape[-3] != q.shape[-3]:
        rep = q.shape[-3] // k_q.shape[-3]
        k_q = jnp.repeat(k_q, rep, axis=-3)
        v_q = jnp.repeat(v_q, rep, axis=-3)
        k_s = jnp.repeat(k_s, rep, axis=-2)
        v_s = jnp.repeat(v_s, rep, axis=-2)
    logits = jnp.einsum(
        "bhld,bhsd->bhls", q.astype(jnp.float32), k_q.astype(jnp.float32)
    ) * (k_s[:, :, None, :] * scale)
    le = _lengths_2d(lengths, q.shape[0])
    mask = jnp.arange(k_q.shape[-2])[None, :] < le
    logits = jnp.where(mask[:, None, None, :], logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bhls,bhsd->bhld", w * v_s[:, :, None, :], v_q.astype(jnp.float32)
    ).astype(q.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_k", "rep", "interpret")
)
def _decode_int8_pallas(
    q, k_q, v_q, k_s, v_s, lengths, scale, block_k, rep, interpret=False
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, _, D = q.shape
    S = k_q.shape[2]
    nk = S // block_k

    def kernel(q_ref, kq_ref, vq_ref, ks_ref, vs_ref, l_ref, o_ref):
        qv = q_ref[0, 0].astype(jnp.float32)  # [1, D]
        # lengths whole in SMEM; scales ride a lanes-last [1, S] layout
        # (a [.., S]-blocked trailing dim is not a legal Mosaic tile)
        le = l_ref[pl.program_id(0)]

        def body(kt, carry):
            m_prev, l_prev, acc = carry
            sl = pl.ds(kt * block_k, block_k)
            kq = kq_ref[0, 0, sl, :].astype(jnp.float32)  # int8 -> f32 in VMEM
            vq = vq_ref[0, 0, sl, :].astype(jnp.float32)
            ks = ks_ref[0, 0, :, sl]  # [1, BK]
            vs = vs_ref[0, 0, :, sl]
            s = jax.lax.dot_general(
                qv, kq, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * (ks * scale)  # per-key scale applied after the matmul
            col = kt * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_k), 1
            )
            s = jnp.where(col < le, s, NEG_INF)
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p * vs, vq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # per-value scale folds into the probabilities
            return m_new, l_new, acc

        m0 = jnp.full((1, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((1, 1), jnp.float32)
        a0 = jnp.zeros((1, D), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, a0))
        o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, 1, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, S, D), lambda b, h: (b, h // rep, 0, 0)),
            pl.BlockSpec((1, 1, S, D), lambda b, h: (b, h // rep, 0, 0)),
            pl.BlockSpec((1, 1, 1, S), lambda b, h: (b, h // rep, 0, 0)),
            pl.BlockSpec((1, 1, 1, S), lambda b, h: (b, h // rep, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, D), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, 1, D), q.dtype),
        interpret=interpret,
    )(q, k_q, v_q, k_s, v_s, lengths)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_k", "rep", "interpret")
)
def _decode_int8_pallas_T(
    q, kT_q, vT_q, k_s, v_s, lengths, scale, block_k, rep, interpret=False
):
    """s_minor int8 variant: payloads arrive [B, Hkv, D, S] (the
    QuantizedKVCache physical layout — int8 tiles are (32, 128), so the
    D-minor form pads head_dim 64 to 128 lanes and doubles the stream).
    Scales stay lanes-last [B, Hkv, 1, S]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, _, D = q.shape
    S = kT_q.shape[-1]
    nk = S // block_k

    def kernel(q_ref, kq_ref, vq_ref, ks_ref, vs_ref, l_ref, o_ref):
        qv = q_ref[0, 0].astype(jnp.float32)  # [1, D]
        le = l_ref[pl.program_id(0)]

        def body(kt, carry):
            m_prev, l_prev, acc = carry
            sl = pl.ds(kt * block_k, block_k)
            kq = kq_ref[0, 0, :, sl].astype(jnp.float32)  # [D, BK]
            vq = vq_ref[0, 0, :, sl].astype(jnp.float32)
            ks = ks_ref[0, 0, :, sl]  # [1, BK]
            vs = vs_ref[0, 0, :, sl]
            s = jax.lax.dot_general(
                qv, kq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * (ks * scale)
            col = kt * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_k), 1
            )
            s = jnp.where(col < le, s, NEG_INF)
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p * vs, vq, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc

        m0 = jnp.full((1, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((1, 1), jnp.float32)
        a0 = jnp.zeros((1, D), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, a0))
        o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, 1, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, D, S), lambda b, h: (b, h // rep, 0, 0)),
            pl.BlockSpec((1, 1, D, S), lambda b, h: (b, h // rep, 0, 0)),
            pl.BlockSpec((1, 1, 1, S), lambda b, h: (b, h // rep, 0, 0)),
            pl.BlockSpec((1, 1, 1, S), lambda b, h: (b, h // rep, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, D), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, 1, D), q.dtype),
        interpret=interpret,
    )(q, kT_q, vT_q, k_s, v_s, lengths)


def flash_decode_int8(
    q: Array,  # [B, H, 1, D]
    kv,  # ops.kv_cache.QuantKV (int8 payloads + per-position scales)
    lengths,  # [B] per-row valid lengths (or a scalar), int32
    scale: Optional[float] = None,
    block_k: int = 128,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> Array:
    """quantized_sdpa's math, blockwise: int8 K/V stream through VMEM and
    dequantize there — no fp32-sized KV convert is ever materialized in
    HBM, at any context length (docs/ROADMAP.md §2).  ``kv.s_minor``
    payloads ([B, Hkv, D, S]) are consumed in their native layout."""
    B, H, T, D = q.shape
    assert T == 1, "flash_decode_int8 is the single-query decode kernel"
    S = kv.k_q.shape[-1] if kv.s_minor else kv.k_q.shape[-2]
    scale = (D**-0.5) if scale is None else float(scale)
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu" or interpret
    bk = min(block_k, S)
    if not use_pallas or S % bk != 0:
        return flash_decode_int8_ref(q, kv, lengths, scale)
    rep = H // kv.k_q.shape[1]
    Hkv = kv.k_q.shape[1]
    fn = _decode_int8_pallas_T if kv.s_minor else _decode_int8_pallas
    return fn(
        q, kv.k_q, kv.v_q,
        kv.k_scale.astype(jnp.float32).reshape(B, Hkv, 1, S),
        kv.v_scale.astype(jnp.float32).reshape(B, Hkv, 1, S),
        _lengths_2d(lengths, B).reshape(B),
        scale, bk, rep, interpret=interpret,
    )
