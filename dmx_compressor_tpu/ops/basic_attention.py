"""Fused BASIC-mode decode attention: the compound SDPA pipeline, inlined.

The compound ScaledDotProductAttention (nn/modules.py, mirroring reference
torch_modules.py:108-191) decomposes into actmatmul -> resadd -> mul ->
softmax -> dropout -> actmatmul, each sub-op carrying its own BASIC casts.
At decode the modular pipeline is ~12-14 kernel chains per layer,
re-casting the whole K/V cache every step — the dominant cost of full
fake-quant decoding (the fp32 baseline pays none of it).

This module provides the T=1 path as ONE tight inline jnp chain.  Decode
attention is a vector-matrix product per head, so a hand-written kernel
has nothing to win over XLA's own fusion on a dispatch-bound chip: the
round-2 Pallas versions measured 172us (merged VPU kernel) and ~290us
(two-kernel split) per call at OPT-125m decode shapes, the modular module
pipeline ~250us, and this inline form 7us (tools/diag_marginal.py).

Numerics: every step replicates the modular pipeline's ops in f32 — BFP
casts are the reference rebase-add (rounding.py), FLOAT16 boundaries use
the f32 emulation of the fp16 fast path, matmuls run bf16 x bf16 -> f32
which is lossless for BFP16-cast operands.  Parity is asserted against the
live compound module in tests/test_basic_attention.py.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..numerics import rounding as R
from .basic_linear import (
    _bfp_cast_with_exponents,
    _fp16_cast_f32,
    cast_blocked_lastdim,
)

Array = jax.Array


class BasicSDPAParams(NamedTuple):
    """Static BASIC-shape parameters extracted from a compound SDPA module."""

    wl: int  # BFP mantissa bits of the actmatmul input casts
    block: int  # BFP block size (must divide head_dim: 64 | 64/128/256)
    input_clamp: float  # softmax wrapper clamp
    max_adjust: float  # surrogate max offset
    kmax: int  # exp shift clamp
    use_exp_large: bool


def _exponent_with_sentinel(amax: Array) -> Array:
    """floor(log2(amax)) with -128 marking bit-level-zero blocks."""
    e = R._exponent_of(amax)
    return jnp.where(R._is_zero(amax), -128.0, e.astype(jnp.float32))


def _poly2exp_inline(x: Array, kmax: int, use_exp_large: bool) -> Array:
    """functional/simd_ops.poly2exp with knorm=0, inlined for Pallas."""
    LN2 = 0.6931471805599453
    INV_LN2 = 1.4426950408889634
    k_raw = jnp.round(x * INV_LN2)
    k = jnp.clip(k_raw, -kmax, kmax if use_exp_large else 0)
    r = jnp.clip(x - k * LN2, -0.5 * LN2, 0.5 * LN2)
    p = 1.0 + r * (1.0 + r * (0.5 + r * (0.16666667 + r * 0.041666668)))
    out = p * jnp.exp2(k)
    return jnp.where(k_raw < -kmax, 0.0, out)


def _group_queries(q: Array, n_kv: int):
    """Reshape [B, H, 1, D] query heads into KV groups [B, Hkv, rows, D]
    with rows >= 8 (zero-padded).  Query head h reads KV head h // rep (the
    HF GQA convention), which is exactly the contiguous grouping this
    reshape produces.  The >= 8 rows keep the QK/WV contractions true
    dot_generals (a T=1 matvec lowers to a layout-flexible multiply-reduce
    fusion, which lets layout assignment give the K/V cache an S-minor
    layout — and an S-minor cache turns every dynamic_update_slice append
    into a strided full-buffer rewrite, ~25us x n_layers per decode step,
    measured).  The padded rows are free on the MXU (its minimum sublane
    tile is 8 anyway).  Returns (grouped, rep, rows)."""
    B, H, T, D = q.shape
    assert T == 1
    rep = H // n_kv
    g = q.reshape(B, n_kv, rep, D)
    rows = max(8, rep)
    if rep == 1:
        g = jnp.broadcast_to(g, (B, n_kv, rows, D))
    elif rep < rows:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, rows - rep), (0, 0)))
    return g, rep, rows


def basic_sdpa_decode(
    q: Array,  # [B, H, 1, D]
    k: Array,  # [B, Hkv, S, D] (Hkv == H for MHA; H % Hkv == 0 for GQA)
    v: Array,  # [B, Hkv, S, D]
    mask_row: Array,  # broadcastable to [1, S], additive float mask
    *,
    scale: float,
    params: BasicSDPAParams,
    interpret: Optional[bool] = None,
) -> Array:
    """Fused BASIC compound-SDPA decode step; returns [B, H, 1, D].

    Tight inline jnp: decode attention is a vector-matrix product per head,
    so there is nothing for the MXU or a hand-written kernel to win — XLA
    fuses this whole chain (both casts, the FLOAT16 boundaries, and the
    SOFTMAX[vsimd] surrogate) into a handful of kernels.  Measured
    7us/call vs 172us for the round-2 Pallas mega-kernel and ~250us for
    the modular module pipeline at OPT-125m decode shapes
    (tools/diag_marginal.py).

    GQA consumes the KV heads directly (query heads grouped per KV head) —
    no jnp.repeat materialization; numerics are per-query-row and
    per-KV-row, so grouping is exact.
    """
    del interpret  # kept for API compatibility; no Pallas path remains
    B, Hkv, S, D = k.shape
    H = q.shape[1]
    assert q.shape == (B, H, 1, D) and H % Hkv == 0
    wl, block = params.wl, params.block
    nb = S // block
    mask_row = jnp.asarray(mask_row, jnp.float32)
    per_row_mask = mask_row.ndim >= 2 and mask_row.shape[0] == B and B > 1
    if per_row_mask:
        # per-row masks (continuous batching: each slot at its own offset)
        mask_row = mask_row.reshape(B, 1, 1, S)
    else:
        mask_row = jnp.broadcast_to(mask_row.reshape(-1)[-S:], (S,))

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    # q cast: BFP blocks along head_dim (one block per row when
    # block == head_dim, e.g. D 64; two when D 128 (Qwen3), four at 256
    # (Gemma)) — exactly the modular actmatmul input cast (block_dim -1)
    qc = cast_blocked_lastdim(qf, block, wl)
    # K cast along head_dim (the multiplier cast of q @ k.T blocks along
    # -2 of k.T == rows of k), same blocking
    kc = cast_blocked_lastdim(kf, block, wl)
    # QK^T: bf16 MXU (exact for <= 8 quantized mantissa bits), f32 accum;
    # query heads grouped per KV head (see _group_queries for the >= 8-row
    # layout rationale)
    qg, rep, rows = _group_queries(qc, Hkv)
    s = jnp.einsum(
        "bgrd,bgsd->bgrs",
        qg.astype(jnp.bfloat16),
        kc.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )[:, :, :rep].reshape(B, H, 1, S)
    s = _fp16_cast_f32(s)  # actmatmul output cast
    bias = _fp16_cast_f32(mask_row)  # resadd(0, mask) w/ fp16 casts
    s = _fp16_cast_f32(s + bias)  # resadd output cast
    s = s * scale  # Mul (casts SAME)
    s = _fp16_cast_f32(s)  # softmax input cast
    # SOFTMAX[vsimd] surrogate (functional/simd_ops.softmax, knorm=0)
    s = jnp.maximum(s, params.input_clamp)
    m = jnp.max(s, axis=-1, keepdims=True) - params.max_adjust
    e = _poly2exp_inline(s - m, params.kmax, params.use_exp_large)
    ssum = jnp.sum(e, axis=-1, keepdims=True)
    r0 = 1.0 / ssum
    r = r0 * (2.0 - ssum * r0)
    w = _fp16_cast_f32(e * r)  # softmax output cast

    # scores cast: blocks along S (the 2nd actmatmul input cast)
    wc = cast_blocked_lastdim(w, block, wl)
    # V cast: blocks along S (the multiplier cast)
    v5 = v.astype(jnp.float32).reshape(B, Hkv, nb, block, D)
    v_amax = jnp.max(jnp.abs(v5), axis=3, keepdims=True)
    vc = _bfp_cast_with_exponents(
        v5, jnp.broadcast_to(_exponent_with_sentinel(v_amax), v5.shape), wl
    ).reshape(B, Hkv, S, D)
    wg, rep, rows = _group_queries(wc.reshape(B, H, 1, S), Hkv)
    out = jnp.einsum(
        "bgrs,bgsd->bgrd",
        wg.astype(jnp.bfloat16),
        vc.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )[:, :, :rep].reshape(B, H, 1, D)
    return _fp16_cast_f32(out)  # actmatmul output cast


def cast_k_rows(k: Array, wl: int, block: Optional[int] = None) -> Array:
    """The BASIC k-cast: BFP blocks of ``block`` along head_dim (one block
    per cache row when ``block`` is None or equals head_dim)."""
    kf = k.astype(jnp.float32)
    if block is not None and block != kf.shape[-1]:
        return cast_blocked_lastdim(kf, block, wl)
    k_amax = jnp.max(jnp.abs(kf), axis=-1, keepdims=True)
    return _bfp_cast_with_exponents(
        kf, jnp.broadcast_to(_exponent_with_sentinel(k_amax), kf.shape), wl
    )


def cast_v_sblocks(v: Array, block: int, wl: int) -> Array:
    """The BASIC v-cast: BFP blocks along the sequence axis."""
    B, H, S, D = v.shape
    v5 = v.astype(jnp.float32).reshape(B, H, S // block, block, D)
    v_amax = jnp.max(jnp.abs(v5), axis=3, keepdims=True)
    return _bfp_cast_with_exponents(
        v5, jnp.broadcast_to(_exponent_with_sentinel(v_amax), v5.shape), wl
    ).reshape(B, H, S, D)


def cast_k_rows_sm(kT: Array, wl: int, block: Optional[int] = None) -> Array:
    """cast_k_rows on a sequence-minor [B, H, D, S] buffer: BFP blocks of
    ``block`` along the D axis (one block per cache position when ``block``
    is None or equals D).  Value-identical to
    ``cast_k_rows(kT.swapaxes(-1, -2), wl, block).swapaxes(-1, -2)``
    without the transpose (the cast is elementwise given the per-block
    amax)."""
    kf = kT.astype(jnp.float32)
    B, H, D, S = kf.shape
    if block is not None and block != D:
        k5 = kf.reshape(B, H, D // block, block, S)
        k_amax = jnp.max(jnp.abs(k5), axis=3, keepdims=True)
        return _bfp_cast_with_exponents(
            k5, jnp.broadcast_to(_exponent_with_sentinel(k_amax), k5.shape), wl
        ).reshape(B, H, D, S)
    k_amax = jnp.max(jnp.abs(kf), axis=-2, keepdims=True)
    return _bfp_cast_with_exponents(
        kf, jnp.broadcast_to(_exponent_with_sentinel(k_amax), kf.shape), wl
    )


def cast_v_sblocks_sm(vT: Array, block: int, wl: int) -> Array:
    """cast_v_sblocks on a sequence-minor [B, H, D, S] buffer: S-blocks are
    now contiguous along the minor axis (the reshape is free, unlike the
    D-minor form's strided regroup)."""
    B, H, D, S = vT.shape
    v5 = vT.astype(jnp.float32).reshape(B, H, D, S // block, block)
    v_amax = jnp.max(jnp.abs(v5), axis=-1, keepdims=True)
    return _bfp_cast_with_exponents(
        v5, jnp.broadcast_to(_exponent_with_sentinel(v_amax), v5.shape), wl
    ).reshape(B, H, D, S)


def basic_sdpa_decode_split(
    q: Array,  # [B, H, 1, D]
    base_k: Array,  # [B, Hkv, S0, D]  ([B, Hkv, D, S0] when s_minor)
    base_v: Array,
    tail_k: Array,  # [B, Hkv, C, D]   ([B, Hkv, D, C] when s_minor)
    tail_v: Array,
    mask_row: Array,  # broadcastable to [1, S0 + C], additive float mask
    *,
    scale: float,
    params: BasicSDPAParams,
    base_k_cast: Optional[Array] = None,  # bf16 precomputed base casts
    base_v_cast: Optional[Array] = None,
    s_minor: bool = False,
) -> Array:
    """BASIC compound-SDPA decode over a split KV cache (ops/kv_cache.py
    SplitKVCache) without concatenating the segments.

    Numerics == :func:`basic_sdpa_decode` over the concatenated cache: the
    per-row k-cast is segment-local by construction, and the S-blocked
    score/V casts stay segment-local because S0 and C are multiples of the
    block size (blocks never straddle the boundary).  Only the final WV
    accumulation order differs (two partial f32 sums), the same
    reassociation class as a K-tiled matmul.  GQA as in
    :func:`basic_sdpa_decode` (query heads grouped per KV head).

    ``s_minor=True`` consumes [B, Hkv, D, S]-layout segments (and base
    casts) in place — the SplitKVCache physical layout, which tiles
    head_dim 64 without lane padding (see ops/kv_cache.KVCache).
    """
    if s_minor:
        B, Hkv, D, S0 = base_k.shape
        C = tail_k.shape[-1]
    else:
        B, Hkv, S0, D = base_k.shape
        C = tail_k.shape[2]
    H = q.shape[1]
    wl, block = params.wl, params.block
    assert S0 % block == 0 and C % block == 0, (S0, C, block)
    mask_row = jnp.asarray(mask_row, jnp.float32).reshape(-1)[-(S0 + C):]

    qf = q.astype(jnp.float32)
    qc = cast_blocked_lastdim(qf, block, wl)  # BFP blocks along head_dim
    qg, rep, rows = _group_queries(qc, Hkv)
    qg = qg.astype(jnp.bfloat16)

    def seg_scores(k_seg, precast):
        if s_minor:
            kc = precast if precast is not None else cast_k_rows_sm(
                k_seg, wl, block
            ).astype(jnp.bfloat16)
            S_seg = k_seg.shape[-1]
            return jnp.einsum(
                "bgrd,bgds->bgrs", qg, kc,
                preferred_element_type=jnp.float32,
            )[:, :, :rep].reshape(B, H, 1, S_seg)
        kc = precast if precast is not None else cast_k_rows(
            k_seg, wl, block
        ).astype(jnp.bfloat16)
        S_seg = k_seg.shape[2]
        return jnp.einsum(
            "bgrd,bgsd->bgrs", qg, kc,
            preferred_element_type=jnp.float32,
        )[:, :, :rep].reshape(B, H, 1, S_seg)

    s = jnp.concatenate(
        [seg_scores(base_k, base_k_cast), seg_scores(tail_k, None)], axis=-1
    )
    s = _fp16_cast_f32(s)  # actmatmul output cast
    bias = _fp16_cast_f32(mask_row)
    s = _fp16_cast_f32(s + bias)  # resadd output cast
    s = s * scale
    s = _fp16_cast_f32(s)  # softmax input cast
    s = jnp.maximum(s, params.input_clamp)
    m = jnp.max(s, axis=-1, keepdims=True) - params.max_adjust
    e = _poly2exp_inline(s - m, params.kmax, params.use_exp_large)
    ssum = jnp.sum(e, axis=-1, keepdims=True)
    r0 = 1.0 / ssum
    r = r0 * (2.0 - ssum * r0)
    w = _fp16_cast_f32(e * r)  # softmax output cast

    wc = cast_blocked_lastdim(w, block, wl)

    def seg_out(w_seg, v_seg, precast):
        S_seg = w_seg.shape[-1]
        wg, _, _ = _group_queries(w_seg.reshape(B, H, 1, S_seg), Hkv)
        if s_minor:
            vc = precast if precast is not None else cast_v_sblocks_sm(
                v_seg, block, wl
            ).astype(jnp.bfloat16)
            return jnp.einsum(
                "bgrs,bgds->bgrd",
                wg.astype(jnp.bfloat16),
                vc,
                preferred_element_type=jnp.float32,
            )[:, :, :rep].reshape(B, H, 1, D)
        vc = precast if precast is not None else cast_v_sblocks(
            v_seg, block, wl
        ).astype(jnp.bfloat16)
        return jnp.einsum(
            "bgrs,bgsd->bgrd",
            wg.astype(jnp.bfloat16),
            vc,
            preferred_element_type=jnp.float32,
        )[:, :, :rep].reshape(B, H, 1, D)

    out = seg_out(wc[..., :S0], base_v, base_v_cast) + seg_out(
        wc[..., S0:], tail_v, None
    )
    return _fp16_cast_f32(out)  # actmatmul output cast


def basic_sdpa_shape(sdpa, head_dim: int, seq_len: int) -> Optional[BasicSDPAParams]:
    """Return the fused-kernel params when the compound SDPA module is in the
    exact BASIC decode shape this kernel reproduces; None -> modular path.

    Checked surface (reference BASIC rule set, __init__.py config_rules):
    actmatmul in BFP sym-nearest (blocks along head_dim for the first
    matmul's operands — block must divide head_dim: one block per row at
    D 64, two at 128 (Qwen3), four at 256 (Gemma); seq blocks for the
    second) / out FLOAT16; resadd/softmax io FLOAT16; mul SAME; dropout
    off; SOFTMAX[vsimd] surrogate in inference mode; sdpa-level casts SAME.
    """
    from ..functional.approximate import NoApproximation
    from ..nn.core import DmxModule
    from ..numerics.format import BlockFloatingPoint, FloatingPoint, Same

    if not DmxModule.inference_mode or DmxModule.plugins:
        return None

    def is_fp16(f):
        return isinstance(f, FloatingPoint) and repr(f) == "FP[1|5|10,15](FN)"

    def cast_ok(c, want):
        if c.observer_enabled or c.pre_transform or not c.fake_quant_enabled:
            return False
        if want == "same":
            return isinstance(c.format, Same)
        if want == "fp16":
            return is_fp16(c.format)
        if want == "bfp":
            f = c.format
            return (
                isinstance(f, BlockFloatingPoint)
                and f.symmetric
                and f.rounding == "nearest"
            )
        return False

    try:
        for name in sdpa.input_cast_names:
            if not cast_ok(sdpa.input_casts[name], "same"):
                return None
        if not isinstance(sdpa.approximator.function, NoApproximation):
            return None
        am = sdpa.actmatmul
        ic, mc = am.input_casts["input_cast"], am.input_casts["multiplier_cast"]
        oc = am.output_casts["output_cast"]
        if not (cast_ok(ic, "bfp") and cast_ok(mc, "bfp") and cast_ok(oc, "fp16")):
            return None
        if not (
            ic.format == mc.format
            and ic.block_dim == -1
            and mc.block_dim == -2
            and head_dim % ic.format.block_size == 0
            and seq_len % ic.format.block_size == 0
            and isinstance(am.approximator.function, NoApproximation)
        ):
            return None
        if am.accum_cast is not None and not isinstance(am.accum_cast.format, Same):
            return None
        ra = sdpa.resadd
        if not (
            cast_ok(ra.input_casts["input_cast"], "fp16")
            and cast_ok(ra.input_casts["residual_cast"], "fp16")
            and cast_ok(ra.output_casts["output_cast"], "fp16")
        ):
            return None
        mu = sdpa.mul
        for c in [mu.input_casts[n] for n in mu.input_cast_names] + [
            mu.output_casts["output_cast"]
        ]:
            if not cast_ok(c, "same"):
                return None
        sm = sdpa.softmax
        if not (
            cast_ok(sm.input_casts["input_cast"], "fp16")
            and cast_ok(sm.output_casts["output_cast"], "fp16")
            and sm.dim in (-1, 3)
        ):
            return None
        fn = sm.approximator.function
        if isinstance(fn, NoApproximation) or getattr(fn, "func_name", None) != "softmax":
            return None
        wp = dict(fn.wrapper_params)
        ep = dict(fn.extra_params)
        if wp.keys() - {"input_clamp"} or ep.keys() - {
            "max_adjust", "knorm", "kmax", "use_exp_large"
        }:
            return None
        if int(ep.get("knorm", 0)) != 0:
            return None
        dp = sdpa.dropout
        if dp.p != 0.0 and not dp.deterministic:
            return None
        for c in [dp.input_casts[n] for n in dp.input_cast_names] + [
            dp.output_casts["output_cast"]
        ]:
            if not cast_ok(c, "same"):
                return None
        return BasicSDPAParams(
            wl=ic.format.precision,
            block=ic.format.block_size,
            input_clamp=float(wp.get("input_clamp", -jnp.inf)),
            max_adjust=float(ep.get("max_adjust", 0.0)),
            kmax=int(ep.get("kmax", 15)),
            use_exp_large=bool(ep.get("use_exp_large", True)),
        )
    except (KeyError, AttributeError):
        return None
