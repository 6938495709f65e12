"""Decode-regime fused layer steps for BASIC mode: norm/resadd/activation
chains folded into the quantized linear chains.

Round-1 profiling (tools/diag_basic_scan.py) showed full fake-quant BASIC
decode is dispatch-bound and that the *non-linear* modules — LayerNorm
(FLOAT16 casts + LAYER_NORM[vsimd] surrogate), ResAdd FLOAT16 chains, ReLU
casts — cost more than all the quantized matmuls together at decode
shapes, because the generic module pipeline (observer branches, generic
blocking with pads/transposes per cast) defeats XLA fusion.  This module
provides tight inline equivalents — pure jnp that XLA fuses into a handful
of kernels per layer (measured faster than hand-written Pallas mega-kernels
on the dispatch-bound target chip; see ops/basic_linear.py) — plus the
static shape checks that prove an OPT-style decoder layer is in the exact
BASIC decode configuration they replicate.  One fused layer step:

  LN1 surrogate + input BFP cast + merged-qkv matmul  (fused_ln_linear)
  fused BASIC SDPA                                    (ops/basic_attention)
  out_proj                                            (fused_basic_linear)
  resadd1 + LN2 surrogate + cast + fc1 + ReLU         (fused_ln_linear,
                                                       emits next residual)
  fc2 + bias + resadd2 epilogue                       (fused_basic_linear
                                                       with ``res_out``)

Numerics contract: every folded op replicates the modular DmxModule
pipeline op-for-op in f32 — FLOAT16 boundaries via the f32 emulation of the
fp16 grid, the LAYER_NORM[vsimd] surrogate exactly as
functional/simd_ops.layer_norm (tile_size=None, incl. the Newton-refined
rsqrt), ReLU folded *after* the fc1 output cast (max(·,0) of fp16-grid
values stays on the grid, so the ReLU module's own FLOAT16 casts are
value-identity).  Parity is asserted against the modular path in
tests/test_basic_layer.py.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .basic_linear import _fp16_cast_f32, fused_basic_linear
from .bfp_pack import PackedBFP

Array = jax.Array


def layer_norm_surrogate_fp16(x: Array, ln_w: Array, ln_b: Array,
                              eps: float, on_grid: bool = False) -> Array:
    """FLOAT16 input cast + LAYER_NORM[vsimd] surrogate
    (functional/simd_ops.layer_norm, tile_size=None, incl. the
    Newton-refined rsqrt) + FLOAT16 output cast, inline.  ``on_grid``
    skips the input cast when the producer provably emitted fp16-grid
    values (a FLOAT16 output cast) — bit-identical, the cast is an
    identity there (r5: each skipped cast saves ~15 elementwise ops and a
    fusion boundary on the dispatch-bound decode path)."""
    x16 = x.astype(jnp.float32)
    if not on_grid:
        x16 = _fp16_cast_f32(x16)
    mean = jnp.mean(x16, axis=-1, keepdims=True)
    d = x16 - mean
    var = jnp.mean(jnp.square(d), axis=-1, keepdims=True)
    r0 = jax.lax.rsqrt(var + eps)
    rr = r0 * (1.5 - 0.5 * (var + eps) * r0 * r0)  # one Newton step
    y = d * rr * ln_w.astype(jnp.float32) + ln_b.astype(jnp.float32)
    return _fp16_cast_f32(y)


def resadd_fp16(a: Array, b: Array, a_on_grid: bool = False,
                b_on_grid: bool = False) -> Array:
    """ResAdd under the BASIC rule set: FLOAT16 casts on both inputs, add,
    FLOAT16 output cast (reference torch_modules.py:15-64).  The
    ``*_on_grid`` flags skip input casts that are identities (producer
    already emitted fp16-grid values)."""
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    if not a_on_grid:
        af = _fp16_cast_f32(af)
    if not b_on_grid:
        bf = _fp16_cast_f32(bf)
    return _fp16_cast_f32(af + bf)


def fused_ln_linear(
    x: Array,
    *,
    packed: Optional[PackedBFP] = None,
    w_bf16: Optional[Array] = None,
    bias: Array,
    ln_w: Array,
    ln_b: Array,
    eps: float,
    wl: int,
    in_block: int,
    residual: Optional[Array] = None,
    relu: bool = False,
    emit_pre: bool = False,
    interpret: Optional[bool] = None,
    input_on_grid: bool = False,
    residual_on_grid: bool = False,
):
    """[resadd ->] LN-surrogate -> BFP cast -> dequant matmul -> bias ->
    FLOAT16 [-> ReLU], tight inline jnp (XLA fuses the whole chain into a
    few kernels; measured faster than a hand-written Pallas mega-kernel on
    the dispatch-bound target chip — see ops/basic_linear.py docstring).
    With ``emit_pre`` also returns the resadd output (the next residual).
    ``relu`` folds max(.,0) after the output cast — bit-exact, because the
    ReLU module's own FLOAT16 casts are value-identity on fp16-grid inputs.
    """
    h = x
    on_grid = input_on_grid
    if residual is not None:
        h = resadd_fp16(h, residual, a_on_grid=input_on_grid,
                        b_on_grid=residual_on_grid)
        on_grid = True  # resadd's FLOAT16 output cast just ran
    pre = h
    h = layer_norm_surrogate_fp16(h, ln_w, ln_b, eps, on_grid=on_grid)
    y = fused_basic_linear(
        h,
        w_bf16=w_bf16,
        packed=packed,
        bias=bias,
        in_wl=wl,
        in_block=in_block,
        out_fp16=True,
        interpret=interpret,
    )
    if relu:
        y = jnp.maximum(y, 0.0)
    if emit_pre:
        return y, pre.astype(x.dtype)
    return y

def rms_norm_surrogate_fp16(x: Array, w: Array, eps: float,
                            on_grid: bool = False) -> Array:
    """FLOAT16 input cast + RMS_NORM[vsimd] surrogate
    (functional/simd_ops.rms_norm, tile_size=None, incl. the Newton-refined
    rsqrt) + FLOAT16 output cast, inline.  ``on_grid`` as in
    :func:`layer_norm_surrogate_fp16`."""
    x16 = x.astype(jnp.float32)
    if not on_grid:
        x16 = _fp16_cast_f32(x16)
    ms = jnp.mean(jnp.square(x16), axis=-1, keepdims=True)
    r0 = jax.lax.rsqrt(ms + eps)
    rr = r0 * (1.5 - 0.5 * (ms + eps) * r0 * r0)
    y = x16 * rr * w.astype(jnp.float32)
    return _fp16_cast_f32(y)


def _poly2exp_fp32(x: Array, kmax: int = 15) -> Array:
    """functional/simd_ops.poly2exp with knorm=0, inline f32."""
    LN2 = 0.6931471805599453
    INV_LN2 = 1.4426950408889634
    k_raw = jnp.round(x * INV_LN2)
    k = jnp.clip(k_raw, -kmax, kmax)
    r = jnp.clip(x - k * LN2, -0.5 * LN2, 0.5 * LN2)
    p = 1.0 + r * (1.0 + r * (0.5 + r * (0.16666667 + r * 0.041666668)))
    return jnp.where(k_raw < -kmax, 0.0, p * jnp.exp2(k))


def silu_surrogate_fp16(x: Array, kmax: int = 15,
                        on_grid: bool = False) -> Array:
    """FLOAT16 input cast + SILU[vsimd] surrogate (x * sigmoid(x) with the
    poly2 exponential, functional/simd_ops.silu) + FLOAT16 output cast."""
    x16 = x.astype(jnp.float32)
    if not on_grid:
        x16 = _fp16_cast_f32(x16)
    e = _poly2exp_fp32(-jnp.abs(x16), kmax)
    pos = 1.0 / (1.0 + e)
    sig = jnp.where(x16 >= 0, pos, 1.0 - pos)
    return _fp16_cast_f32(x16 * sig)


def gelu_tanh_fp16(x: Array, on_grid: bool = False) -> Array:
    """FLOAT16 input cast + exact tanh-GELU + FLOAT16 output cast: the BASIC
    rule set leaves GELUBase at approximation NONE (__init__.py
    default_approx.GELU), so the module computes the raw function between
    its FLOAT16 io casts (Gemma's ``gelu_pytorch_tanh`` MLP)."""
    x16 = x.astype(jnp.float32)
    if not on_grid:
        x16 = _fp16_cast_f32(x16)
    return _fp16_cast_f32(jax.nn.gelu(x16, approximate=True))


def rope_surrogate_fp16(q: Array, k: Array, cos: Array, sin: Array,
                        qk_on_grid: bool = False):
    """ApplyRotaryPosEmb under the BASIC rule set: FLOAT16 casts on all four
    inputs, the APPLY_LLAMA_ROPE[vsimd] surrogate (rotate-half in fp32,
    functional/simd_ops.apply_rotary_pos_emb, unsqueeze_dim=1), FLOAT16
    casts on both outputs."""
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    if not qk_on_grid:
        qf = _fp16_cast_f32(qf)
        kf = _fp16_cast_f32(kf)
    cos_e = jnp.expand_dims(_fp16_cast_f32(cos.astype(jnp.float32)), 1)
    sin_e = jnp.expand_dims(_fp16_cast_f32(sin.astype(jnp.float32)), 1)

    def rotate_half(x):
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate([-x2, x1], axis=-1)

    q_out = _fp16_cast_f32(qf * cos_e + rotate_half(qf) * sin_e)
    k_out = _fp16_cast_f32(kf * cos_e + rotate_half(kf) * sin_e)
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


def fused_rms_linear(
    x: Array,
    *,
    packed: Optional[PackedBFP] = None,
    w_bf16: Optional[Array] = None,
    bias: Optional[Array] = None,
    rms_w: Array,
    eps: float,
    wl: int,
    in_block: int,
    residual: Optional[Array] = None,
    emit_pre: bool = False,
    interpret: Optional[bool] = None,
    input_on_grid: bool = False,
    residual_on_grid: bool = False,
):
    """[resadd ->] RMS-surrogate -> BFP cast -> dequant matmul [-> bias]
    -> FLOAT16 — the RMSNorm-family analogue of :func:`fused_ln_linear`
    (Llama/Mistral/Gemma/Qwen3 layer chains).  With ``emit_pre`` also
    returns the resadd output (the next residual)."""
    h = x
    on_grid = input_on_grid
    if residual is not None:
        h = resadd_fp16(h, residual, a_on_grid=input_on_grid,
                        b_on_grid=residual_on_grid)
        on_grid = True  # resadd's FLOAT16 output cast just ran
    pre = h
    h = rms_norm_surrogate_fp16(h, rms_w, eps, on_grid=on_grid)
    y = fused_basic_linear(
        h,
        w_bf16=w_bf16,
        packed=packed,
        bias=bias,
        in_wl=wl,
        in_block=in_block,
        out_fp16=True,
        interpret=interpret,
    )
    if emit_pre:
        return y, pre.astype(x.dtype)
    return y

def fused_llama_family_step(layer, x, cos, sin, attn_mask, cache, plan,
                            plain_causal: bool = True):
    """One fused BASIC decode step for a Llama-topology decoder layer
    (Llama / TinyLlama / Mistral / Gemma / Qwen3), driven by the family
    deltas in ``plan``: RMS1+qkv / [q-k per-head RMS (Qwen3)] / RoPE
    surrogate / fused SDPA (split-cache, GQA) / o_proj /
    resadd1+RMS2+gate-up / act*up / down_proj+resadd2 — numerics-identical
    to the modular module pipeline (bounded only by f32 reduction order in
    the RMS moments).

    The attention mask is applied ADDITIVELY throughout the fused SDPA
    chain (ops/basic_attention.py), so banded sliding-window masks
    (Mistral, windowed Qwen3) fuse exactly like plain causal ones;
    ``plain_causal`` only steers the flash-decode routing inside
    cached_attend, which BASIC's non-transparent SDPA never takes.

    Norm weights: Gemma's (1+w) folds here exactly as the module's
    approximator_wrapper does (cast w via hypernet, then 1 + w)."""
    from .basic_linear import fused_basic_linear
    from .flash_decode import cached_attend

    def w_kw(m):
        if m.weight_bf16 is not None:
            return {"w_bf16": m.weight_bf16.value}
        return {"packed": m.packed}

    def norm_w(ln):
        w = ln._weight
        return 1.0 + w.astype(jnp.float32) if plan.gemma_norm else w

    B, T, D = x.shape
    attn = layer.self_attn
    merged = attn.qkv_merged
    qkv = fused_rms_linear(
        x,
        **w_kw(merged),
        bias=merged.bias.value if merged.bias is not None else None,
        rms_w=norm_w(layer.input_layernorm),
        eps=plan.ln1_eps,
        wl=plan.wl,
        in_block=plan.block,
    )
    d = attn.num_heads * attn.head_dim
    kv = attn.num_kv_heads * attn.head_dim
    q = attn._split(qkv[..., :d], attn.num_heads)
    k = attn._split(qkv[..., d : d + kv], attn.num_kv_heads)
    v = attn._split(qkv[..., d + kv :], attn.num_kv_heads)
    if plan.qk_norm_eps is not None:
        # Qwen3 per-head q/k RMSNorm pre-RoPE (over head_dim, elementwise
        # across heads/positions: layout-independent).  q/k arrive on the
        # fp16 grid (qkv's FLOAT16 output cast), so the input casts are
        # identities and skipped; same for RoPE's q/k inputs below.
        q = rms_norm_surrogate_fp16(q, attn.q_norm._weight,
                                    plan.qk_norm_eps, on_grid=True)
        k = rms_norm_surrogate_fp16(k, attn.k_norm._weight,
                                    plan.qk_norm_eps, on_grid=True)
    q, k = rope_surrogate_fp16(q, k, cos, sin, qk_on_grid=True)
    gqa = attn.num_kv_heads != attn.num_heads
    ctx = cached_attend(attn.sdpa, q, k, v, cache, attn_mask, enable_gqa=gqa,
                        plain_causal=plain_causal)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, d)
    y = attn.o_proj(ctx)  # PackedBFPLinear: one fused kernel
    mlp = layer.mlp
    gateup = mlp.gateup_merged
    gu, r = fused_rms_linear(
        y,
        **w_kw(gateup),
        bias=gateup.bias.value if gateup.bias is not None else None,
        rms_w=norm_w(layer.post_attention_layernorm),
        eps=plan.ln2_eps,
        wl=plan.wl,
        in_block=plan.block,
        residual=x,
        emit_pre=True,
        input_on_grid=True,  # y: o_proj's FLOAT16 output cast
    )
    m = mlp.intermediate_size
    gate = (
        silu_surrogate_fp16(gu[..., :m], on_grid=True)
        if plan.act == "silu"
        else gelu_tanh_fp16(gu[..., :m], on_grid=True)
    )
    prod = gate * gu[..., m:]  # Mul: SAME
    down = mlp.down_proj
    return fused_basic_linear(
        prod,
        w_bf16=down.weight_bf16.value if down.weight_bf16 is not None else None,
        packed=None if down.weight_bf16 is not None else down.packed,
        bias=down.bias.value if down.bias is not None else None,
        in_wl=plan.wl,
        in_block=plan.block,
        out_fp16=True,
        res_out=r,
        res_on_grid=True,  # r: resadd's FLOAT16 output cast
    )


# ---------------------------------------------------------------------------
# static shape detection
# ---------------------------------------------------------------------------


class BasicLayerPlan(NamedTuple):
    """Static parameters proving an OPT decoder layer is in the exact BASIC
    decode shape the mega-kernels reproduce."""

    wl: int
    block: int
    ln1_eps: float
    ln2_eps: float


def _linear_basic_ok(m, require_bias: bool = True) -> bool:
    """The PackedBFPLinear's pipeline folds into a fused kernel: BASIC casts,
    no active stateful subsystem (mirrors PackedBFPLinear._fusable's static
    surface)."""
    from ..numerics.format import BlockFloatingPoint as BFP
    from ..numerics.format import FloatingPoint
    from .compress import PackedBFPLinear

    if not isinstance(m, PackedBFPLinear):
        return False
    ic = m.input_casts["input_cast"]
    oc = m.output_casts[m.output_cast_names[0]]
    fmt = ic.format
    if not (
        isinstance(fmt, BFP)
        and fmt.symmetric
        and fmt.rounding == "nearest"
        and fmt.block_size > 1
        and ic.block_dim in (-1, 1)
        and m.in_features % fmt.block_size == 0
        and ic.fake_quant_enabled
        and not ic.observer_enabled
        and not ic.pre_transform
    ):
        return False
    if not (
        isinstance(oc.format, FloatingPoint)
        and repr(oc.format) == "FP[1|5|10,15](FN)"
        and oc.fake_quant_enabled
        and not oc.observer_enabled
        and not oc.pre_transform
    ):
        return False
    if m.smoothquant is not None and (
        m.smoothquant.dynamic or m.smoothquant.calibrating
        or m.smoothquant.input_maxabs_exists
    ):
        return False
    return m.obc is None and m.aft is None and (m.bias is not None or not require_bias)


def _fp16_io_ok(m, approx_name: Optional[str]) -> bool:
    """Module has pure FLOAT16 io casts and the expected approximation."""
    from ..functional.approximate import NoApproximation
    from ..numerics.format import FloatingPoint

    def ok(c):
        return (
            isinstance(c.format, FloatingPoint)
            and repr(c.format) == "FP[1|5|10,15](FN)"
            and c.fake_quant_enabled
            and not c.observer_enabled
            and not c.pre_transform
        )

    for name in m.input_cast_names:
        if not ok(m.input_casts[name]):
            return False
    for name in m.output_cast_names:
        if not ok(m.output_casts[name]):
            return False
    fn = m.approximator.function
    if approx_name is None:
        return isinstance(fn, NoApproximation)
    if isinstance(fn, NoApproximation):
        return False
    return (
        getattr(fn, "func_name", None) == approx_name
        and not dict(fn.wrapper_params)
        and not dict(fn.extra_params)
    )


class BasicHeadPlan(NamedTuple):
    wl: int
    block: int
    ln_eps: float


def basic_head_plan(final_ln, lm_head) -> Optional[BasicHeadPlan]:
    """Plan for fusing the decoder's final LayerNorm into the LM head kernel
    (same checks as the layer plan; lm_head may be bias-free)."""
    from ..nn import modules as dmxnn
    from ..nn.core import DmxModule

    if not DmxModule.inference_mode or DmxModule.plugins:
        return None
    try:
        if final_ln is None or not isinstance(final_ln, dmxnn.LayerNorm):
            return None
        if not _fp16_io_ok(final_ln, "layer_norm"):
            return None
        if final_ln.weight is None or final_ln.bias is None:
            return None
        from .compress import PackedBFPLinear

        if not isinstance(lm_head, PackedBFPLinear):
            return None
        if not _linear_basic_ok(lm_head, require_bias=False):
            return None
        ic = lm_head.input_casts["input_cast"]
        return BasicHeadPlan(
            wl=ic.format.precision,
            block=ic.format.block_size,
            ln_eps=float(final_ln.eps),
        )
    except (KeyError, AttributeError):
        return None


def fused_rms_head(h, final_norm, lm_head, plan, *, gemma_norm: bool = False):
    """Final-(Gemma)RMSNorm + LM-head as one fused chain (decode tail of
    the Llama-topology families), numerics-identical to the modular
    ``lm_head(norm(h))``.  Gemma's (1+w) folds exactly as the module's
    approximator_wrapper does."""
    w = final_norm._weight
    rms_w = 1.0 + w.astype(jnp.float32) if gemma_norm else w
    return fused_rms_linear(
        h,
        w_bf16=lm_head.weight_bf16.value
        if lm_head.weight_bf16 is not None else None,
        packed=None if lm_head.weight_bf16 is not None else lm_head.packed,
        bias=lm_head.bias.value if lm_head.bias is not None else None,
        rms_w=rms_w,
        eps=plan.ln_eps,
        wl=plan.wl,
        in_block=plan.block,
        # h is the decoder's final residual: both the fused and the
        # modular layer paths end in a FLOAT16 resadd output cast
        input_on_grid=True,
    )


def basic_rms_head_plan(
    final_norm, lm_head, *, gemma_norm: bool = False
) -> Optional[BasicHeadPlan]:
    """RMSNorm-family analogue of :func:`basic_head_plan`: fuse the
    decoder's final (Gemma)RMSNorm into the LM-head kernel
    (fused_rms_linear).  Exact type match on the norm so the (1+w) variant
    never crosses with the plain one."""
    from ..nn import modules as dmxnn
    from ..nn.core import DmxModule

    if not DmxModule.inference_mode or DmxModule.plugins:
        return None
    norm_t = dmxnn.GemmaRMSNorm if gemma_norm else dmxnn.RMSNorm
    try:
        if final_norm is None or type(final_norm) is not norm_t:
            return None
        if not _fp16_io_ok(final_norm, "rms_norm"):
            return None
        if final_norm.weight is None:
            return None
        from .compress import PackedBFPLinear

        if not isinstance(lm_head, PackedBFPLinear):
            return None
        if not _linear_basic_ok(lm_head, require_bias=False):
            return None
        ic = lm_head.input_casts["input_cast"]
        return BasicHeadPlan(
            wl=ic.format.precision,
            block=ic.format.block_size,
            ln_eps=float(final_norm.eps),
        )
    except (KeyError, AttributeError):
        return None


class BasicLlamaPlan(NamedTuple):
    """Static parameters proving a Llama-family decoder layer is in the
    exact BASIC decode shape the fused step reproduces.  The family deltas
    ride along as plan fields: Gemma flips ``gemma_norm`` ((1+w) RMSNorm)
    and ``act`` ("gelu_tanh": BASIC leaves GELUBase at approximation NONE);
    Qwen3 sets ``qk_norm_eps`` (per-head q/k RMSNorm pre-RoPE)."""

    wl: int
    block: int
    ln1_eps: float
    ln2_eps: float
    gemma_norm: bool = False
    act: str = "silu"
    qk_norm_eps: Optional[float] = None


def _casts_same_ok(m) -> bool:
    """All io casts SAME, no approximation (modules the BASIC rule set does
    not configure, e.g. Mul)."""
    from ..functional.approximate import NoApproximation
    from ..numerics.format import Same

    for name in m.input_cast_names:
        if not isinstance(m.input_casts[name].format, Same):
            return False
    for name in m.output_cast_names:
        if not isinstance(m.output_casts[name].format, Same):
            return False
    return isinstance(m.approximator.function, NoApproximation)


def _llama_family_plan(
    layer, *, gemma_norm: bool = False, act: str = "silu",
    qk_norm: bool = False,
) -> Optional[BasicLlamaPlan]:
    """Shared plan checker for the Llama-topology families.  Checked
    surface mirrors :func:`basic_layer_plan` plus the family modules:
    RMSNorms with the RMS_NORM[vsimd] surrogate (GemmaRMSNorm when
    ``gemma_norm`` — the (1+w) variant, exact type match so the two never
    cross), the gate activation (SiLU with SILU[vsimd], or tanh-GELU left
    at approximation NONE by the BASIC rule set), Mul left SAME, RoPE with
    APPLY_LLAMA_ROPE[vsimd] and FLOAT16 io on all four inputs, and for
    Qwen3 the per-head q/k RMSNorms pre-RoPE."""
    from ..nn import modules as dmxnn
    from ..nn.core import DmxModule

    if not DmxModule.inference_mode or DmxModule.plugins:
        return None
    attn = getattr(layer, "self_attn", None)
    mlp = getattr(layer, "mlp", None)
    norm_t = dmxnn.GemmaRMSNorm if gemma_norm else dmxnn.RMSNorm
    try:
        merged = getattr(attn, "qkv_merged", None)
        gateup = getattr(mlp, "gateup_merged", None)
        if merged is None or not _linear_basic_ok(merged, require_bias=False):
            return None
        if gateup is None or not _linear_basic_ok(gateup, require_bias=False):
            return None
        if not _linear_basic_ok(attn.o_proj, require_bias=False):
            return None
        if not _linear_basic_ok(mlp.down_proj, require_bias=False):
            return None
        ln1, ln2 = layer.input_layernorm, layer.post_attention_layernorm
        for ln in (ln1, ln2):
            if type(ln) is not norm_t or not _fp16_io_ok(ln, "rms_norm"):
                return None
            if ln.weight is None:
                return None
        for ra in (layer.resadd1, layer.resadd2):
            if not isinstance(ra, dmxnn.ResAdd) or not _fp16_io_ok(ra, None):
                return None
        if act == "silu":
            if not isinstance(mlp.act_fn, dmxnn.SiLU) or not _fp16_io_ok(
                mlp.act_fn, "silu"
            ):
                return None
        elif act == "gelu_tanh":
            if (
                not isinstance(mlp.act_fn, dmxnn.GELUBase)
                or mlp.act_fn.approximate != "tanh"
                or not _fp16_io_ok(mlp.act_fn, None)
            ):
                return None
        else:
            return None
        if not isinstance(mlp.mul, dmxnn.Mul) or not _casts_same_ok(mlp.mul):
            return None
        rope = attn.apply_rope
        if not isinstance(rope, dmxnn.ApplyRotaryPosEmb) or not _fp16_io_ok(
            rope, "apply_rotary_pos_emb"
        ):
            return None
        qk_eps = None
        if qk_norm:
            qn, kn = attn.q_norm, attn.k_norm
            for n in (qn, kn):
                if type(n) is not dmxnn.RMSNorm or not _fp16_io_ok(
                    n, "rms_norm"
                ):
                    return None
                if n.weight is None:
                    return None
            if float(qn.eps) != float(kn.eps):
                return None
            qk_eps = float(qn.eps)
        ic = merged.input_casts["input_cast"]
        if (
            gateup.input_casts["input_cast"].format != ic.format
            or mlp.down_proj.input_casts["input_cast"].format != ic.format
            or attn.o_proj.input_casts["input_cast"].format != ic.format
        ):
            return None
        return BasicLlamaPlan(
            wl=ic.format.precision,
            block=ic.format.block_size,
            ln1_eps=float(ln1.eps),
            ln2_eps=float(ln2.eps),
            gemma_norm=gemma_norm,
            act=act,
            qk_norm_eps=qk_eps,
        )
    except (KeyError, AttributeError):
        return None


def basic_llama_layer_plan(layer) -> Optional[BasicLlamaPlan]:
    """Return the fused-step plan when a LlamaDecoderLayer-shaped module
    (post compress_for_inference: merged qkv + merged gate/up) is in BASIC
    decode shape; None -> modular path."""
    return _llama_family_plan(layer)


def basic_gemma_layer_plan(layer) -> Optional[BasicLlamaPlan]:
    """Gemma variant: (1+w) GemmaRMSNorms, tanh-GELU gate activation
    (left at approximation NONE by the BASIC rule set)."""
    return _llama_family_plan(layer, gemma_norm=True, act="gelu_tanh")


def basic_qwen3_layer_plan(layer) -> Optional[BasicLlamaPlan]:
    """Qwen3 variant: Llama layer chain + per-head q/k RMSNorms pre-RoPE."""
    return _llama_family_plan(layer, qk_norm=True)


def basic_gpt2_block_plan(block) -> Optional[BasicLayerPlan]:
    """Return the fused-step plan when a GPT2Block (post
    compress_for_inference) is in BASIC decode shape; None -> modular path.
    GPT-2's c_attn is born merged (one 3d projection), so only the cast
    surface needs proving: LayerNorms with the LAYER_NORM[vsimd] surrogate,
    tanh-GELU left at approximation NONE by the BASIC rule set, biased
    PackedBFPLinears with one shared input format."""
    from ..nn import modules as dmxnn
    from ..nn.core import DmxModule

    if not DmxModule.inference_mode or DmxModule.plugins:
        return None
    attn = getattr(block, "attn", None)
    mlp = getattr(block, "mlp", None)
    try:
        if not _linear_basic_ok(attn.c_attn) or not _linear_basic_ok(attn.c_proj):
            return None
        if not _linear_basic_ok(mlp.c_fc) or not _linear_basic_ok(mlp.c_proj):
            return None
        ln1, ln2 = block.ln_1, block.ln_2
        for ln in (ln1, ln2):
            if not isinstance(ln, dmxnn.LayerNorm) or not _fp16_io_ok(
                ln, "layer_norm"
            ):
                return None
            if ln.weight is None or ln.bias is None:
                return None
        for ra in (block.resadd1, block.resadd2):
            if not isinstance(ra, dmxnn.ResAdd) or not _fp16_io_ok(ra, None):
                return None
        act = mlp.act
        if (
            not isinstance(act, dmxnn.GELUBase)
            or act.approximate != "tanh"
            or not _fp16_io_ok(act, None)
        ):
            return None
        ic = attn.c_attn.input_casts["input_cast"]
        if (
            attn.c_proj.input_casts["input_cast"].format != ic.format
            or mlp.c_fc.input_casts["input_cast"].format != ic.format
            or mlp.c_proj.input_casts["input_cast"].format != ic.format
        ):
            return None
        return BasicLayerPlan(
            wl=ic.format.precision,
            block=ic.format.block_size,
            ln1_eps=float(ln1.eps),
            ln2_eps=float(ln2.eps),
        )
    except (KeyError, AttributeError):
        return None


def basic_layer_plan(layer) -> Optional[BasicLayerPlan]:
    """Return the mega-kernel plan when an OPTDecoderLayer (post
    compress_for_inference) is in BASIC decode shape; None -> modular path."""
    from ..nn import modules as dmxnn
    from ..nn.core import DmxModule

    if not DmxModule.inference_mode or DmxModule.plugins:
        return None
    if not layer.do_layer_norm_before:
        return None
    attn = layer.self_attn
    merged = getattr(attn, "qkv_merged", None)
    try:
        if merged is None or not _linear_basic_ok(merged):
            return None
        if not _linear_basic_ok(layer.fc1):
            return None
        if not _linear_basic_ok(layer.fc2) or not _linear_basic_ok(attn.out_proj):
            return None
        ln1, ln2 = layer.self_attn_layer_norm, layer.final_layer_norm
        for ln in (ln1, ln2):
            if not isinstance(ln, dmxnn.LayerNorm) or not _fp16_io_ok(ln, "layer_norm"):
                return None
            if ln.weight is None or ln.bias is None:
                return None
        for ra in (layer.resadd1, layer.resadd2):
            if not isinstance(ra, dmxnn.ResAdd) or not _fp16_io_ok(ra, None):
                return None
        if not isinstance(layer.activation_fn, dmxnn.ReLU) or not _fp16_io_ok(
            layer.activation_fn, None
        ):
            return None
        ic = merged.input_casts["input_cast"]
        if (
            layer.fc1.input_casts["input_cast"].format != ic.format
            or layer.fc2.input_casts["input_cast"].format != ic.format
        ):
            return None
        return BasicLayerPlan(
            wl=ic.format.precision,
            block=ic.format.block_size,
            ln1_eps=float(ln1.eps),
            ln2_eps=float(ln2.eps),
        )
    except (KeyError, AttributeError):
        return None
