"""Blockwise (flash) attention Pallas kernel with quantization cast points.

The reference's SDPA is a *decomposed compound module* that materializes the
full L x S attention matrix (reference torch_modules.py:108-191 — quadratic
memory, no blocking; SURVEY §5 flags this).  The TPU-native prefill path is a
single Pallas kernel: K/V stream through VMEM in tiles with an online
softmax, so memory is O(L·D) and both matmuls stay on the MXU.

Quantization boundary parity: the compound module's cast points (q/k/v/mask
casts, BFP blocks along the head dim) commute with row/column tiling, so the
casts are applied by the caller before this kernel and the numerics match the
unblocked decomposition up to fp32 summation order.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

NEG_INF = -1e30


def flash_attention_ref(
    q: Array,
    k: Array,
    v: Array,
    bias: Optional[Array] = None,
    scale: Optional[float] = None,
    causal: bool = False,
) -> Array:
    """Unblocked reference (jnp); same contract as the kernel."""
    *lead, L, D = q.shape
    S = k.shape[-2]
    scale = (D**-0.5) if scale is None else scale
    hi = jax.lax.Precision.HIGHEST  # full fp32 on the MXU for the reference
    logits = (
        jnp.einsum("...ld,...sd->...ls", q, k, precision=hi).astype(jnp.float32)
        * scale
    )
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if causal:
        mask = jnp.tril(jnp.ones((L, S), bool), k=S - L)
        logits = jnp.where(mask, logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "...ls,...sd->...ld", w, v.astype(jnp.float32), precision=hi
    ).astype(q.dtype)


def _cdiv(a, b):
    return -(-a // b)


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale", "causal", "block_q", "block_k", "has_bias", "offset", "s_valid"
    )
)
def _flash_pallas(
    q: Array,  # [BH, L, D]
    k: Array,  # [BH, S, D]
    v: Array,  # [BH, S, D]
    bias: Array,  # [BH, L, S], or [1, 1, 1] placeholder if has_bias=False
    scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
    has_bias: bool,
    offset: int = 0,  # true S - true L (diagonal position before padding)
    s_valid: int = 0,  # if nonzero, mask key columns >= s_valid (S padding)
):
    from jax.experimental import pallas as pl

    BH, L, D = q.shape
    S = k.shape[1]
    nq = _cdiv(L, block_q)
    nk = _cdiv(S, block_k)

    def kernel(q_ref, k_ref, v_ref, b_ref, o_ref):
        qi = pl.program_id(1)
        qv = q_ref[0].astype(jnp.float32) * scale  # [BQ, D]

        def body(kt, carry):
            m_prev, l_prev, acc = carry
            kv = k_ref[0, pl.ds(kt * block_k, block_k), :].astype(jnp.float32)
            vv = v_ref[0, pl.ds(kt * block_k, block_k), :].astype(jnp.float32)
            s = jax.lax.dot_general(
                qv, kv, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # [BQ, BK]
            if has_bias:
                s = s + b_ref[0, :, pl.ds(kt * block_k, block_k)].astype(jnp.float32)
            col = kt * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            if s_valid:
                # padded key columns must not compete in the softmax
                s = jnp.where(col < s_valid, s, NEG_INF)
            if causal:
                row = qi * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0
                )
                s = jnp.where(col <= row + offset, s, NEG_INF)
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p, vv, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            return m_new, l_new, acc

        m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((block_q, 1), jnp.float32)
        a0 = jnp.zeros((block_q, D), jnp.float32)
        if causal:
            # only key tiles up to the diagonal contribute
            last = jnp.clip(
                ((qi + 1) * block_q + offset + block_k - 1) // block_k, 0, nk
            )
        else:
            last = nk
        m, l, acc = jax.lax.fori_loop(0, last, body, (m0, l0, a0))
        o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    in_specs = [
        pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, S, D), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, S, D), lambda b, i: (b, 0, 0)),
        # without a bias, a [1, 1, 1] placeholder rides along so no
        # [BH, L, S] buffer is ever materialized in HBM
        pl.BlockSpec((1, block_q, S), lambda b, i: (b, i, 0))
        if has_bias
        else pl.BlockSpec((1, 1, 1), lambda b, i: (0, 0, 0)),
    ]
    return pl.pallas_call(
        kernel,
        grid=(BH, nq),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, nq * block_q, D), q.dtype),
    )(q, k, v, bias)[:, :L]


def flash_attention(
    q: Array,
    k: Array,
    v: Array,
    bias: Optional[Array] = None,
    scale: Optional[float] = None,
    causal: bool = False,
    block_q: int = 128,
    block_k: int = 128,
    use_pallas: Optional[bool] = None,
) -> Array:
    """softmax(q k^T * scale + bias) v, blockwise.

    q: [..., L, D]; k, v: [..., S, D]; bias broadcastable to [..., L, S].
    """
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    if not use_pallas:
        return flash_attention_ref(q, k, v, bias, scale, causal)
    *lead, L, D = q.shape
    S = k.shape[-2]
    BH = int(np.prod(lead)) if lead else 1
    scale = (D**-0.5) if scale is None else float(scale)
    q2 = q.reshape(BH, L, D)
    k2 = k.reshape(BH, S, D)
    v2 = v.reshape(BH, S, D)
    if bias is not None:
        b2 = jnp.broadcast_to(bias, tuple(lead) + (L, S)).reshape(BH, L, S)
        has_bias = True
    else:
        b2 = jnp.zeros((1, 1, 1), q.dtype)  # placeholder, never read
        has_bias = False
    bq = min(block_q, max(8, L))
    bk = min(block_k, S)
    # pad L to a block multiple for the grid; padded rows are discarded
    padL = (-L) % bq
    if padL:
        q2 = jnp.pad(q2, ((0, 0), (0, padL), (0, 0)))
        if has_bias:
            b2 = jnp.pad(b2, ((0, 0), (0, padL), (0, 0)))
    padS = (-S) % bk
    if padS:
        k2 = jnp.pad(k2, ((0, 0), (0, padS), (0, 0)))
        v2 = jnp.pad(v2, ((0, 0), (0, padS), (0, 0)))
        if has_bias:
            b2 = jnp.pad(b2, ((0, 0), (0, 0), (0, padS)), constant_values=NEG_INF)
    out = _flash_pallas(
        q2, k2, v2, b2, scale, causal, bq, bk, has_bias,
        offset=S - L, s_valid=S if padS else 0,
    )
    return out[:, :L].reshape(*lead, L, D)


def sdpa_transparent(sdpa) -> bool:
    """True when the sdpa module applies no fake-quant casts or surrogate
    anywhere in its compound pipeline (weights-only serving / raw model) —
    the flash/int8 kernels are then exact up to fp32 summation order.
    Checks the decomposed sub-ops too: the compound module's own casts are
    SAME even in BASIC mode, where the numerics live in actmatmul / resadd /
    softmax (reference torch_modules.py:129-168)."""
    from ..functional.approximate import NoApproximation
    from ..numerics.format import Same

    def module_transparent(m) -> bool:
        casts = getattr(m, "input_casts", None)
        if casts is None:
            return True
        ok = all(isinstance(casts[kk].format, Same) for kk in casts.keys())
        outs = getattr(m, "output_casts", None)
        if outs is not None:
            ok = ok and all(
                isinstance(outs[kk].format, Same) for kk in outs.keys()
            )
        apx = getattr(m, "approximator", None)
        if apx is not None:
            ok = ok and isinstance(apx.function, NoApproximation)
        return ok

    subs = [
        getattr(sdpa, name)
        for name in ("actmatmul", "resadd", "mul", "softmax", "dropout")
        if getattr(sdpa, name, None) is not None
    ]
    return module_transparent(sdpa) and all(module_transparent(s) for s in subs)


def flash_prefill(sdpa, q, k, v, *, scale=None, cache=None):
    """Route a full causal prefill through the blockwise flash kernel —
    O(T*D) memory instead of the [T, S_max] logits buffer — when ``sdpa``
    is numerically transparent.  Returns the attention context, or ``None``
    when routing does not apply (caller falls back to the masked sdpa).

    Caller contract: q/k/v are the FRESH projections of a prefill starting
    at position 0 under a plain causal structure (no sliding window / no
    additive bias).  ``cache`` (optional) is filled with k/v as a side
    effect.  GQA handled by head repetition before the kernel.
    """
    if q.shape[-2] <= 1 or not sdpa_transparent(sdpa):
        return None
    if cache is not None and getattr(cache, "quantized", False):
        # the quantized-cache contract attends over DEQUANTIZED k/v even at
        # prefill; flashing over the fresh fp values would change numerics
        return None
    if cache is not None:
        if hasattr(cache, "write_base"):
            cache.write_base(k, v)
        else:
            cache.update(k, v)
    if k.shape[-3] != q.shape[-3]:
        rep = q.shape[-3] // k.shape[-3]
        k = jnp.repeat(k, rep, axis=-3)
        v = jnp.repeat(v, rep, axis=-3)
    return flash_attention(q, k, v, causal=True, scale=scale)


def flash_chunked_prefill(sdpa, q, k, v, *, cache, offset: int, scale=None):
    """Chunked prefill: queries at positions [offset, offset+T) attend the
    cache prefix [0, offset) plus the fresh chunk — the flash kernel's
    causal diagonal at S-L handles exactly this alignment, so no mask
    materializes.  Fills the cache as a side effect.  Returns ``None`` when
    routing does not apply (caller falls back to the masked sdpa)."""
    T = q.shape[-2]
    if T <= 1 or not sdpa_transparent(sdpa):
        return None
    if cache is None or getattr(cache, "quantized", False) or hasattr(
        cache, "write_base"
    ):
        return None
    kf, vf, _ = cache.update(k, v)
    kf = kf[..., : offset + T, :]
    vf = vf[..., : offset + T, :]
    if kf.shape[-3] != q.shape[-3]:
        rep = q.shape[-3] // kf.shape[-3]
        kf = jnp.repeat(kf, rep, axis=-3)
        vf = jnp.repeat(vf, rep, axis=-3)
    return flash_attention(q, kf, vf, causal=True, scale=scale)
