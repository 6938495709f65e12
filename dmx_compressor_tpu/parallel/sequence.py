"""Sequence/context parallelism: ring attention over an ``sp`` mesh axis.

Absent in the reference (SURVEY §2.10: long inputs are handled only by
striding the perplexity window).  The TPU-native extension shards the
*sequence* dimension of q/k/v across devices; each device computes exact
attention for its query chunk by rotating K/V chunks around the ring with
``lax.ppermute`` while accumulating an online softmax (the flash-attention
recurrence, so the full [S, S] logits matrix never materializes on any
device).  Per-step compute (q_chunk x k_chunk) overlaps with the next
chunk's ICI transfer under XLA's latency-hiding scheduler.

Exact (up to fp reassociation) vs. full softmax attention — including
causal masking via global position indices.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

_NEG = -1e30


def _ring_attention_local(q, k, v, *, axis: str, causal: bool, scale: float):
    """Per-device body: q/k/v are the local sequence chunks [B, H, S/N, D]."""
    n = lax.psum(1, axis)
    me = lax.axis_index(axis)
    B, H, Sq, D = q.shape
    Sk = k.shape[2]

    q_pos = me * Sq + jnp.arange(Sq)
    m0 = jnp.full((B, H, Sq), _NEG, q.dtype)
    l0 = jnp.zeros((B, H, Sq), q.dtype)
    o0 = jnp.zeros_like(q)
    perm = [(j, (j + 1) % n) for j in range(n)]

    def step(carry, i):
        m, l, o, k, v = carry
        # after i rotations this device holds the chunk that started at
        # ring position (me - i) mod n
        src = (me - i) % n
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        if causal:
            k_pos = src * Sk + jnp.arange(Sk)
            valid = k_pos[None, :] <= q_pos[:, None]
            logits = jnp.where(valid, logits, _NEG)
            pmask = valid.astype(q.dtype)
        else:
            pmask = None
        new_m = jnp.maximum(m, logits.max(-1))
        p = jnp.exp(logits - new_m[..., None])
        if pmask is not None:
            p = p * pmask  # exact zero for masked keys even when new_m==_NEG
        alpha = jnp.exp(m - new_m)
        l = l * alpha + p.sum(-1)
        o = o * alpha[..., None] + jnp.einsum("bhqk,bhkd->bhqd", p, v)
        if n > 1:
            k = lax.ppermute(k, axis, perm)
            v = lax.ppermute(v, axis, perm)
        return (new_m, l, o, k, v), None

    (m, l, o, _, _), _ = lax.scan(step, (m0, l0, o0, k, v), jnp.arange(n))
    return o / jnp.maximum(l, 1e-30)[..., None]


def ring_attention(
    q,
    k,
    v,
    mesh: Mesh,
    *,
    sp_axis: str = "sp",
    causal: bool = False,
    scale: float | None = None,
    dp_axis: str | None = None,
):
    """Exact attention with q/k/v sequence-sharded over ``mesh[sp_axis]``.

    q/k/v: [B, H, S, D] with equal S; S must divide by the sp axis size.
    Memory per device is O(S/N · D) — no [S, S] buffer anywhere — so
    context length scales linearly with the ring size.
    """
    S = q.shape[2]
    N = mesh.shape[sp_axis]
    assert S % N == 0, f"sequence {S} does not divide over {N} sp devices"
    scale = float(q.shape[-1]) ** -0.5 if scale is None else scale
    spec = P(dp_axis, None, sp_axis, None)
    body = partial(
        _ring_attention_local, axis=sp_axis, causal=causal, scale=scale
    )
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_rep=False,
    )(q, k, v)
