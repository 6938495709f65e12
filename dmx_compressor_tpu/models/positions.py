"""Position-id / causal-mask helpers shared by the decoder families.

Every zoo decoder accepts ``position_offset`` as a python int (one offset
for the whole batch — the generate/scan paths) OR a per-row int32 array
[B] (continuous batching: each slot sits at its own fill point,
serving/engine.py).  These helpers produce the matching position-id and
additive-mask shapes for both cases with one code path per model.
"""

from __future__ import annotations

import jax.numpy as jnp


def is_per_row(position_offset) -> bool:
    return (
        not isinstance(position_offset, int)
        and jnp.ndim(position_offset) == 1
    )


def resolve_positions(T: int, position_offset):
    """Position ids for a length-T step: ``([1, T] or [B, T], per_row)``."""
    if is_per_row(position_offset):
        off = jnp.asarray(position_offset, jnp.int32)
        return jnp.arange(T)[None, :] + off[:, None], True
    return (jnp.arange(T) + position_offset)[None], False


def causal_mask(T: int, S: int, position_offset, dtype,
                sliding_window=None):
    """Additive causal mask: [T, S] for a shared offset, [B, 1, T, S] for
    per-row offsets; optionally banded (Mistral-style sliding window)."""
    kpos = jnp.arange(S)
    if is_per_row(position_offset):
        off = jnp.asarray(position_offset, jnp.int32)
        qpos = (jnp.arange(T)[None, :] + off[:, None])[:, None, :, None]
        k = kpos[None, None, None, :]
    else:
        qpos = (jnp.arange(T) + position_offset)[:, None]
        k = kpos[None, :]
    keep = k <= qpos
    if sliding_window is not None:
        keep = keep & (k > qpos - sliding_window)
    return jnp.where(keep, 0.0, -1e4).astype(dtype)
