"""KV caches: full-precision and quantized static-shape ring buffers.

The reference has no KV-cache machinery (only HF signature plumbing,
reference model.py:304-350); the quantized cache is this build's north-star
addition (BASELINE.md: "OPT-1.3B with INT8 group-quant weights + SmoothQuant
calibration + quantized KV-cache").

Design: static shapes (jit once), ``dynamic_update_slice`` appends, and for
the quantized variant int8 payloads with one fp scale per (batch, head,
position) — amax over the head dim.  Dequantization is a column-scale applied
after the attention matmuls, so the cache read stays int8 in HBM: at long
context the KV stream is the decode bandwidth bound, and int8 cuts it 4x
vs fp32 (2x vs bf16).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

Array = jax.Array


class QuantKV(NamedTuple):
    """Int8 KV payloads + per-(batch, head, position) scales.

    ``s_minor=True`` marks payloads stored sequence-minor ([B, H, D, S]) —
    the physical layout of :class:`QuantizedKVCache`, chosen because the
    default D-minor layout tile-pads head_dim 64 to 128 lanes (2x HBM
    capacity AND stream for every read/rewrite; see KVCache docstring).
    """

    k_q: Array  # [B, H, S, D] int8 ([B, H, D, S] when s_minor)
    v_q: Array
    k_scale: Array  # [B, H, S] f32
    v_scale: Array  # [B, H, S] f32
    s_minor: bool = False


def quantized_sdpa(
    q: Array,
    kv: QuantKV,
    attn_mask=None,
    scale=None,
    out_dtype=None,
    enable_gqa: bool = False,
):
    """Attention consuming int8 K/V directly (scale after the matmuls).

    logits = (q @ k_q^T) * k_scale  — exact: the per-key scale factors out of
    the QK contraction; probs @ v becomes (probs * v_scale) @ v_q likewise.
    HBM reads stay int8, nothing fp32-sized is materialized.
    """
    out_dtype = out_dtype or q.dtype
    D = q.shape[-1]
    scale = (D**-0.5) if scale is None else scale
    if enable_gqa and q.shape[-3] != kv.k_q.shape[-3]:
        rep = q.shape[-3] // kv.k_q.shape[-3]
        kv = QuantKV(
            jnp.repeat(kv.k_q, rep, axis=-3),
            jnp.repeat(kv.v_q, rep, axis=-3),
            jnp.repeat(kv.k_scale, rep, axis=-2),
            jnp.repeat(kv.v_scale, rep, axis=-2),
            s_minor=kv.s_minor,
        )
    qf = q.astype(jnp.float32)
    kq_sub = "...ds" if kv.s_minor else "...sd"
    logits = jnp.einsum(
        f"...ld,{kq_sub}->...ls", qf, kv.k_q.astype(jnp.float32)
    ) * (kv.k_scale[..., None, :] * scale)
    if attn_mask is not None:
        logits = logits + attn_mask.astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        f"...ls,{kq_sub}->...ld",
        w * kv.v_scale[..., None, :],
        kv.v_q.astype(jnp.float32),
    )
    return out.astype(out_dtype)


def cache_seq_len(cache) -> int:
    """Max sequence capacity of any cache class (mask construction must not
    read buffer shapes: storage may be sequence-minor)."""
    s = getattr(cache, "seq_len", None)
    return s if s is not None else cache.k.value.shape[2]


class KVCache(nnx.Module):
    """Full-precision static cache; buffers stored SEQUENCE-MINOR
    ([B, H, D, S_max]).

    Layout rationale: TPU arrays tile their two minor dims ((8, 128) lanes
    for f32); a D-minor [.., S, 64] buffer pads head_dim 64 to 128 lanes —
    physically 2x the HBM capacity, 2x the stream on every read, and 2x the
    carried-buffer rewrite each decode step (measured: the padded copies
    alone OOM the fp32 OPT-1.3B baseline at 2k context).  S-minor storage
    tiles (64, S) with zero padding.  ``update`` still takes and returns
    logical [B, H, S, D] tensors (the swap fuses into downstream einsums);
    kernels that want the raw layout read ``.k.value`` directly
    (ops/flash_decode.py s_minor paths).
    """

    quantized = False
    s_minor = True

    def __init__(self, batch: int, heads: int, max_len: int, head_dim: int,
                 dtype=jnp.float32):
        self.max_len = max_len
        self.head_dim = head_dim
        self.k = nnx.Variable(jnp.zeros((batch, heads, head_dim, max_len), dtype))
        self.v = nnx.Variable(jnp.zeros((batch, heads, head_dim, max_len), dtype))
        self.length = nnx.Variable(jnp.zeros((), jnp.int32))

    @property
    def seq_len(self) -> int:
        return self.max_len

    def update(self, k_new: Array, v_new: Array):
        """Append [B,H,T,D] at the fill point; returns the full (dequantized)
        buffers as logical [B,H,S,D] views and the new length."""
        pos = self.length.value
        dt = self.k.value.dtype
        self.k.value = jax.lax.dynamic_update_slice(
            self.k.value, k_new.astype(dt).swapaxes(-1, -2), (0, 0, 0, pos)
        )
        self.v.value = jax.lax.dynamic_update_slice(
            self.v.value, v_new.astype(dt).swapaxes(-1, -2), (0, 0, 0, pos)
        )
        self.length.value = pos + k_new.shape[2]
        return (
            self.k.value.swapaxes(-1, -2),
            self.v.value.swapaxes(-1, -2),
            self.length.value,
        )


class QuantizedKVCache(nnx.Module):
    """INT8 KV cache with per-(batch, head, position) scales.

    ``update`` quantizes incoming keys/values symmetrically over the head dim
    (scale = amax/127) and returns dequantized full buffers — a drop-in for
    :class:`KVCache` from the attention module's perspective, while HBM holds
    int8 payloads.
    """

    quantized = True
    s_minor = True  # payloads stored [B, H, D, S] (see KVCache docstring)

    def __init__(self, batch: int, heads: int, max_len: int, head_dim: int,
                 dtype=jnp.float32, bits: int = 8):
        assert bits == 8, "int8 cache payloads (other widths via BFP packing)"
        self.out_dtype = dtype
        self.max_len = max_len
        self.head_dim = head_dim
        self.k_q = nnx.Variable(jnp.zeros((batch, heads, head_dim, max_len), jnp.int8))
        self.v_q = nnx.Variable(jnp.zeros((batch, heads, head_dim, max_len), jnp.int8))
        self.k_scale = nnx.Variable(jnp.zeros((batch, heads, max_len), jnp.float32))
        self.v_scale = nnx.Variable(jnp.zeros((batch, heads, max_len), jnp.float32))
        self.length = nnx.Variable(jnp.zeros((), jnp.int32))

    @property
    def seq_len(self) -> int:
        return self.max_len

    @staticmethod
    def _quantize(x: Array) -> Tuple[Array, Array]:
        amax = jnp.max(jnp.abs(x), axis=-1)
        scale = jnp.maximum(amax / 127.0, 1e-10)
        q = jnp.clip(jnp.round(x / scale[..., None]), -127, 127).astype(jnp.int8)
        return q, scale.astype(jnp.float32)

    def update(self, k_new: Array, v_new: Array):
        self.update_payload(k_new, v_new)
        k = (
            self.k_q.value.astype(jnp.float32)
            * self.k_scale.value[..., None, :]
        ).swapaxes(-1, -2).astype(self.out_dtype)
        v = (
            self.v_q.value.astype(jnp.float32)
            * self.v_scale.value[..., None, :]
        ).swapaxes(-1, -2).astype(self.out_dtype)
        return k, v, self.length.value

    def update_quantized(self, k_new: Array, v_new: Array) -> QuantKV:
        """Append and return the int8 payloads + scales (no dequantization,
        native s_minor layout); consume with :func:`quantized_sdpa`."""
        self.update_payload(k_new, v_new)
        return QuantKV(
            self.k_q.value,
            self.v_q.value,
            self.k_scale.value,
            self.v_scale.value,
            s_minor=True,
        )

    def update_payload(self, k_new: Array, v_new: Array) -> None:
        pos = self.length.value
        kq, ks = self._quantize(k_new.astype(jnp.float32))
        vq, vs = self._quantize(v_new.astype(jnp.float32))
        self.k_q.value = jax.lax.dynamic_update_slice(
            self.k_q.value, kq.swapaxes(-1, -2), (0, 0, 0, pos)
        )
        self.v_q.value = jax.lax.dynamic_update_slice(
            self.v_q.value, vq.swapaxes(-1, -2), (0, 0, 0, pos)
        )
        self.k_scale.value = jax.lax.dynamic_update_slice(
            self.k_scale.value, ks, (0, 0, pos)
        )
        self.v_scale.value = jax.lax.dynamic_update_slice(
            self.v_scale.value, vs, (0, 0, pos)
        )
        self.length.value = pos + k_new.shape[2]

    @property
    def k(self):  # raw-buffer alias (shape readers must use .seq_len)
        return self.k_q

    @property
    def v(self):
        return self.v_q


class SplitKVCache(nnx.Module):
    """Prefill/decode split cache: an *invariant* base segment plus a small
    mutable tail.

    On the target platform every mutation of a loop-carried buffer rewrites
    the whole buffer (~10-25us per cache per decode step, measured via
    tools/diag profiling) — while *unchanged* carried buffers are hoisted
    and free.  Splitting the cache into a base segment (written once at
    prefill, then read-only during a decode window) and a ``tail_len``-sized
    mutable tail shrinks the per-step rewrite from O(S_max) to O(tail_len)
    bytes: measured ~460us/step saved on OPT-125m decode.

    ``base_len`` and ``tail_len`` must be multiples of the BASIC BFP block
    size (64) so sequence-blocked casts never straddle the segment boundary
    — attention consumes the segments separately (models/opt.py attend).
    Decode beyond the tail requires ``merge_tail()`` between windows.

    Layout: LOGICAL [B, H, S, D] (D-minor), unlike :class:`KVCache`.  The
    split path is pure jnp, so XLA's layout assignment already gives these
    buffers a sequence-minor physical layout where the dots want it —
    forcing the logical s_minor form measured 33% SLOWER end-to-end at
    OPT-1.3B BASIC decode (829 vs 1234 tok/s, r3 A/B on hardware), likely
    from worse dot lowerings against the reordered logical dims.  Explicit
    s_minor storage stays reserved for buffers feeding Pallas kernels
    (which pin default layouts).  DMX_SPLIT_SMINOR=1 re-enables the
    s_minor form for future layout investigations.
    """

    quantized = False
    split = True
    s_minor = False

    def __init__(self, batch: int, heads: int, base_len: int, tail_len: int,
                 head_dim: int, dtype=jnp.float32):
        import os

        if os.environ.get("DMX_SPLIT_SMINOR"):  # layout A/B escape hatch
            self.s_minor = True
        self.base_len = base_len
        self.tail_len = tail_len
        self.head_dim = head_dim
        shp = (
            (batch, heads, base_len, head_dim)
            if not self.s_minor
            else (batch, heads, head_dim, base_len)
        )
        tshp = (
            (batch, heads, tail_len, head_dim)
            if not self.s_minor
            else (batch, heads, head_dim, tail_len)
        )
        self.base_k = nnx.Variable(jnp.zeros(shp, dtype))
        self.base_v = nnx.Variable(jnp.zeros(shp, dtype))
        self.tail_k = nnx.Variable(jnp.zeros(tshp, dtype))
        self.tail_v = nnx.Variable(jnp.zeros(tshp, dtype))
        self.length = nnx.Variable(jnp.zeros((), jnp.int32))
        # optional precomputed fake-quant casts of the (final) base segment:
        # invariant during decode, so recomputing them every step wastes
        # ~700us/step on OPT-125m; bf16 holds the <=8-mantissa-bit cast
        # values exactly.  Keyed by the cast params that produced them.
        self.base_k_cast = nnx.Variable(jnp.zeros(shp, jnp.bfloat16))
        self.base_v_cast = nnx.Variable(jnp.zeros(shp, jnp.bfloat16))
        self.base_cast_key = None  # static; set by set_base_cast

    def set_base_cast(self, k_cast, v_cast, key) -> None:
        """Install precomputed base casts (s_minor [B, H, D, S] layout)."""
        self.base_k_cast.value = k_cast.astype(jnp.bfloat16)
        self.base_v_cast.value = v_cast.astype(jnp.bfloat16)
        self.base_cast_key = key

    @property
    def seq_len(self) -> int:
        return self.base_len + self.tail_len

    def _store(self, x: Array, dt) -> Array:
        return x.astype(dt).swapaxes(-1, -2) if self.s_minor else x.astype(dt)

    def write_base(self, k_new: Array, v_new: Array) -> None:
        """Prefill: write [B,H,T,D] at the fill point of the base segment."""
        pos = self.length.value
        dt = self.base_k.value.dtype
        idx = (0, 0, 0, pos) if self.s_minor else (0, 0, pos, 0)
        self.base_k.value = jax.lax.dynamic_update_slice(
            self.base_k.value, self._store(k_new, dt), idx
        )
        self.base_v.value = jax.lax.dynamic_update_slice(
            self.base_v.value, self._store(v_new, dt), idx
        )
        self.length.value = pos + k_new.shape[2]

    def append_tail(self, k_new: Array, v_new: Array):
        """Decode: append [B,H,1,D] into the tail; returns the four RAW
        segment buffers (base read-only; s_minor layout unless the A/B
        escape hatch flipped it)."""
        pos = self.length.value - self.base_len
        dt = self.tail_k.value.dtype
        idx = (0, 0, 0, pos) if self.s_minor else (0, 0, pos, 0)
        self.tail_k.value = jax.lax.dynamic_update_slice(
            self.tail_k.value, self._store(k_new, dt), idx
        )
        self.tail_v.value = jax.lax.dynamic_update_slice(
            self.tail_v.value, self._store(v_new, dt), idx
        )
        self.length.value = self.length.value + k_new.shape[2]
        return (self.base_k.value, self.base_v.value,
                self.tail_k.value, self.tail_v.value)

    def update(self, k_new: Array, v_new: Array):
        """KVCache-compatible: returns concatenated full buffers as logical
        [B,H,S,D] views (slow path — the fused attention consumes the raw
        segments without concatenating)."""
        if k_new.shape[2] > 1:
            self.write_base(k_new, v_new)
        else:
            self.append_tail(k_new, v_new)
        ax = -1 if self.s_minor else 2
        k = jnp.concatenate([self.base_k.value, self.tail_k.value], axis=ax)
        v = jnp.concatenate([self.base_v.value, self.tail_v.value], axis=ax)
        if self.s_minor:
            k, v = k.swapaxes(-1, -2), v.swapaxes(-1, -2)
        return k, v, self.length.value

    def merge_tail(self) -> None:
        """Fold the filled tail into the base (between decode windows).
        Requires base capacity >= current length; here base_len is the
        fixed prefill capacity, so merging grows no further — callers sizing
        longer generations allocate base_len = prompt + n_windows*tail."""
        raise NotImplementedError(
            "decode beyond tail_len: allocate a larger tail or re-prefill"
        )


class RowKVCache(nnx.Module):
    """Continuous-batching cache: every batch row has its OWN fill point
    (``lengths[B]``), so one decode dispatch serves slots at different
    sequence positions.  Appends scatter per row via a vmapped
    ``dynamic_update_slice``; engine prefills copy a freshly-filled
    single-request cache row in with :meth:`write_row`.

    No reference analogue (the reference has no serving runtime at all) —
    this is the static-shape TPU equivalent of slot-based continuous
    batching: shapes never change, only the per-row offsets do.
    """

    quantized = False
    row = True
    s_minor = True  # buffers [B, H, D, S] (see KVCache docstring)

    def __init__(self, batch: int, heads: int, max_len: int, head_dim: int,
                 dtype=jnp.float32):
        self.max_len = max_len
        self.head_dim = head_dim
        self.k = nnx.Variable(jnp.zeros((batch, heads, head_dim, max_len), dtype))
        self.v = nnx.Variable(jnp.zeros((batch, heads, head_dim, max_len), dtype))
        self.lengths = nnx.Variable(jnp.zeros((batch,), jnp.int32))

    @property
    def seq_len(self) -> int:
        return self.max_len

    @property
    def length(self):
        # duck-type compat for code that reads a scalar fill point; per-row
        # consumers must use .lengths
        return nnx.Variable(jnp.max(self.lengths.value))

    def update(self, k_new: Array, v_new: Array):
        """Append [B,H,T,D] at each row's own fill point; rows past
        ``max_len`` clamp to the final window (their outputs are masked by
        construction).  Returns logical [B,H,S,D] views."""
        pos = self.lengths.value  # [B]
        write = jax.vmap(
            lambda buf, new, p: jax.lax.dynamic_update_slice(buf, new, (0, 0, p))
        )
        dt = self.k.value.dtype
        self.k.value = write(
            self.k.value, k_new.astype(dt).swapaxes(-1, -2), pos
        )
        self.v.value = write(
            self.v.value, v_new.astype(dt).swapaxes(-1, -2), pos
        )
        self.lengths.value = pos + k_new.shape[2]
        return (
            self.k.value.swapaxes(-1, -2),
            self.v.value.swapaxes(-1, -2),
            self.lengths.value,
        )

    def write_row(self, b, k_row: Array, v_row: Array,
                  length: Optional[int] = None) -> None:
        """Install a prefilled row: ``k_row``/``v_row`` are s_minor [H, D, T]
        slices of a single-request prefill cache (same layout family).
        ``length`` resets the row's fill point (defaults to T);
        bucket-padded garbage beyond it is masked by construction and
        overwritten by subsequent appends."""
        T = k_row.shape[-1]
        self.k.value = jax.lax.dynamic_update_slice(
            self.k.value, k_row[None].astype(self.k.value.dtype), (b, 0, 0, 0)
        )
        self.v.value = jax.lax.dynamic_update_slice(
            self.v.value, v_row[None].astype(self.v.value.dtype), (b, 0, 0, 0)
        )
        self.lengths.value = self.lengths.value.at[b].set(
            T if length is None else length
        )


class RowQuantizedKVCache(nnx.Module):
    """INT8 continuous-batching cache: :class:`QuantizedKVCache` payloads
    (int8 K/V + per-position scales) with :class:`RowKVCache` per-row fill
    points — the engine's quantized-serving configuration."""

    quantized = True
    row = True
    s_minor = True  # payloads [B, H, D, S] (see KVCache docstring)

    def __init__(self, batch: int, heads: int, max_len: int, head_dim: int,
                 dtype=jnp.float32):
        self.out_dtype = dtype
        self.max_len = max_len
        self.head_dim = head_dim
        self.k_q = nnx.Variable(jnp.zeros((batch, heads, head_dim, max_len), jnp.int8))
        self.v_q = nnx.Variable(jnp.zeros((batch, heads, head_dim, max_len), jnp.int8))
        self.k_scale = nnx.Variable(jnp.zeros((batch, heads, max_len), jnp.float32))
        self.v_scale = nnx.Variable(jnp.zeros((batch, heads, max_len), jnp.float32))
        self.lengths = nnx.Variable(jnp.zeros((batch,), jnp.int32))

    def update_payload(self, k_new: Array, v_new: Array) -> None:
        pos = self.lengths.value  # [B]
        kq, ks = QuantizedKVCache._quantize(k_new.astype(jnp.float32))
        vq, vs = QuantizedKVCache._quantize(v_new.astype(jnp.float32))
        w3 = jax.vmap(
            lambda buf, new, p: jax.lax.dynamic_update_slice(buf, new, (0, 0, p))
        )
        w2 = jax.vmap(
            lambda buf, new, p: jax.lax.dynamic_update_slice(buf, new, (0, p))
        )
        self.k_q.value = w3(self.k_q.value, kq.swapaxes(-1, -2), pos)
        self.v_q.value = w3(self.v_q.value, vq.swapaxes(-1, -2), pos)
        self.k_scale.value = w2(self.k_scale.value, ks, pos)
        self.v_scale.value = w2(self.v_scale.value, vs, pos)
        self.lengths.value = pos + k_new.shape[2]

    @property
    def seq_len(self) -> int:
        return self.max_len

    def update_quantized(self, k_new: Array, v_new: Array) -> QuantKV:
        self.update_payload(k_new, v_new)
        return QuantKV(
            self.k_q.value, self.v_q.value,
            self.k_scale.value, self.v_scale.value,
            s_minor=True,
        )

    def update(self, k_new: Array, v_new: Array):
        self.update_payload(k_new, v_new)
        k = (
            self.k_q.value.astype(jnp.float32)
            * self.k_scale.value[..., None, :]
        ).swapaxes(-1, -2).astype(self.out_dtype)
        v = (
            self.v_q.value.astype(jnp.float32)
            * self.v_scale.value[..., None, :]
        ).swapaxes(-1, -2).astype(self.out_dtype)
        return k, v, self.lengths.value

    def write_row(self, b, k_q_row: Array, v_q_row: Array,
                  k_scale_row: Array, v_scale_row: Array,
                  length: Optional[int] = None) -> None:
        """Install a prefilled row's int8 payloads + scales (s_minor
        [H, D, T] / [H, T], from a batch-1 QuantizedKVCache prefill)."""
        T = k_q_row.shape[-1]
        self.k_q.value = jax.lax.dynamic_update_slice(
            self.k_q.value, k_q_row[None], (b, 0, 0, 0)
        )
        self.v_q.value = jax.lax.dynamic_update_slice(
            self.v_q.value, v_q_row[None], (b, 0, 0, 0)
        )
        self.k_scale.value = jax.lax.dynamic_update_slice(
            self.k_scale.value, k_scale_row[None].astype(jnp.float32), (b, 0, 0)
        )
        self.v_scale.value = jax.lax.dynamic_update_slice(
            self.v_scale.value, v_scale_row[None].astype(jnp.float32), (b, 0, 0)
        )
        self.lengths.value = self.lengths.value.at[b].set(
            T if length is None else length
        )

    @property
    def k(self):  # raw-buffer alias (shape readers must use .seq_len)
        return self.k_q

    @property
    def v(self):
        return self.v_q


def make_caches(
    n_layers: int,
    batch: int,
    heads: int,
    max_len: int,
    head_dim: int,
    dtype=jnp.float32,
    quantized: bool = False,
    split_base_len: Optional[int] = None,
    per_row: bool = False,
):
    if per_row:
        assert split_base_len is None
        cls = RowQuantizedKVCache if quantized else RowKVCache
        return [
            cls(batch, heads, max_len, head_dim, dtype)
            for _ in range(n_layers)
        ]
    if split_base_len is not None:
        assert not quantized
        return [
            SplitKVCache(batch, heads, split_base_len, max_len - split_base_len,
                         head_dim, dtype)
            for _ in range(n_layers)
        ]
    cls = QuantizedKVCache if quantized else KVCache
    return [cls(batch, heads, max_len, head_dim, dtype) for _ in range(n_layers)]
