"""Fused BFP dequant + matmul: the TPU speed-of-light inference path.

The reference computes fake-quantized matmuls in fp32 after materializing
quantized weights each forward (reference torch_modules.py:346-360); there is
no packed execution path at all.  Here BFP weights live in HBM as int8
mantissas + per-block int8 exponents (ops/bfp_pack.py) and a Pallas kernel
dequantizes weight tiles in VMEM on their way into the MXU — HBM traffic for
weights drops ~4x vs fp32 (~2x vs bf16), which directly bounds decode
throughput.

Numerics: identical to the simulated path (dequantized values are bit-exact
reconstructions; the matmul accumulates in fp32 on the MXU either way) —
verified by tests against the jnp reference.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .bfp_pack import PackedBFP, bfp_unpack

Array = jax.Array


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def bfp_linear_ref(x: Array, w: PackedBFP, bias: Optional[Array] = None) -> Array:
    """jnp reference path: unpack then matmul (XLA fuses the dequant)."""
    wf = bfp_unpack(w)
    y = jnp.matmul(x, wf.T.astype(x.dtype), preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(x.dtype)


def _ceil_to(v: int, m: int) -> int:
    return -(-v // m) * m


@functools.partial(
    jax.jit, static_argnames=("precision", "block_size", "bn", "interpret")
)
def _bfp_matmul_pallas(
    x: Array,  # [M, K] f32/bf16
    man: Array,  # [N, K] int8
    exp: Array,  # [N, K // block_size] int8
    precision: int,
    block_size: int,
    bn: int = 256,
    interpret: bool = False,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = x.shape
    N = man.shape[0]
    bm = max(8, min(128, _ceil_to(M, 8)))
    bn = min(bn, _ceil_to(N, 128))
    # K tile: keeps VMEM under budget (x f32 + man int8 + dequant f32 +
    # scale f32, double buffered) while keeping quantization blocks whole
    bk = min(_ceil_to(K, block_size), 2048)
    # pad operands to whole blocks (grid reads must stay in bounds)
    padM, padN, padK = (-M) % bm, (-N) % bn, (-K) % bk
    if padM:
        x = jnp.pad(x, ((0, padM), (0, 0)))
    if padN:
        man = jnp.pad(man, ((0, padN), (0, 0)))
        exp = jnp.pad(exp, ((0, padN), (0, 0)))
    if padK:
        x = jnp.pad(x, ((0, 0), (0, padK)))
        man = jnp.pad(man, ((0, 0), (0, padK)))
        exp = jnp.pad(exp, ((0, 0), (0, padK // block_size)))
    Mp, Np, Kp = M + padM, N + padN, K + padK
    grid = (Mp // bm, Np // bn, Kp // bk)

    nb = bk // block_size
    nt = Kp // bk
    # Mosaic requires lane-dim blocks divisible by 128 (or full): lay the
    # exponents out as one zero-padded 128-wide slot per K-tile.  Padded rows
    # are inert: the expansion matrix maps them to out-of-tile columns.
    ESLOT = max(128, _ceil_to(nb, 128))
    exp_slotted = jnp.pad(
        exp.reshape(Np, nt, nb), ((0, 0), (0, 0), (0, ESLOT - nb))
    ).reshape(Np, nt * ESLOT)

    def kernel(x_ref, man_ref, exp_ref, out_ref):
        # Expand per-block scales [bn, ESLOT] to per-lane [bn, bk] with a
        # tiny 0/1 expansion matmul (E[b, c] = 1 iff c // B == b).  Mosaic
        # has no element-repeat (pltpu.repeat tiles) and rejects sub-128 lane
        # slices or reshapes, but an MXU matmul against an iota-built
        # constant is fully supported, exact (one nonzero per output), and
        # cheap.  Slot rows beyond nb hit no column (c // B < nb).
        # (A per-block lane-concat formulation was tried in round 2 and
        # measured 1.4-2x SLOWER at OPT-1.3B decode shapes on the real chip
        # — tools/diag_bfpkernel_ab.py keeps the A/B.)
        e = exp_ref[:].astype(jnp.float32)  # [bn, ESLOT]
        s = jnp.exp2(e + (2 - precision))
        rows = jax.lax.broadcasted_iota(jnp.int32, (ESLOT, bk), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (ESLOT, bk), 1)
        expand = (cols // block_size == rows).astype(jnp.float32)
        scale_full = jax.lax.dot_general(
            s, expand, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bn, bk]
        w = man_ref[:].astype(jnp.float32) * scale_full
        partial = jax.lax.dot_general(
            x_ref[:].astype(jnp.float32),
            w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(pl.program_id(2) == 0)
        def _():
            out_ref[:] = partial

        @pl.when(pl.program_id(2) != 0)
        def _():
            out_ref[:] = out_ref[:] + partial

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, t: (i, t)),
            pl.BlockSpec((bn, bk), lambda i, j, t: (j, t)),
            pl.BlockSpec((bn, ESLOT), lambda i, j, t: (j, t)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, t: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, man, exp_slotted)
    return out[:M, :N]


def bfp_linear(
    x: Array,
    w: PackedBFP,
    bias: Optional[Array] = None,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> Array:
    """y = x @ dequant(w).T + bias with fused on-chip dequantization.

    ``x`` may have any leading shape; the last dim contracts against the
    packed weight's last dim.
    """
    if use_pallas is None:
        # interpret runs the Pallas interpreter (kernel-logic testing off-TPU)
        # only when the caller did not explicitly ask for the reference path
        use_pallas = _on_tpu() or interpret
    if not use_pallas:
        return bfp_linear_ref(x, w, bias)
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    N = w.mantissa.shape[0]
    y = _bfp_matmul_pallas(
        x2, w.mantissa, w.exponent, w.precision, w.block_size,
        interpret=interpret,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.reshape(*lead, N).astype(x.dtype)


# ---------------------------------------------------------------------------
# SBFP: fused dequant-matmul over int4-range mantissas + per-block fp scales
# ---------------------------------------------------------------------------


def sbfp_linear_ref(x: Array, w, bias: Optional[Array] = None) -> Array:
    """jnp reference path: unpack then matmul."""
    from .bfp_pack import sbfp_unpack

    wf = sbfp_unpack(w)
    y = jnp.matmul(x, wf.T.astype(x.dtype), preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(x.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_size", "bn", "interpret")
)
def _sbfp_matmul_pallas(
    x: Array,  # [M, K] f32/bf16
    man: Array,  # [N, K] int8 (int4-range values)
    scale: Array,  # [N, K // block_size] f32 (scaler-format-cast block maxes)
    block_size: int,
    bn: int = 256,
    interpret: bool = False,
):
    """Same tiling as _bfp_matmul_pallas; the per-block scale is a direct
    f32 value instead of a power-of-two exponent (SBFP semantics)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = x.shape
    N = man.shape[0]
    bm = max(8, min(128, _ceil_to(M, 8)))
    bn = min(bn, _ceil_to(N, 128))
    bk = min(_ceil_to(K, block_size), 2048)
    padM, padN, padK = (-M) % bm, (-N) % bn, (-K) % bk
    if padM:
        x = jnp.pad(x, ((0, padM), (0, 0)))
    if padN:
        man = jnp.pad(man, ((0, padN), (0, 0)))
        scale = jnp.pad(scale, ((0, padN), (0, 0)))
    if padK:
        x = jnp.pad(x, ((0, 0), (0, padK)))
        man = jnp.pad(man, ((0, 0), (0, padK)))
        scale = jnp.pad(scale, ((0, 0), (0, padK // block_size)))
    Mp, Np, Kp = M + padM, N + padN, K + padK
    grid = (Mp // bm, Np // bn, Kp // bk)

    nb = bk // block_size
    nt = Kp // bk
    ESLOT = max(128, _ceil_to(nb, 128))
    scale_slotted = jnp.pad(
        scale.reshape(Np, nt, nb), ((0, 0), (0, 0), (0, ESLOT - nb))
    ).reshape(Np, nt * ESLOT)

    def kernel(x_ref, man_ref, scale_ref, out_ref):
        # one-hot expansion matmul (see the BFP kernel above); the per-block
        # scale here is a direct f32 value
        s = scale_ref[:].astype(jnp.float32)  # [bn, ESLOT]
        rows = jax.lax.broadcasted_iota(jnp.int32, (ESLOT, bk), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (ESLOT, bk), 1)
        expand = (cols // block_size == rows).astype(jnp.float32)
        scale_full = jax.lax.dot_general(
            s, expand, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        w = man_ref[:].astype(jnp.float32) * scale_full
        partial = jax.lax.dot_general(
            x_ref[:].astype(jnp.float32), w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(pl.program_id(2) == 0)
        def _():
            out_ref[:] = partial

        @pl.when(pl.program_id(2) != 0)
        def _():
            out_ref[:] = out_ref[:] + partial

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, t: (i, t)),
            pl.BlockSpec((bn, bk), lambda i, j, t: (j, t)),
            pl.BlockSpec((bn, ESLOT), lambda i, j, t: (j, t)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, t: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, man, scale_slotted)
    return out[:M, :N]


def sbfp_unpack_mantissa_int8(nibbles: Array) -> Array:
    """Two's-complement nibble payload -> int8 mantissas [..., 2 * half]."""
    b = nibbles.astype(jnp.int32)
    lo = b & 0xF
    lo = lo - ((lo > 7) << 4)
    hi = (b >> 4) & 0xF
    hi = hi - ((hi > 7) << 4)
    *lead, half = b.shape
    return jnp.stack([lo, hi], axis=-1).reshape(*lead, half * 2).astype(jnp.int8)


def sbfp_linear(
    x: Array,
    w,
    bias: Optional[Array] = None,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> Array:
    """y = x @ dequant(sbfp).T + bias with fused on-chip dequantization."""
    if use_pallas is None:
        use_pallas = _on_tpu() or interpret
    if not use_pallas:
        return sbfp_linear_ref(x, w, bias)
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    man = sbfp_unpack_mantissa_int8(w.nibbles)
    N = man.shape[0]
    y = _sbfp_matmul_pallas(
        x2, man, w.scale, w.block_size, interpret=interpret
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.reshape(*lead, N).astype(x.dtype)
