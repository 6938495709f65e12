"""Hardware-friendly alternative conv lowerings.

TPU-native re-design of the reference experimental modules
(reference: src/dmx/compressor/modeling/nn/experimental.py): convolutions
re-expressed as im2col/gather + matmul so the hot op is a plain GEMM on the
MXU with the standard Linear cast topology (input blocks along the patch
axis).  Used for Whisper (Conv1dUnfold) and CLIP (Conv2dUnfold) per the
reference's model recipes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..numerics.format import Same
from .core import DmxModule
from .modules import _ConvNd, _im2col, _init_weight, _pair


class _UnfoldConvBase(DmxModule):
    """Shared: conv as patches-matmul with Linear-style casts on the GEMM."""

    ch_axis = -1  # casts act on the unfolded patch axis
    win_ch_axis = -1
    wout_ch_axis = 0
    has_accum = True
    has_weight = True
    has_bias = True
    sparsifiable = True
    _nd = 1

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size,
        stride=1,
        padding=0,
        dilation=1,
        groups: int = 1,
        bias: bool = True,
        rngs: Optional[nnx.Rngs] = None,
        **kwargs,
    ):
        nd = self._nd
        assert groups == 1, "unfold lowering supports groups=1"
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = _pair(kernel_size, nd)
        self.stride = _pair(stride, nd)
        self.padding = _pair(padding, nd)
        self.dilation = _pair(dilation, nd)
        self.groups = groups
        self.has_bias = bias
        super().__init__(**kwargs)
        key = rngs.params() if rngs is not None else jax.random.key(0)
        k1, k2 = jax.random.split(key)
        fan_in = in_channels * int(np.prod(self.kernel_size))
        # weight stored GEMM-shaped: [out, in * prod(k)]
        self.weight = nnx.Param(_init_weight(k1, (out_channels, fan_in), fan_in))
        self.bias = nnx.Param(_init_weight(k2, (out_channels,), fan_in)) if bias else None
        self.input_casts["input_cast"].block_dim = -1
        self.weight_cast.block_dim = -1

    def _out_spatial(self, in_sp):
        return tuple(
            (s + 2 * p - d * (k - 1) - 1) // st + 1
            for s, p, d, k, st in zip(
                in_sp, self.padding, self.dilation, self.kernel_size, self.stride
            )
        )

    def __call__(self, input, *args, **kwargs):
        """Unfold outside the cast pipeline: casts see the GEMM operands,
        exactly like the reference's unfold modules route casts around the
        matmul (experimental.py:8-126)."""
        _dtype = input.dtype
        B = input.shape[0]
        in_sp = input.shape[2:]
        patches = _im2col(
            input, self.kernel_size, self.stride, self.padding, self.dilation
        )  # [B, C*prod(k), L]
        x = patches.transpose(0, 2, 1)  # [B, L, C*prod(k)]
        _x, _, _ = self.input_casts(x)
        if isinstance(self.accum_format, Same):
            y = _x @ self._weight.T.astype(_x.dtype)
        else:
            y = self.accum_cast(_x @ self._weight.T)
        if self.bias is not None:
            y = y + self._bias.astype(y.dtype)
        y = self.output_casts(y, output=True)
        out_sp = self._out_spatial(in_sp)
        y = y.transpose(0, 2, 1).reshape(B, self.out_channels, *out_sp)
        return y.astype(_dtype)

    def _flops_for(self, input_shape, output_shape):
        return int(np.prod(output_shape)) * self.in_channels * int(
            np.prod(self.kernel_size)
        )

    @classmethod
    def from_conv(cls, conv: _ConvNd):
        """Re-lower a standard Dmx conv into the unfold form (weights
        reshaped to GEMM layout)."""
        mod = cls(
            conv.in_channels,
            conv.out_channels,
            conv.kernel_size,
            stride=conv.stride,
            padding=conv.padding,
            dilation=conv.dilation,
            bias=conv.bias is not None,
        )
        mod.weight.value = conv.weight.value.reshape(conv.out_channels, -1)
        if conv.bias is not None:
            mod.bias.value = conv.bias.value
        return mod

    @classmethod
    def from_raw(cls, raw):
        conv_cls = {1: __import__("dmx_compressor_tpu.nn.modules", fromlist=["Conv1d"]).Conv1d,
                    2: __import__("dmx_compressor_tpu.nn.modules", fromlist=["Conv2d"]).Conv2d}[cls._nd]
        return cls.from_conv(conv_cls.from_raw(raw))


class Conv1dUnfold(_UnfoldConvBase):
    """conv1d as unfold + matmul (reference experimental.py:8-126; the
    Whisper conv lowering)."""

    _nd = 1


class Conv2dUnfold(_UnfoldConvBase):
    """conv2d as im2col + matmul (reference experimental.py:316-459; the
    CLIP patch-embed lowering)."""

    _nd = 2


class Conv1dScatter(Conv1dUnfold):
    """conv1d as per-tap matmuls with scatter-style accumulation (reference
    experimental.py:127-315).

    Instead of materializing im2col patches and contracting once, each
    kernel tap contributes a strided input slice x_k through its own
    channel-matmul, and the tap partials accumulate into the output — the
    scatter formulation's dataflow.  Products are identical to the unfold
    lowering; only the f32 accumulation order differs (per-tap partial sums
    vs a single contraction), verified in tests/test_experimental.py.  Cast
    topology matches the unfold module (input cast on the tap-major patch
    rows, weight cast on the GEMM-shaped weight).
    """

    def __call__(self, input, *args, **kwargs):
        _dtype = input.dtype
        B, C, T = input.shape
        (k,) = self.kernel_size
        (s,) = self.stride
        (p,) = self.padding
        (d,) = self.dilation
        (L,) = self._out_spatial((T,))
        xp = jnp.pad(input, ((0, 0), (0, 0), (p, p)))
        # channel-major patch rows [B, L, C*k] (identical element order and
        # hence identical cast blocks to the unfold lowering)
        taps = [
            jax.lax.slice_in_dim(xp, j * d, j * d + (L - 1) * s + 1, s, axis=2)
            for j in range(k)
        ]  # each [B, C, L]
        x = jnp.stack(taps, axis=2).transpose(0, 3, 1, 2).reshape(B, L, C * k)
        _x, _, _ = self.input_casts(x)
        _w = self._weight.reshape(self.out_channels, C, k)
        _xt = _x.reshape(B, L, C, k)
        y = None
        for j in range(k):  # scatter-accumulate tap partials
            part = jnp.einsum(
                "blc,oc->blo", _xt[..., j].astype(jnp.float32),
                _w[..., j].astype(jnp.float32),
            )
            y = part if y is None else y + part
        if not isinstance(self.accum_format, Same):
            y = self.accum_cast(y)
        if self.bias is not None:
            y = y + self._bias.astype(y.dtype)
        y = self.output_casts(y, output=True)
        return y.transpose(0, 2, 1).astype(_dtype)


class Conv2dGather(Conv2dUnfold):
    """conv2d as explicit index-gather + matmul (reference
    experimental.py:460+).

    The patch rows are fetched with a precomputed flat spatial index table
    (one gather) instead of ``conv_general_dilated_patches`` — the gather
    formulation's dataflow, identical element ordering, so outputs are
    bit-equal to the unfold lowering (tests/test_experimental.py)."""

    def __call__(self, input, *args, **kwargs):
        _dtype = input.dtype
        B, C = input.shape[:2]
        in_sp = input.shape[2:]
        (kh, kw) = self.kernel_size
        (sh, sw) = self.stride
        (ph, pw) = self.padding
        (dh, dw) = self.dilation
        Ho, Wo = self._out_spatial(in_sp)
        xp = jnp.pad(input, ((0, 0), (0, 0), (ph, ph), (pw, pw)))
        Hp, Wp = xp.shape[2:]
        oy = (jnp.arange(Ho) * sh)[:, None, None, None]
        ox = (jnp.arange(Wo) * sw)[None, :, None, None]
        ky = (jnp.arange(kh) * dh)[None, None, :, None]
        kx = (jnp.arange(kw) * dw)[None, None, None, :]
        idx = ((oy + ky) * Wp + (ox + kx)).reshape(Ho * Wo, kh * kw)
        patches = jnp.take(
            xp.reshape(B, C, Hp * Wp), idx.reshape(-1), axis=2
        ).reshape(B, C, Ho * Wo, kh * kw)
        # [B, L, C*kh*kw], channel-major like _im2col
        x = patches.transpose(0, 2, 1, 3).reshape(B, Ho * Wo, C * kh * kw)
        _x, _, _ = self.input_casts(x)
        if isinstance(self.accum_format, Same):
            y = _x @ self._weight.T.astype(_x.dtype)
        else:
            y = self.accum_cast(_x @ self._weight.T)
        if self.bias is not None:
            y = y + self._bias.astype(y.dtype)
        y = self.output_casts(y, output=True)
        y = y.transpose(0, 2, 1).reshape(B, self.out_channels, Ho, Wo)
        return y.astype(_dtype)
