"""The Dmx op-module zoo.

TPU-native re-design of the reference module zoo
(reference: src/dmx/compressor/modeling/nn/torch_modules.py and
custom_modules.py).  Every module follows the DmxModule pipeline (nn/core.py)
and declares its cast topology (channel axes, block dims) matching the
reference:

- Linear: input/weight block_dim = -1 (input channels), weight layout
  [out, in] (torch convention, so reference configs and checkpoints map 1:1;
  XLA contracts the right dimensions without materializing transposes).
- Conv*: channel axis 1 (NCHW interface), weight [out, in/groups, *k].
- ActActMatMul: input block_dim -1, multiplier block_dim -2.

Modules are nnx Modules; parameters are nnx.Param; approximation-capable ops
route through approx_forward (value-replacement with exact gradients).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..numerics.cast import CastTo, CastToDict
from ..numerics.format import Same
from .core import DmxModule

Array = jax.Array


def _init_weight(key, shape, fan_in):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 1.0
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


# ---------------------------------------------------------------------------
# elementwise / binary ops
# ---------------------------------------------------------------------------


class ResAdd(DmxModule):
    """Residual addition with separate input/residual casts
    (reference torch_modules.py:15-64)."""

    input_cast_names = ("input_cast", "residual_cast")

    def _forward(self, _input, _residual):
        return _input + _residual

    @classmethod
    def from_raw(cls, raw=None):
        return cls()


class Mul(DmxModule):
    """Elementwise multiply (reference torch_modules.py:67-105)."""

    input_cast_names = ("input_cast", "multiplier_cast")

    def _forward(self, _input, _multiplier):
        return _input * _multiplier

    @classmethod
    def from_raw(cls, raw=None):
        return cls()


class ActActMatMul(DmxModule):
    """Activation x activation matmul (reference torch_modules.py:194-233):
    input blocks along -1, multiplier blocks along -2 (the contraction dim)."""

    input_cast_names = ("input_cast", "multiplier_cast")

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.input_casts["input_cast"].block_dim = -1
        self.input_casts["multiplier_cast"].block_dim = -2

    def _forward(self, _input, _multiplier):
        return jnp.matmul(_input, _multiplier)

    @classmethod
    def from_raw(cls, raw=None):
        return cls()


class Exp(DmxModule):
    """Elementwise exp with approximation hook (reference
    torch_modules.py:236-264)."""

    def _raw_forward(self, _input):
        return jnp.exp(_input)

    def _forward(self, _input):
        return self.approx_forward((_input,))

    @classmethod
    def from_raw(cls, raw=None):
        return cls()


class BAddBMM(DmxModule):
    """batch add-matmul: input + batch1 @ batch2 (reference
    torch_modules.py:267-311)."""

    input_cast_names = ("input_cast", "batch1_cast", "batch2_cast")

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.input_casts["batch1_cast"].block_dim = -1
        self.input_casts["batch2_cast"].block_dim = -2

    def _forward(self, _input, batch1, batch2, beta=1, alpha=1):
        return beta * _input + alpha * jnp.matmul(batch1, batch2)

    @classmethod
    def from_raw(cls, raw=None):
        return cls()


# ---------------------------------------------------------------------------
# parametered matmul ops
# ---------------------------------------------------------------------------


class Linear(DmxModule):
    """Quantized linear: y = x @ W.T + b (reference torch_modules.py:314-441).

    Weight layout [out_features, in_features]; input/weight casts block along
    the last (input-channel) axis; accumulator cast splits the fused path.
    """

    ch_axis = -1
    win_ch_axis = -1
    wout_ch_axis = 0
    has_accum = True
    has_weight = True
    has_bias = True
    sparsifiable = True

    def __init__(
        self,
        in_features: int,
        out_features: int,
        bias: bool = True,
        rngs: Optional[nnx.Rngs] = None,
        **kwargs,
    ):
        self.in_features = in_features
        self.out_features = out_features
        self.has_bias = bias
        super().__init__(**kwargs)
        key = rngs.params() if rngs is not None else jax.random.key(0)
        k1, k2 = jax.random.split(key)
        self.weight = nnx.Param(_init_weight(k1, (out_features, in_features), in_features))
        self.bias = (
            nnx.Param(_init_weight(k2, (out_features,), in_features)) if bias else None
        )
        self.input_casts["input_cast"].block_dim = -1
        self.weight_cast.block_dim = -1
        if self.bias_cast is not None:
            self.bias_cast.block_dim = -1

    def _forward(self, _input):
        if isinstance(self.accum_format, Same):
            _weight = self._weight.astype(_input.dtype)
            _output = _input @ _weight.T
            if self.bias is not None:
                _output = _output + self._bias.astype(_input.dtype)
        else:
            _weight = self._weight
            _product = self.accum_cast(_input.astype(_weight.dtype) @ _weight.T)
            if self.bias is not None:
                _output = _product + self._bias
            else:
                _output = _product
        return _output

    def _flops_for(self, input_shape, output_shape):
        return int(np.prod(input_shape)) * self.out_features

    @classmethod
    def from_raw(cls, raw) -> "Linear":
        """Build from an nnx.Linear (kernel [in, out]) sharing its params."""
        kernel = raw.kernel.value
        use_bias = getattr(raw, "bias", None) is not None and raw.bias.value is not None
        mod = cls(kernel.shape[0], kernel.shape[1], bias=use_bias)
        mod.weight.value = kernel.T
        if use_bias:
            mod.bias.value = raw.bias.value
        return mod

    @classmethod
    def from_tied(cls, raw) -> "Linear":
        """Build from rawnn.TiedLinear: the weight Param IS the embedding
        table (shared object), so embedding and head stay tied through
        configuration and folding."""
        e = raw.embed_ref
        param = getattr(e, "embedding", None) or getattr(e, "weight")
        V, D = param.value.shape
        mod = cls(D, V, bias=False)
        mod.weight = param  # pointer tying
        return mod


class Embedding(DmxModule):
    """Quantized embedding lookup (reference torch_modules.py:444-529)."""

    has_weight = True
    wout_ch_axis = 0
    sparsifiable = True

    def __init__(
        self,
        num_embeddings: int,
        embedding_dim: int,
        rngs: Optional[nnx.Rngs] = None,
        **kwargs,
    ):
        self.num_embeddings = num_embeddings
        self.embedding_dim = embedding_dim
        super().__init__(**kwargs)
        key = rngs.params() if rngs is not None else jax.random.key(0)
        self.weight = nnx.Param(jax.random.normal(key, (num_embeddings, embedding_dim)))
        self.align_boundary_dtype = False  # (reference torch_modules.py:467)

    def _forward(self, _input):
        return jnp.take(self._weight, _input, axis=0)

    def __call__(self, input, *args, **kwargs):
        # integer input: skip input casting entirely
        _output = self._forward(input)
        return self.output_casts(_output, output=True)

    @classmethod
    def from_raw(cls, raw) -> "Embedding":
        mod = cls(*raw.embedding.value.shape)
        mod.weight = raw.embedding  # share the Param (keeps tied heads tied)
        return mod


# ---------------------------------------------------------------------------
# convolutions (NCHW interface, torch weight layout)
# ---------------------------------------------------------------------------


def _pair(v, n):
    return tuple(v) if isinstance(v, (tuple, list)) else (v,) * n


class _ConvNd(DmxModule):
    ch_axis = 1
    win_ch_axis = 1
    wout_ch_axis = 0
    has_accum = True
    has_weight = True
    has_bias = True
    sparsifiable = True
    _nd = 2

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
        fan_in = in_channels // groups * int(np.prod(self.kernel_size))
        self.weight = nnx.Param(
            _init_weight(k1, (out_channels, in_channels // groups, *self.kernel_size), fan_in)
        )
        self.bias = nnx.Param(_init_weight(k2, (out_channels,), fan_in)) if bias else None
        self.input_casts["input_cast"].block_dim = 1
        self.weight_cast.block_dim = 1
        self.input_casts["input_cast"].ch_axis = 1
        if self.bias_cast is not None:
            self.bias_cast.block_dim = -1
        # calling convention of the raw module this one replaces: the internal
        # pipeline (casts with ch_axis=1, lax conv) is always NCHW; modules
        # substituted for nnx.Conv (NHWC) adapt at the boundary
        self.data_format = "NCHW"

    def __call__(self, input, *args, **kwargs):
        if self.data_format == "NHWC":
            input = jnp.moveaxis(input, -1, 1)
        out = super().__call__(input, *args, **kwargs)
        if self.data_format == "NHWC":
            out = jnp.moveaxis(out, 1, -1)
        return out

    def _conv(self, x, w):
        nd = self._nd
        spec = ("NCH", "OIH", "NCH") if nd == 1 else ("NCHW", "OIHW", "NCHW")
        return jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=self.stride,
            padding=[(p, p) for p in self.padding],
            rhs_dilation=self.dilation,
            dimension_numbers=spec,
            feature_group_count=self.groups,
            preferred_element_type=jnp.float32,
        )

    def _forward(self, _input):
        if isinstance(self.accum_format, Same):
            _weight = self._weight.astype(_input.dtype)
            _output = self._conv(_input, _weight)
        else:
            _output = self.accum_cast(self._conv(_input, self._weight))
        if self.bias is not None:
            b = self._bias.reshape((1, -1) + (1,) * self._nd)
            _output = _output + b.astype(_output.dtype)
        return _output

    def unfold_input_for_hessian(self, inp):
        """im2col for GPTQ Hessian accumulation (reference
        layer_reconstruction.py:249-259)."""
        patches = _im2col(inp, self.kernel_size, self.stride, self.padding, self.dilation)
        # [B, C*prod(k), L] -> [C*prod(k), B*L]
        return patches.transpose(1, 0, 2).reshape(patches.shape[1], -1)

    def _flops_for(self, input_shape, output_shape):
        out_spatial = int(np.prod(output_shape[2:]))
        per_pos = int(np.prod(self.kernel_size)) * self.in_channels * (
            self.out_channels // self.groups
        )
        return per_pos * input_shape[0] * out_spatial

    @classmethod
    def from_raw(cls, raw) -> "_ConvNd":
        """Build from nnx.Conv (kernel [*k, in/g, out], NHWC convention)."""
        kernel = raw.kernel.value
        nd = kernel.ndim - 2
        out_ch = kernel.shape[-1]
        in_ch = kernel.shape[-2] * raw.feature_group_count
        ks = kernel.shape[:-2]
        pad = raw.padding
        if isinstance(pad, str):
            assert pad in ("SAME", "VALID")
            pad = 0 if pad == "VALID" else tuple((k - 1) // 2 for k in ks)
        elif isinstance(pad, (list, tuple)) and pad and isinstance(pad[0], (list, tuple)):
            pad = tuple(p[0] for p in pad)
        mod = cls(
            in_ch,
            out_ch,
            ks,
            stride=raw.strides,
            padding=pad,
            dilation=raw.kernel_dilation,
            groups=raw.feature_group_count,
            bias=getattr(raw, "bias", None) is not None and raw.bias.value is not None,
        )
        # [*k, in/g, out] -> [out, in/g, *k]
        perm = (nd + 1, nd) + tuple(range(nd))
        mod.weight.value = kernel.transpose(perm)
        if mod.bias is not None:
            mod.bias.value = raw.bias.value
        mod.data_format = "NHWC"  # nnx.Conv call convention
        return mod


class Conv1d(_ConvNd):
    """Quantized 1d convolution (reference torch_modules.py:532-621)."""

    _nd = 1


class Conv2d(_ConvNd):
    """Quantized 2d convolution (reference torch_modules.py:624-713)."""

    _nd = 2


class ConvTranspose2d(_ConvNd):
    """Quantized transposed 2d convolution (reference
    torch_modules.py:716-826)."""

    _nd = 2

    def __init__(self, *args, output_padding=0, **kwargs):
        self.output_padding = _pair(output_padding, 2)
        super().__init__(*args, **kwargs)

    def _conv(self, x, w):
        # torch ConvTranspose2d: weight [in, out/groups, kH, kW]
        kh, kw = self.kernel_size
        ph, pw = self.padding
        oph, opw = self.output_padding
        pads = [
            (kh - 1 - ph, kh - 1 - ph + oph),
            (kw - 1 - pw, kw - 1 - pw + opw),
        ]
        return jax.lax.conv_general_dilated(
            x,
            jnp.flip(w, (-2, -1)).swapaxes(0, 1),
            window_strides=(1, 1),
            padding=pads,
            lhs_dilation=self.stride,
            rhs_dilation=self.dilation,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=self.groups,
            preferred_element_type=jnp.float32,
        )


def _im2col(x, kernel_size, stride, padding, dilation):
    """Extract sliding patches: [B, C, *sp] -> [B, C*prod(k), L]."""
    nd = len(kernel_size)
    x = jnp.pad(
        x, [(0, 0), (0, 0)] + [(p, p) for p in padding]
    )
    # build patch gather via conv trick: use lax.conv_general_dilated_patches
    patches = jax.lax.conv_general_dilated_patches(
        x,
        filter_shape=kernel_size,
        window_strides=stride,
        padding=[(0, 0)] * nd,
        rhs_dilation=dilation,
        dimension_numbers=("NCHW"[: nd + 2], "OIHW"[: nd + 2], "NCHW"[: nd + 2]),
    )
    # [B, C*prod(k), *out_sp] -> [B, C*prod(k), L]
    return patches.reshape(patches.shape[0], patches.shape[1], -1)


# ---------------------------------------------------------------------------
# pooling
# ---------------------------------------------------------------------------


class MaxPool2d(DmxModule):
    """(reference torch_modules.py:905-967)"""

    def __init__(self, kernel_size, stride=None, padding=0, **kwargs):
        self.kernel_size = _pair(kernel_size, 2)
        self.stride = _pair(stride if stride is not None else kernel_size, 2)
        self.padding = _pair(padding, 2)
        super().__init__(**kwargs)

    def _forward(self, _input):
        return jax.lax.reduce_window(
            _input,
            -jnp.inf,
            jax.lax.max,
            (1, 1) + self.kernel_size,
            (1, 1) + self.stride,
            [(0, 0), (0, 0)] + [(p, p) for p in self.padding],
        )

    @classmethod
    def from_raw(cls, raw):
        return cls(raw.kernel_size, raw.stride, raw.padding)


class AvgPool2d(DmxModule):
    """(reference torch_modules.py:867-902)"""

    def __init__(self, kernel_size, stride=None, padding=0, **kwargs):
        self.kernel_size = _pair(kernel_size, 2)
        self.stride = _pair(stride if stride is not None else kernel_size, 2)
        self.padding = _pair(padding, 2)
        super().__init__(**kwargs)

    def _forward(self, _input):
        s = jax.lax.reduce_window(
            _input,
            0.0,
            jax.lax.add,
            (1, 1) + self.kernel_size,
            (1, 1) + self.stride,
            [(0, 0), (0, 0)] + [(p, p) for p in self.padding],
        )
        return s / float(np.prod(self.kernel_size))

    @classmethod
    def from_raw(cls, raw):
        return cls(raw.kernel_size, raw.stride, raw.padding)


class AdaptiveAvgPool2d(DmxModule):
    """(reference torch_modules.py:829-864)"""

    def __init__(self, output_size, **kwargs):
        self.output_size = _pair(output_size, 2)
        super().__init__(**kwargs)

    def _forward(self, _input):
        B, C, H, W = _input.shape
        oh, ow = self.output_size
        if H % oh == 0 and W % ow == 0:
            x = _input.reshape(B, C, oh, H // oh, ow, W // ow)
            return x.mean(axis=(3, 5))
        # general case: mean over adaptive windows
        out = jnp.zeros((B, C, oh, ow), _input.dtype)
        for i in range(oh):
            h0, h1 = (i * H) // oh, -(-((i + 1) * H) // oh)
            for j in range(ow):
                w0, w1 = (j * W) // ow, -(-((j + 1) * W) // ow)
                out = out.at[:, :, i, j].set(
                    _input[:, :, h0:h1, w0:w1].mean(axis=(2, 3))
                )
        return out

    @classmethod
    def from_raw(cls, raw):
        return cls(raw.output_size)


# ---------------------------------------------------------------------------
# nonlinearities
# ---------------------------------------------------------------------------


class _Activation(DmxModule):
    """Shared structure for unary activations with approximation hooks."""

    def _raw_forward(self, _input):
        raise NotImplementedError

    def _forward(self, _input):
        return self.approx_forward((_input,))

    @classmethod
    def from_raw(cls, raw=None):
        return cls()


class ReLU(_Activation):
    def _raw_forward(self, x):
        return jax.nn.relu(x)


class ReLU6(_Activation):
    def _raw_forward(self, x):
        return jnp.clip(x, 0.0, 6.0)


class SiLU(_Activation):
    def _raw_forward(self, x):
        return jax.nn.silu(x)


class Tanh(_Activation):
    def _raw_forward(self, x):
        return jnp.tanh(x)


class GELUBase(_Activation):
    """Base for all GELU flavors (reference torch_modules.py:1675-1731,
    custom_modules.py:96-139)."""

    approximate: str = "none"

    def _raw_forward(self, x):
        return jax.nn.gelu(x, approximate=self.approximate == "tanh")


class GELU(GELUBase):
    def __init__(self, approximate: str = "none", **kwargs):
        self.approximate = approximate
        super().__init__(**kwargs)

    @classmethod
    def from_raw(cls, raw=None):
        return cls(approximate=getattr(raw, "approximate", "none"))


class NewGELU(GELUBase):
    approximate = "tanh"


class FastGELU(GELUBase):
    def _raw_forward(self, x):
        return 0.5 * x * (1.0 + jnp.tanh(x * 0.7978845608 * (1.0 + 0.044715 * x * x)))


class QuickGELU(GELUBase):
    def _raw_forward(self, x):
        return x * jax.nn.sigmoid(1.702 * x)


class BloomGELU(GELUBase):
    approximate = "tanh"


class ClippedGELU(GELUBase):
    def __init__(self, min=-10, max=10, **kwargs):
        self.min, self.max = min, max
        super().__init__(**kwargs)

    def _raw_forward(self, x):
        return jnp.clip(jax.nn.gelu(x), self.min, self.max)

    @classmethod
    def from_raw(cls, raw=None):
        if raw is not None and hasattr(raw, "min"):
            return cls(raw.min, raw.max)
        return cls()


class Softmax(DmxModule):
    """Softmax with input-clamp approximator wrapper (reference
    torch_modules.py:970-1036)."""

    def __init__(self, dim: int = -1, **kwargs):
        self.dim = dim
        super().__init__(**kwargs)

    def approximator_wrapper(self, inputs, approx_args, approx_kwargs, **wrapper_kwargs):
        if "input_clamp" in wrapper_kwargs:
            inputs = [jnp.maximum(x, wrapper_kwargs["input_clamp"]) for x in inputs]
        return self.approximator(*inputs, *approx_args, **approx_kwargs)

    def _raw_forward(self, _input, dim=-1):
        return jax.nn.softmax(_input, axis=dim)

    def functional_forward(self, _input, dim=-1):
        return jax.nn.softmax(_input, axis=dim)

    def _forward(self, _input):
        return self.approx_forward((_input,), dim=self.dim)

    @classmethod
    def from_raw(cls, raw=None):
        return cls(dim=getattr(raw, "dim", -1))


class Dropout(DmxModule):
    """(reference torch_modules.py:1379-1439)"""

    def __init__(self, p: float = 0.0, **kwargs):
        self.p = p
        self.deterministic = True
        super().__init__(**kwargs)

    def _forward(self, _input, key: Optional[Array] = None):
        if self.deterministic or self.p == 0.0:
            return _input
        key = key if key is not None else jax.random.key(0)
        keep = jax.random.bernoulli(key, 1.0 - self.p, _input.shape)
        return jnp.where(keep, _input / (1.0 - self.p), 0.0)

    @classmethod
    def from_raw(cls, raw=None):
        p = getattr(raw, "rate", getattr(raw, "p", 0.0))
        return cls(p=p)


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------


class LayerNorm(DmxModule):
    """LayerNorm with tile_size approximator wrapper (reference
    torch_modules.py:1039-1141)."""

    has_weight = True
    has_bias = True

    def __init__(
        self,
        normalized_shape: Union[int, Sequence[int]],
        eps: float = 1e-5,
        elementwise_affine: bool = True,
        **kwargs,
    ):
        if isinstance(normalized_shape, int):
            normalized_shape = (normalized_shape,)
        self.normalized_shape = tuple(normalized_shape)
        self.eps = eps
        self.elementwise_affine = elementwise_affine
        self.has_weight = elementwise_affine
        self.has_bias = elementwise_affine
        super().__init__(**kwargs)
        if elementwise_affine:
            self.weight = nnx.Param(jnp.ones(self.normalized_shape))
            self.bias = nnx.Param(jnp.zeros(self.normalized_shape))
        else:
            self.weight = None
            self.bias = None

    def approximator_wrapper(self, inputs, approx_args, approx_kwargs, **wrapper_kwargs):
        if "tile_size" in wrapper_kwargs:
            approx_kwargs = dict(approx_kwargs)
            approx_kwargs["tile_size"] = wrapper_kwargs["tile_size"]
        return self.approximator(*inputs, *approx_args, **approx_kwargs)

    def functional_forward(self, x, normalized_shape, weight, bias, eps):
        axes = tuple(range(x.ndim - len(normalized_shape), x.ndim))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + eps)
        if weight is not None:
            y = y * weight.astype(jnp.float32)
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        return y.astype(x.dtype)

    def _forward(self, _input):
        w = self._weight if self.weight is not None else None
        b = self._bias if self.bias is not None else None
        return self.approx_forward((_input,), self.normalized_shape, w, b, self.eps)

    @classmethod
    def from_raw(cls, raw) -> "LayerNorm":
        affine = getattr(raw, "use_scale", True)
        shape = raw.scale.value.shape if affine and raw.scale is not None else None
        if shape is None:
            shape = (raw.num_features,) if hasattr(raw, "num_features") else ()
        mod = cls(shape, eps=raw.epsilon, elementwise_affine=affine)
        if affine and raw.scale is not None:
            mod.weight.value = raw.scale.value
            if getattr(raw, "use_bias", True) and raw.bias is not None:
                mod.bias.value = raw.bias.value
            else:
                mod.bias.value = jnp.zeros_like(mod.bias.value)
        return mod


class RMSNorm(DmxModule):
    """(reference torch_modules.py:1144-1219)"""

    has_weight = True

    def __init__(self, normalized_shape: int, eps: float = 1e-6, **kwargs):
        if isinstance(normalized_shape, int):
            normalized_shape = (normalized_shape,)
        self.normalized_shape = tuple(normalized_shape)
        self.eps = eps
        super().__init__(**kwargs)
        self.weight = nnx.Param(jnp.ones(self.normalized_shape))

    def functional_forward(self, x, normalized_shape, weight, eps):
        xf = x.astype(jnp.float32)
        ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(ms + eps)
        if weight is not None:
            y = y * weight.astype(jnp.float32)
        return y.astype(x.dtype)

    def _forward(self, _input):
        return self.approx_forward(
            (_input,), self.normalized_shape, self._weight, self.eps
        )

    @classmethod
    def from_raw(cls, raw) -> "RMSNorm":
        # accepts nnx.RMSNorm (.scale/.epsilon) or rawnn.RMSNorm (.weight/.eps)
        param = getattr(raw, "scale", None) or raw.weight
        scale = param.value
        eps = getattr(raw, "epsilon", None) or raw.eps
        mod = cls(scale.shape[-1], eps=eps)
        mod.weight.value = scale
        return mod


class GemmaRMSNorm(RMSNorm):
    """(1 + weight) RMSNorm variant (reference custom_modules.py:14-93)."""

    def __init__(self, normalized_shape: int, eps: float = 1e-6, **kwargs):
        super().__init__(normalized_shape, eps=eps, **kwargs)
        self.weight.value = jnp.zeros(self.normalized_shape)

    @classmethod
    def from_raw(cls, raw) -> "GemmaRMSNorm":
        param = getattr(raw, "scale", None) or raw.weight
        eps = getattr(raw, "epsilon", None) or raw.eps
        mod = cls(param.value.shape[-1], eps=eps)
        mod.weight.value = param.value
        return mod

    def functional_forward(self, x, normalized_shape, weight, eps):
        xf = x.astype(jnp.float32)
        ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(ms + eps)
        if weight is not None:
            y = y * (1.0 + weight.astype(jnp.float32))
        return y.astype(x.dtype)

    def approximator_wrapper(self, inputs, approx_args, approx_kwargs,
                             **wrapper_kwargs):
        # the RMS_NORM[vsimd] surrogate multiplies by its weight argument
        # directly; Gemma's semantics are (1 + weight) — without this
        # adjustment a BASIC-configured GemmaRMSNorm (weights init at 0)
        # scales its output by ~0.  The exact branch (functional_forward)
        # keeps the raw weight and adds 1 internally, matching the cast
        # order: hypernet-cast w, then 1 + w.
        normalized_shape, weight, eps = approx_args
        if weight is not None:
            weight = 1.0 + weight.astype(jnp.float32)
        return self.approximator(
            *inputs, normalized_shape, weight, eps, **approx_kwargs
        )


class BatchNorm2d(DmxModule):
    """BatchNorm with full train/eval running-stat logic
    (reference torch_modules.py:1222-1307)."""

    has_weight = True
    has_bias = True

    def __init__(
        self,
        num_features: int,
        eps: float = 1e-5,
        momentum: float = 0.1,
        affine: bool = True,
        track_running_stats: bool = True,
        **kwargs,
    ):
        self.num_features = num_features
        self.eps = eps
        self.momentum = momentum
        self.affine = affine
        self.has_weight = affine
        self.has_bias = affine
        self.track_running_stats = track_running_stats
        self.training = False
        super().__init__(**kwargs)
        if affine:
            self.weight = nnx.Param(jnp.ones((num_features,)))
            self.bias = nnx.Param(jnp.zeros((num_features,)))
        else:
            self.weight = None
            self.bias = None
        if track_running_stats:
            self.running_mean = nnx.BatchStat(jnp.zeros((num_features,)))
            self.running_var = nnx.BatchStat(jnp.ones((num_features,)))
            self.num_batches_tracked = nnx.BatchStat(jnp.zeros((), jnp.int32))
        else:
            self.running_mean = None
            self.running_var = None

    def _forward(self, _input):
        x = _input
        use_batch_stats = self.training or not self.track_running_stats
        if use_batch_stats:
            axes = (0, 2, 3)
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
            if self.training and self.track_running_stats:
                n = x.shape[0] * x.shape[2] * x.shape[3]
                unbiased = var * n / max(n - 1, 1)
                m = self.momentum
                self.running_mean.value = (1 - m) * self.running_mean.value + m * mean
                self.running_var.value = (1 - m) * self.running_var.value + m * unbiased
                self.num_batches_tracked.value = self.num_batches_tracked.value + 1
        else:
            mean = self.running_mean.value
            var = self.running_var.value
        shape = (1, -1, 1, 1)
        y = (x - mean.reshape(shape)) * jax.lax.rsqrt(var.reshape(shape) + self.eps)
        if self.affine:
            y = y * self._weight.reshape(shape) + self._bias.reshape(shape)
        return y

    @classmethod
    def from_raw(cls, raw) -> "BatchNorm2d":
        n = raw.mean.value.shape[-1] if raw.mean is not None else raw.num_features
        mod = cls(n, eps=raw.epsilon, momentum=1 - raw.momentum)
        if getattr(raw, "scale", None) is not None:
            mod.weight.value = raw.scale.value
            mod.bias.value = raw.bias.value
        if raw.mean is not None:
            mod.running_mean.value = raw.mean.value
            mod.running_var.value = raw.var.value
        return mod


class GroupNorm(DmxModule):
    """(reference torch_modules.py:1310-1376)"""

    has_weight = True
    has_bias = True

    def __init__(
        self,
        num_groups: int,
        num_channels: int,
        eps: float = 1e-5,
        affine: bool = True,
        **kwargs,
    ):
        self.num_groups = num_groups
        self.num_channels = num_channels
        self.eps = eps
        self.affine = affine
        self.has_weight = affine
        self.has_bias = affine
        super().__init__(**kwargs)
        if affine:
            self.weight = nnx.Param(jnp.ones((num_channels,)))
            self.bias = nnx.Param(jnp.zeros((num_channels,)))
        else:
            self.weight = None
            self.bias = None

    def _forward(self, _input):
        x = _input
        B, C = x.shape[0], x.shape[1]
        g = self.num_groups
        xg = x.reshape(B, g, C // g, *x.shape[2:])
        axes = tuple(range(2, xg.ndim))
        mean = jnp.mean(xg, axis=axes, keepdims=True)
        var = jnp.var(xg, axis=axes, keepdims=True)
        y = ((xg - mean) * jax.lax.rsqrt(var + self.eps)).reshape(x.shape)
        if self.affine:
            shape = (1, C) + (1,) * (x.ndim - 2)
            y = y * self._weight.reshape(shape) + self._bias.reshape(shape)
        return y

    @classmethod
    def from_raw(cls, raw) -> "GroupNorm":
        mod = cls(raw.num_groups, raw.group_size * raw.num_groups, eps=raw.epsilon)
        if getattr(raw, "scale", None) is not None:
            mod.weight.value = raw.scale.value.ravel()
            mod.bias.value = raw.bias.value.ravel()
        return mod


# ---------------------------------------------------------------------------
# attention & rotary embedding
# ---------------------------------------------------------------------------


class ScaledDotProductAttention(DmxModule):
    """Compound SDPA decomposed into quantizable sub-ops
    (reference torch_modules.py:108-191): actmatmul -> resadd(bias) ->
    mul(scale) -> softmax -> dropout -> actmatmul, with q/k/v/mask casts."""

    is_compound = True
    input_cast_names = (
        "query_states_cast",
        "key_states_cast",
        "value_states_cast",
        "attn_mask_cast",
    )

    def __init__(self, dropout_p: float = 0.0, **kwargs):
        super().__init__(**kwargs)
        for name in self.input_cast_names:
            self.input_casts[name].block_dim = -1
        self.resadd = ResAdd()
        self.actmatmul = ActActMatMul()
        self.softmax = Softmax(dim=-1)
        self.dropout = Dropout(p=dropout_p)
        self.mul = Mul()

    def __call__(
        self,
        query,
        key,
        value,
        attn_mask=None,
        is_causal=False,
        scale=None,
        enable_gqa=False,
    ):
        query = self.input_casts["query_states_cast"](query)
        key = self.input_casts["key_states_cast"](key)
        value = self.input_casts["value_states_cast"](value)
        if attn_mask is not None and jnp.issubdtype(attn_mask.dtype, jnp.floating):
            attn_mask = self.input_casts["attn_mask_cast"](attn_mask)

        L, S = query.shape[-2], key.shape[-2]
        scale_factor = (
            jnp.asarray(1.0 / math.sqrt(query.shape[-1]), jnp.float16)
            if scale is None
            else scale
        )
        attn_bias = jnp.zeros((L, S), query.dtype)
        if is_causal:
            assert attn_mask is None
            causal = jnp.tril(jnp.ones((L, S), bool))
            attn_bias = jnp.where(causal, attn_bias, -10000.0)
        if attn_mask is not None:
            if attn_mask.dtype == jnp.bool_:
                attn_bias = jnp.where(attn_mask, attn_bias, -10000.0)
            else:
                attn_bias = self.resadd(attn_bias, attn_mask)
        if enable_gqa:
            key = jnp.repeat(key, query.shape[-3] // key.shape[-3], axis=-3)
            value = jnp.repeat(value, query.shape[-3] // value.shape[-3], axis=-3)

        attn_weight = self.actmatmul(query, jnp.swapaxes(key, -2, -1))
        attn_weight = self.resadd(attn_weight, attn_bias)
        attn_weight = self.mul(attn_weight, scale_factor)
        attn_weight = self.softmax(attn_weight)
        attn_weight = self.dropout(attn_weight)
        return self.actmatmul(attn_weight, value)

    @classmethod
    def from_raw(cls, raw=None):
        return cls(dropout_p=getattr(raw, "dropout_p", 0.0))


class ApplyRotaryPosEmb(DmxModule):
    """RoPE application with 4-input/2-output casts
    (reference custom_modules.py:142-230)."""

    input_cast_names = ("q_cast", "k_cast", "cos_cast", "sin_cast")
    output_cast_names = ("q_embed_cast", "k_embed_cast")

    def _raw_forward(self, q, k, cos, sin, unsqueeze_dim=1):
        cos_e = jnp.expand_dims(cos, unsqueeze_dim)
        sin_e = jnp.expand_dims(sin, unsqueeze_dim)

        def rotate_half(x):
            x1, x2 = jnp.split(x, 2, axis=-1)
            return jnp.concatenate([-x2, x1], axis=-1)

        q_embed = q * cos_e + rotate_half(q) * sin_e
        k_embed = k * cos_e + rotate_half(k) * sin_e
        return q_embed, k_embed

    def _forward(self, q, k, cos, sin, unsqueeze_dim=1):
        return self.approx_forward((q, k, cos, sin), unsqueeze_dim)

    def __call__(self, q, k, cos, sin, unsqueeze_dim=1):
        q = self.input_casts["q_cast"](q)
        k = self.input_casts["k_cast"](k)
        cos = self.input_casts["cos_cast"](cos)
        sin = self.input_casts["sin_cast"](sin)
        out = self._forward(q, k, cos, sin, unsqueeze_dim)
        return self.output_casts(out, output=True)

    @classmethod
    def from_raw(cls, raw=None):
        return cls()


class RotaryEmbedding(DmxModule):
    """Rotary cos/sin table generator (reference custom_modules.py:240-309)."""

    def __init__(
        self,
        dim: int,
        max_position_embeddings: int = 2048,
        base: float = 10000.0,
        attention_scaling: float = 1.0,
        **kwargs,
    ):
        self.dim = dim
        self.max_position_embeddings = max_position_embeddings
        self.base = base
        self.attention_scaling = attention_scaling
        super().__init__(**kwargs)
        inv_freq = 1.0 / (
            base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
        )
        self.inv_freq = nnx.Variable(inv_freq)

    def _forward(self, x, position_ids):
        inv = self.inv_freq.value
        freqs = position_ids[..., None].astype(jnp.float32) * inv[None, None, :]
        emb = jnp.concatenate([freqs, freqs], axis=-1)
        cos = jnp.cos(emb) * self.attention_scaling
        sin = jnp.sin(emb) * self.attention_scaling
        return cos.astype(x.dtype), sin.astype(x.dtype)

    def __call__(self, x, position_ids):
        out = self._forward(x, position_ids)
        return self.output_casts(out, output=True) if len(self.output_casts) == 2 else out

    @classmethod
    def from_raw(cls, raw=None):
        if raw is None:
            raise ValueError("RotaryEmbedding.from_raw requires a raw module")
        return cls(
            dim=raw.dim,
            max_position_embeddings=getattr(raw, "max_position_embeddings", 2048),
            base=getattr(raw, "base", 10000.0),
            attention_scaling=getattr(raw, "attention_scaling", 1.0),
        )
