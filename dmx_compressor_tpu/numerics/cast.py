"""Fake-quantization cast modules (the per-tensor quantizer state machines).

TPU-native re-design of the reference CastTo / CastToDict
(reference: src/dmx/compressor/numerical/cast.py).  A ``CastTo`` owns a
target :class:`Format`, an observer, and affine qparams (scale / zero-point,
possibly per-channel or per-group).  The forward applies:

    pre_transform -> observer step -> [affine normalize] -> format cast
    -> [affine denormalize] -> cast back to caller dtype

with a straight-through-estimator gradient (reference CastToFormat,
cast.py:20-32): ``x + stop_gradient(cast(x) - x)``.

State layout (nnx):
- ``scale`` / ``zero_point``: :class:`QuantState` variables (like torch
  buffers), so they survive checkpointing and sharding but are not Params.
- config attributes (format, block_dim, group_size, qscheme, flags) are plain
  Python attributes -> static under jit; changing them retraces, which is the
  JAX analogue of the reference's retransform-on-config-change.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp
from flax import nnx

from ..utils.tracing import try_set
from .format import FixedPoint, Format, Same
from .observer import (
    OBSERVERS,
    DummyObserver,
    HistogramObserver,
    MinMaxObserver,
    ObserverBase,
    calculate_qparams_from_min_max,
    is_per_channel,
    is_per_tensor,
)

Array = jax.Array


class QuantState(nnx.Variable):
    """Quantizer affine parameters (scale / zero-point); buffer-like."""


def ste(x: Array, q: Array) -> Array:
    """Straight-through estimator: value of q, gradient of identity."""
    return x + jax.lax.stop_gradient(q - x)


class CastTo(nnx.Module):
    """Simulated numerical cast to a target format (reference cast.py:136-358)."""

    def __init__(
        self,
        format: Union[str, Format] = "SAME",
        observer: Union[str, type] = "dummy",
        group_size: Optional[int] = None,
        block_dim: int = -1,
        ch_axis: int = -1,
        qscheme: str = "per_tensor_affine",
    ):
        self.format = (
            Format.from_shorthand(format) if isinstance(format, str) else format
        )
        self.qscheme = qscheme
        self.ch_axis = ch_axis if ch_axis is not None else -1
        if group_size:
            assert is_per_tensor(qscheme), (
                "group_size must be used with per tensor quantization scheme"
            )
        self.group_size = group_size or None
        self.block_dim = block_dim
        self.fake_quant_enabled = True
        self.observer_enabled = False
        self.pre_transform: Dict[str, Any] = {}
        self.physical_dtype = None
        obs_cls = OBSERVERS[observer] if isinstance(observer, str) else observer
        self.observer = obs_cls(dtype=self.format, qscheme=qscheme, ch_axis=self.ch_axis)
        self.group_observers = nnx.data([])
        self.scale = QuantState(jnp.ones((1,), jnp.float32))
        self.zero_point = QuantState(jnp.zeros((1,), jnp.int32))

    # -- configuration ------------------------------------------------------

    def set_format(self, format: Union[str, Format]) -> None:
        if isinstance(format, str):
            format = Format.from_shorthand(format)
        self.format = format
        self.observer.dtype = format
        from .observer import get_qmin_qmax

        self.observer.quant_min, self.observer.quant_max = get_qmin_qmax(format)

    def set_pre_transform(self, pre_transform: Dict) -> None:
        self.pre_transform = dict(pre_transform)
        fmt = self.pre_transform.get("format")
        if isinstance(fmt, str):
            self.pre_transform["format"] = Format.from_shorthand(fmt)

    def enable_fake_quant(self, enabled: bool = True) -> None:
        self.fake_quant_enabled = enabled

    def disable_fake_quant(self) -> None:
        self.fake_quant_enabled = False

    def enable_observer(self, enabled: bool = True) -> None:
        self.observer_enabled = enabled

    def disable_observer(self) -> None:
        self.observer_enabled = False

    def enable_calibration(
        self,
        state: bool = True,
        observer_cls: type = HistogramObserver,
        qscheme_to_overload: Optional[str] = None,
        group_size: Optional[int] = None,
        ch_axis: Optional[int] = None,
    ) -> None:
        """Swap in a real observer and begin/end calibration
        (reference cast.py:308-340)."""
        if state:
            if ch_axis is not None:
                self.ch_axis = ch_axis
            if qscheme_to_overload is not None:
                self.qscheme = qscheme_to_overload
            self.group_size = group_size or None
            if self.group_size:
                assert is_per_tensor(self.qscheme), (
                    "group quantization is to be used with per tensor quantization"
                )
            self.observer = observer_cls(
                dtype=self.format, qscheme=self.qscheme, ch_axis=self.ch_axis
            )
            self.group_observers = nnx.data([])
            self.disable_fake_quant()
            self.enable_observer()
        else:
            self.enable_fake_quant()
            self.disable_observer()

    # -- observation --------------------------------------------------------

    def _observer_step(self, x: Array) -> None:
        """Streaming qparam estimation (reference cast.py:179-226)."""
        if self.group_size:
            n = x.shape[self.ch_axis]
            group_num = math.ceil(n / self.group_size)
            if len(self.group_observers) != group_num:
                self.group_observers = nnx.data([
                    type(self.observer)(
                        dtype=self.format, qscheme=self.qscheme, ch_axis=self.ch_axis
                    )
                    for _ in range(group_num)
                ])
            scales, zps = [], []
            ax = self.ch_axis % x.ndim
            for i, obs in enumerate(self.group_observers):
                lo = i * self.group_size
                hi = min(lo + self.group_size, n)
                xi = jax.lax.slice_in_dim(x, lo, hi, axis=ax)
                obs(xi)
                s, zp = obs.calculate_qparams()
                scales.append(jnp.ravel(s))
                zps.append(jnp.ravel(zp))
            self.scale.value = jnp.concatenate(scales)
            self.zero_point.value = jnp.concatenate(zps)
        else:
            self.observer(jax.lax.stop_gradient(x).astype(jnp.float32))
            s, zp = self.observer.calculate_qparams()
            self.scale.value = jnp.atleast_1d(s)
            self.zero_point.value = jnp.atleast_1d(zp)

    def _get_affine_params(self, x: Array):
        """Per-channel/group broadcastable scale & zp (reference cast.py:228-237,
        281-292)."""
        sc, zp = self.scale.value, self.zero_point.value
        shape = [1] * x.ndim
        ax = self.ch_axis % x.ndim
        if is_per_channel(self.qscheme):
            n = x.shape[ax]
            sc = sc[:n].reshape([n if i == ax else 1 for i in range(x.ndim)])
            zp = zp[:n].reshape(sc.shape)
        elif self.group_size:
            n = x.shape[ax]
            sc = jnp.repeat(sc, self.group_size)[:n]
            zp = jnp.repeat(zp, self.group_size)[:n]
            shape[ax] = n
            sc = sc.reshape(shape)
            zp = zp.reshape(shape)
        return sc, zp

    # -- shaping pre-transforms (reference cast.py:239-259) -----------------

    @staticmethod
    def _apply_shaping_seq(x: Array, shaping_list):
        reverse = []
        for op, args in shaping_list:
            orig_shape = x.shape
            if op == "view":
                x = x.reshape(*args)
                reverse.append(("view", orig_shape))
            elif op == "permute":
                x = jnp.transpose(x, args)
                inv = sorted(range(len(args)), key=lambda i: args[i])
                reverse.append(("permute", inv))
            elif op == "flatten":
                start = args[0] if args else 0
                end = args[1] if len(args) > 1 else -1
                end = end % x.ndim
                new_shape = (
                    x.shape[:start]
                    + (int(jnp.prod(jnp.array(x.shape[start : end + 1]))),)
                    + x.shape[end + 1 :]
                )
                x = x.reshape(new_shape)
                reverse.append(("view", orig_shape))
            else:
                raise ValueError(f"unknown shape op {op}")
        return x, reverse[::-1]

    # -- forward ------------------------------------------------------------

    def __call__(self, x, key: Optional[Array] = None):
        if x is None or not isinstance(x, (jax.Array, jnp.ndarray)) or not jnp.issubdtype(
            jnp.asarray(x).dtype, jnp.floating
        ):
            return x
        x = jnp.asarray(x)
        physical_dtype = x.dtype
        try_set(self, "physical_dtype", physical_dtype)
        if isinstance(self.format, Same) and not self.pre_transform:
            # true identity: skip the STE add entirely.  ste(x, x) is
            # value- and gradient-identical, but inside a scanned decode body
            # XLA materializes it as a full copy of the operand — for cached
            # KV buffers that is ~134 MB per cast per layer at 2k context
            # (6+ GB of HLO temps, an HBM OOM at OPT-1.3B).
            return x
        reverse_shaping = None
        shortcut_val = None
        if "shaping" in self.pre_transform:
            x, reverse_shaping = self._apply_shaping_seq(x, self.pre_transform["shaping"])
        if "noquant_shortcut" in self.pre_transform:
            shortcut_idx = self.pre_transform["noquant_shortcut"]
            shortcut_val = x[shortcut_idx]
        if "format" in self.pre_transform:
            x = ste(x, self.pre_transform["format"].cast(x, self.block_dim, key=key))
        if self.observer_enabled and not isinstance(self.format, Same):
            self._observer_step(x)
        if self.fake_quant_enabled:
            if isinstance(self.format, FixedPoint):
                sc, zp = self._get_affine_params(x)
                sc = jnp.asarray(sc, x.dtype)
                zp = jnp.asarray(zp, x.dtype)
                y = x / sc + zp
                y = ste(y, self.format.cast(y, self.block_dim, key=key))
                x = (y - zp) * sc
            else:
                x = ste(x, self.format.cast(x, self.block_dim, key=key))
        if shortcut_val is not None:
            x = x.at[self.pre_transform["noquant_shortcut"]].set(shortcut_val)
        if reverse_shaping is not None:
            x, _ = self._apply_shaping_seq(x, reverse_shaping)
        return x.astype(physical_dtype)

    # -- introspection ------------------------------------------------------

    def get_precision(self) -> Optional[float]:
        if isinstance(self.format, Same):
            if self.physical_dtype is not None:
                return jnp.finfo(self.physical_dtype).bits
            raise RuntimeError(
                "physical_dtype has not been inferred, pass some data through first"
            )
        return self.format.bit_precision

    def __repr__(self):
        return (
            f"CastTo(format={repr(self.format)}, block_dim={self.block_dim}, "
            f"qscheme={self.qscheme}, ch_axis={self.ch_axis}, "
            f"group_size={self.group_size}, fake_quant={self.fake_quant_enabled}, "
            f"observer={self.observer_enabled})"
        )


class Quantize(nnx.Module):
    """Drop-in quantize op producing integer payloads (reference
    cast.py:361-379): y = clip(round(x / scale + zero_point))."""

    def __init__(self, scale, zero_point, dtype: Union[str, Format]):
        self.scale = QuantState(jnp.atleast_1d(jnp.asarray(scale, jnp.float32)))
        self.zero_point = QuantState(
            jnp.atleast_1d(jnp.asarray(zero_point, jnp.int32))
        )
        self.dtype = Format.from_shorthand(dtype) if isinstance(dtype, str) else dtype

    def __call__(self, x):
        from .observer import get_qmin_qmax

        qmin, qmax = get_qmin_qmax(self.dtype)
        q = jnp.round(x / self.scale.value + self.zero_point.value)
        if qmin is not None:
            q = jnp.clip(q, qmin, qmax)
        return q.astype(jnp.int32)


class DeQuantize(nnx.Module):
    """Drop-in dequantize op (reference cast.py:381-398)."""

    def __init__(self, scale=None, zero_point=None, dtype=None):
        self.scale = QuantState(
            jnp.atleast_1d(jnp.asarray(scale if scale is not None else 1.0, jnp.float32))
        )
        self.zero_point = QuantState(
            jnp.atleast_1d(
                jnp.asarray(zero_point if zero_point is not None else 0, jnp.int32)
            )
        )

    def __call__(self, q):
        return (q.astype(jnp.float32) - self.zero_point.value) * self.scale.value


class CastToDict(nnx.Module):
    """Named dict of casts routing multi-input modules
    (reference cast.py:58-133)."""

    def __init__(self, casts: Dict[str, CastTo]):
        self._names = list(casts.keys())
        for k, v in casts.items():
            setattr(self, k, v)

    def keys(self):
        return list(self._names)

    def items(self):
        return [(k, getattr(self, k)) for k in self._names]

    def __getitem__(self, k) -> CastTo:
        return getattr(self, k)

    def __contains__(self, k):
        return k in self._names

    def __len__(self):
        return len(self._names)

    def __call__(self, x, *args, output: bool = False, **kwargs):
        keys = self.keys()
        if output:
            if isinstance(x, (tuple, list)):
                return type(x)(self[keys[i]](a) for i, a in enumerate(x))
            return self[keys[0]](x)
        i = 1
        new_args = []
        new_kwargs = {}
        for a in args:
            if isinstance(a, (jax.Array, jnp.ndarray)):
                new_args.append(self[keys[i]](a))
                i += 1
            else:
                new_args.append(a)
        for k, v in kwargs.items():
            if isinstance(v, (jax.Array, jnp.ndarray)) and f"{k}_cast" in self:
                new_kwargs[k] = self[f"{k}_cast"](v)
            else:
                new_kwargs[k] = v
        return self[keys[0]](x), new_args, new_kwargs

    def _pack_to_dict(self, param):
        keys = self.keys()
        if isinstance(param, (tuple, list)):
            return {keys[i]: (p if p is not None else "SAME") for i, p in enumerate(param)}
        if not isinstance(param, dict):
            raise ValueError("format needs to be a dict, tuple or list!")
        return param

    def set_format(self, format) -> None:
        for k, f in self._pack_to_dict(format).items():
            if k not in self:
                raise RuntimeError(f"No CastTo with key {k}!")
            self[k].set_format(f)

    def set_pre_transform(self, pre_transforms) -> None:
        for k, t in self._pack_to_dict(pre_transforms).items():
            self[k].set_pre_transform(t)

    def disable_fake_quant(self):
        for k in self.keys():
            self[k].disable_fake_quant()

    def enable_fake_quant(self):
        for k in self.keys():
            self[k].enable_fake_quant()

    def enable_observer(self):
        for k in self.keys():
            self[k].enable_observer()

    def disable_observer(self):
        for k in self.keys():
            self[k].disable_observer()
