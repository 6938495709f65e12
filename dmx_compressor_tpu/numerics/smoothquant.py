"""SmoothQuant: activation->weight quantization-difficulty migration.

TPU-native re-design of the reference SmoothQuant
(reference: src/dmx/compressor/numerical/smoothquant.py; paper
arXiv:2211.10438).  Per-channel scale ``s = a_max^alpha / b_max^(1-alpha)``
(clamped below by ``scale_min``); input A is divided by ``s`` and input B
multiplied by ``s``, preserving the matmul product while flattening activation
outliers.

State: running maxabs and the scale are :class:`SmoothQuantState` variables;
flags (enabled/dynamic/fused) are plain attributes (static under jit).
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
from flax import nnx

from .cast import CastTo
from .format import Format

Array = jax.Array


class SmoothQuantState(nnx.Variable):
    """SmoothQuant running statistics and scale (buffer-like)."""


def _maxabs(x: Array, dim: int) -> Array:
    """Max |x| over all dims except ``dim`` (reference smoothquant.py:285-299)."""
    dims = list(range(x.ndim))
    dims.pop(dim % x.ndim)
    return jnp.max(jnp.abs(x), axis=tuple(dims))


class SmoothQuant(nnx.Module):
    """Generic A x B scale migration (reference smoothquant.py:7-371)."""

    def __init__(
        self,
        a_ch_axis: int,
        b_ch_axis: int,
        a_dynamic: bool = False,
        b_dynamic: bool = False,
        migration_strength: float = 0.5,
        scale_format: Union[str, Format] = "SAME",
        scale_min: float = 1e-5,
    ):
        self.a_ch_axis = a_ch_axis
        self.b_ch_axis = b_ch_axis
        self.a_dynamic = a_dynamic
        self.b_dynamic = b_dynamic
        self.enabled = False
        self.calibrating = False
        self.migration_strength = migration_strength
        self.scale_min = scale_min
        self.scale = SmoothQuantState(jnp.zeros((0,), jnp.float32))
        self.a_maxabs = SmoothQuantState(jnp.zeros((0,), jnp.float32))
        self.b_maxabs = SmoothQuantState(jnp.zeros((0,), jnp.float32))
        self.scale_cast = CastTo()
        self.set_scale_format(scale_format)

    # -- config -------------------------------------------------------------

    def enable(self, enabled: bool = True) -> None:
        self.enabled = enabled

    def disable(self) -> None:
        self.enable(False)

    def set_dynamic(self, a_dynamic: bool = True, b_dynamic: bool = True) -> None:
        self.a_dynamic = a_dynamic
        self.b_dynamic = b_dynamic

    def set_scale_format(self, format: Union[str, Format] = "SAME") -> None:
        self.scale_cast.set_format(format)

    def set_migration_strength(self, migration_strength: float) -> None:
        if not 0.0 <= migration_strength <= 1.0:
            raise ValueError(
                f"migration_strength should be between 0 and 1, got {migration_strength}"
            )
        self.migration_strength = migration_strength

    def reset_scale(self) -> None:
        self.scale.value = jnp.zeros((0,), jnp.float32)

    def reset_a_maxabs(self) -> None:
        self.a_maxabs.value = jnp.zeros((0,), jnp.float32)

    def reset_b_maxabs(self) -> None:
        self.b_maxabs.value = jnp.zeros((0,), jnp.float32)

    @property
    def a_maxabs_exists(self) -> bool:
        return self.a_maxabs.value.size > 0

    @property
    def b_maxabs_exists(self) -> bool:
        return self.b_maxabs.value.size > 0

    # -- scale math ---------------------------------------------------------

    def compute_scale(self, a_maxabs: Array, b_maxabs: Array) -> None:
        """scale = a^alpha / b^(1-alpha), clamped (reference
        smoothquant.py:301-321)."""
        alpha = self.migration_strength
        b_maxabs = jnp.maximum(b_maxabs, self.scale_min)
        scale = (a_maxabs**alpha) / (b_maxabs ** (1.0 - alpha))
        scale = jnp.maximum(scale, self.scale_min)
        self.scale.value = jnp.asarray(self.scale_cast(scale), jnp.float32)

    def _scale_view(self, x: Array, dim: int) -> Array:
        sz = [1] * x.ndim
        sz[dim % x.ndim] = self.scale.value.size
        return self.scale.value.reshape(sz)

    def scale_a(self, a: Array) -> Array:
        if self.enabled and self.scale.value.size > 0:
            return a / self._scale_view(a, self.a_ch_axis).astype(a.dtype)
        return a

    def scale_b(self, b: Array) -> Array:
        if self.enabled and self.scale.value.size > 0:
            return b * self._scale_view(b, self.b_ch_axis).astype(b.dtype)
        return b

    # -- observation --------------------------------------------------------

    def __call__(self, a: Array, b: Array):
        """Update running maxabs and the scale (reference
        smoothquant.py:323-354)."""
        a = jax.lax.stop_gradient(a)
        b = jax.lax.stop_gradient(b)
        cur_a = _maxabs(a, self.a_ch_axis)
        cur_b = _maxabs(b, self.b_ch_axis)
        if not self.a_maxabs_exists or self.a_dynamic:
            self.a_maxabs.value = cur_a
        else:
            self.a_maxabs.value = jnp.maximum(cur_a, self.a_maxabs.value)
        if not self.b_maxabs_exists or self.b_dynamic:
            self.b_maxabs.value = cur_b
        else:
            self.b_maxabs.value = jnp.maximum(cur_b, self.b_maxabs.value)
        self.compute_scale(self.a_maxabs.value, self.b_maxabs.value)
        return self.scale_a(a), self.scale_b(b)


class ActivationWeightSmoothQuant(SmoothQuant):
    """Activation x weight specialization (reference smoothquant.py:371-541)."""

    def __init__(
        self,
        ch_axis: int,
        win_ch_axis: int,
        migration_strength: float = 0.5,
        scale_format: Union[str, Format] = "SAME",
        dynamic: bool = False,
        scale_min: float = 1e-5,
    ):
        super().__init__(
            a_ch_axis=ch_axis,
            b_ch_axis=win_ch_axis,
            migration_strength=migration_strength,
            scale_format=scale_format,
            a_dynamic=dynamic,
            b_dynamic=False,
            scale_min=scale_min,
        )
        self.ch_axis = ch_axis
        self.win_ch_axis = win_ch_axis
        self.fused_to_weight = False

    def set_dynamic(self, dynamic: bool = True) -> None:  # type: ignore[override]
        if dynamic and self.fused_to_weight:
            raise RuntimeError(
                "SmoothQuant cannot be dynamic as scale has been fused to weight already"
            )
        super().set_dynamic(a_dynamic=dynamic, b_dynamic=False)

    def reset_weight_maxabs(self) -> None:
        self.reset_b_maxabs()

    @property
    def dynamic(self) -> bool:
        return self.a_dynamic

    @property
    def weight_maxabs_computed(self) -> bool:
        return self.b_maxabs_exists

    @property
    def input_maxabs_exists(self) -> bool:
        return self.a_maxabs_exists

    @property
    def weight_maxabs(self) -> Array:
        return self.b_maxabs.value

    @property
    def input_maxabs(self) -> Array:
        return self.a_maxabs.value

    def scale_weight(self, wgt: Array) -> Array:
        return self.scale_b(wgt)

    def scale_input(self, inp: Array) -> Array:
        return self.scale_a(inp)

    def fuse_to_weight(self, wgt: Array) -> Array:
        """Return the scale-fused weight and mark the fusion
        (reference smoothquant.py:499-507; functional here: caller stores it)."""
        fused = self.scale_weight(wgt)
        self.fused_to_weight = True
        return fused

    def observe(self, inp: Array, wgt: Array) -> None:
        """Update maxabs state and scale (reference smoothquant.py:520-535)."""
        inp = jax.lax.stop_gradient(inp)
        wgt = jax.lax.stop_gradient(wgt)
        if not self.weight_maxabs_computed:
            self.b_maxabs.value = _maxabs(wgt, self.win_ch_axis)
        cur = _maxabs(inp, self.ch_axis)
        if not self.input_maxabs_exists or self.dynamic:
            self.a_maxabs.value = cur
        else:
            self.a_maxabs.value = jnp.maximum(cur, self.a_maxabs.value)
        self.compute_scale(self.a_maxabs.value, self.b_maxabs.value)

    def __call__(self, inp: Array, wgt: Array):  # type: ignore[override]
        self.observe(inp, wgt)
