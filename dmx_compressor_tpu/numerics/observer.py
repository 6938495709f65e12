"""Calibration observers: streaming range/histogram statistics for quantizers.

TPU-native re-design of the reference observers
(reference: src/dmx/compressor/numerical/observer.py).  Observers are nnx
Modules whose statistics live in ``ObserverState`` variables (so they are
excluded from Params when splitting the model state for optimization or
sharding, mirroring torch buffers).  All statistics updates are pure jnp and
work eagerly or under nnx.jit.

Quantization schemes mirror torch.qscheme:
``per_tensor_affine | per_tensor_symmetric | per_channel_affine |
per_channel_symmetric``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import nnx

from .format import FixedPoint, Format

EPS = float(np.finfo(np.float32).eps)

PER_TENSOR = ("per_tensor_affine", "per_tensor_symmetric")
PER_CHANNEL = ("per_channel_affine", "per_channel_symmetric")
SYMMETRIC = ("per_tensor_symmetric", "per_channel_symmetric")


def is_per_tensor(qscheme: str) -> bool:
    return qscheme in PER_TENSOR


def is_per_channel(qscheme: str) -> bool:
    return qscheme in PER_CHANNEL


class ObserverState(nnx.Variable):
    """Observer statistics (calibration state, not parameters)."""


def get_qmin_qmax(fmt: Format) -> Tuple[Optional[int], Optional[int]]:
    """Integer range implied by a format (reference observer.py:13-21)."""
    if isinstance(fmt, FixedPoint) and fmt.fraction == 0 and fmt.clamp:
        quant_min = -(2 ** (fmt.precision - 1))
        quant_max = 2 ** (fmt.precision - 1) - 1
        if fmt.symmetric:
            quant_min += 1
        return quant_min, quant_max
    return None, None


def calculate_qparams_from_min_max(
    min_val: jnp.ndarray,
    max_val: jnp.ndarray,
    quant_min: Optional[int],
    quant_max: Optional[int],
    qscheme: str,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scale / zero-point from observed ranges (reference observer.py:59-118)."""
    if quant_min is None or quant_max is None:
        return jnp.ones((1,), jnp.float32), jnp.zeros((1,), jnp.int32)
    min_val = jnp.atleast_1d(jnp.asarray(min_val, jnp.float32))
    max_val = jnp.atleast_1d(jnp.asarray(max_val, jnp.float32))
    invalid = (min_val == jnp.inf) | (max_val == -jnp.inf) | (min_val > max_val)

    min_val_neg = jnp.minimum(min_val, 0.0)
    max_val_pos = jnp.maximum(max_val, 0.0)
    if qscheme in SYMMETRIC:
        amax = jnp.maximum(-min_val_neg, max_val_pos)
        scale = amax / (float(quant_max - quant_min) / 2)
        scale = jnp.maximum(scale, EPS)
        zero_point = jnp.zeros_like(scale, dtype=jnp.int32)
    else:
        scale = (max_val_pos - min_val_neg) / float(quant_max - quant_min)
        scale = jnp.maximum(scale, EPS)
        zero_point = quant_min - jnp.round(min_val_neg / scale).astype(jnp.int32)
        zero_point = jnp.clip(zero_point, quant_min, quant_max)
    scale = jnp.where(invalid, 1.0, scale)
    zero_point = jnp.where(invalid, 0, zero_point)
    return scale, zero_point


class ObserverBase(nnx.Module):
    """Base: holds format-derived quant range (reference DMXObserverBase)."""

    def __init__(self, dtype: Format, qscheme: str = "per_tensor_affine", ch_axis: int = -1):
        assert isinstance(dtype, Format), f"illegal format {dtype}"
        self.dtype = dtype
        self.qscheme = qscheme
        self.ch_axis = ch_axis
        self.quant_min, self.quant_max = get_qmin_qmax(dtype)

    def __call__(self, x):
        raise NotImplementedError

    def calculate_qparams(self):
        raise NotImplementedError

    def reset(self):
        pass


class DummyObserver(ObserverBase):
    """No-op observer (reference observer.py:121-136)."""

    def __call__(self, x):
        return x

    def calculate_qparams(self):
        return jnp.ones((1,), jnp.float32), jnp.zeros((1,), jnp.int32)


class MinMaxObserver(ObserverBase):
    """Running min/max, per-tensor or per-channel (reference observer.py:139-210)."""

    def __init__(self, dtype: Format, qscheme: str = "per_tensor_affine", ch_axis: int = -1):
        super().__init__(dtype, qscheme, ch_axis)
        self.min_val = ObserverState(jnp.asarray(jnp.inf, jnp.float32))
        self.max_val = ObserverState(jnp.asarray(-jnp.inf, jnp.float32))

    def __call__(self, x):
        x = jnp.asarray(x, jnp.float32)
        if is_per_channel(self.qscheme):
            axes = list(range(x.ndim))
            axes.pop(self.ch_axis % x.ndim)
            cur_min = jnp.min(x, axis=tuple(axes))
            cur_max = jnp.max(x, axis=tuple(axes))
        else:
            cur_min = jnp.min(x)
            cur_max = jnp.max(x)
        prev_min, prev_max = self.min_val.value, self.max_val.value
        if jnp.shape(prev_min) != jnp.shape(cur_min):
            prev_min = jnp.full_like(cur_min, jnp.inf)
            prev_max = jnp.full_like(cur_max, -jnp.inf)
        self.min_val.value = jnp.minimum(prev_min, cur_min)
        self.max_val.value = jnp.maximum(prev_max, cur_max)
        return x

    def calculate_qparams(self):
        return calculate_qparams_from_min_max(
            self.min_val.value, self.max_val.value, self.quant_min, self.quant_max, self.qscheme
        )

    def reset(self):
        self.min_val.value = jnp.asarray(jnp.inf, jnp.float32)
        self.max_val.value = jnp.asarray(-jnp.inf, jnp.float32)


class HistogramObserver(ObserverBase):
    """Histogram observer with L2-norm-minimizing range search
    (reference observer.py:213-582, adapted from torch.ao)."""

    def __init__(
        self,
        dtype: Format,
        qscheme: str = "per_tensor_affine",
        ch_axis: int = -1,
        bins: int = 2048,
        upsample_rate: int = 128,
    ):
        assert is_per_tensor(qscheme), "HistogramObserver supports per-tensor only"
        super().__init__(dtype, qscheme, ch_axis)
        self.bins = bins
        self.upsample_rate = upsample_rate
        self.histogram = ObserverState(jnp.zeros((bins,), jnp.float32))
        self.min_val = ObserverState(jnp.asarray(jnp.inf, jnp.float32))
        self.max_val = ObserverState(jnp.asarray(-jnp.inf, jnp.float32))

    def __call__(self, x):
        x = jnp.asarray(x, jnp.float32).ravel()
        x_min = float(jnp.min(x))
        x_max = float(jnp.max(x))
        prev_min = float(self.min_val.value)
        prev_max = float(self.max_val.value)
        if prev_min == jnp.inf or prev_max == -jnp.inf:
            new_min, new_max = x_min, x_max
            if new_min == new_max:  # degenerate range
                new_min, new_max = new_min - 0.5, new_max + 0.5
            hist, _ = jnp.histogram(x, bins=self.bins, range=(new_min, new_max))
            self.histogram.value = hist.astype(jnp.float32)
            self.min_val.value = jnp.asarray(new_min, jnp.float32)
            self.max_val.value = jnp.asarray(new_max, jnp.float32)
        else:
            new_min = min(prev_min, x_min)
            new_max = max(prev_max, x_max)
            # combine old histogram into new range by linear redistribution
            old_hist = np.asarray(self.histogram.value)
            hist_new, edges = np.histogram(
                np.asarray(x), bins=self.bins, range=(new_min, new_max)
            )
            hist_new = hist_new.astype(np.float64)
            if old_hist.sum() > 0:
                old_edges = np.linspace(prev_min, prev_max, self.bins + 1)
                centers = (old_edges[:-1] + old_edges[1:]) / 2
                idx = np.clip(
                    np.searchsorted(edges, centers, side="right") - 1, 0, self.bins - 1
                )
                np.add.at(hist_new, idx, old_hist)
            self.histogram.value = jnp.asarray(hist_new, jnp.float32)
            self.min_val.value = jnp.asarray(new_min, jnp.float32)
            self.max_val.value = jnp.asarray(new_max, jnp.float32)
        return x

    def _non_linear_param_search(self):
        """Greedy L2-error-minimizing [start, end] search over the histogram
        (reference observer.py:328-389, same algorithm as torch.ao)."""
        hist = np.asarray(self.histogram.value, np.float64)
        min_val = float(self.min_val.value)
        max_val = float(self.max_val.value)
        bin_width = (max_val - min_val) / self.bins
        total = hist.sum()
        if total == 0 or bin_width == 0:
            return min_val, max_val
        csum = np.cumsum(hist)
        dst_nbins = 2 ** int(np.ceil(np.log2(max(self.quant_max - self.quant_min + 1, 2)))) \
            if self.quant_min is not None else 256

        def quantization_error(next_start_bin, next_end_bin):
            # norm of quantizing hist[start..end] into dst_nbins buckets
            bin_w = bin_width
            dst_bin_width = bin_w * (next_end_bin - next_start_bin + 1) / dst_nbins
            if dst_bin_width == 0:
                return 0.0
            src_bin = np.arange(self.bins)
            src_bin_begin = (src_bin - next_start_bin) * bin_w
            src_bin_end = src_bin_begin + bin_w
            dst_bin_of_begin = np.clip(
                np.floor(src_bin_begin / dst_bin_width), 0, dst_nbins - 1
            )
            dst_bin_of_end = np.clip(
                np.floor(src_bin_end / dst_bin_width), 0, dst_nbins - 1
            )
            dst_bin_of_begin_center = (dst_bin_of_begin + 0.5) * dst_bin_width
            density = hist / bin_w
            norm = np.zeros(self.bins)

            def _get_norm(delta_begin, delta_end, density):
                return (delta_end**3 - delta_begin**3) / 3 * density

            delta_begin = src_bin_begin - dst_bin_of_begin_center
            delta_end = dst_bin_width / 2
            norm += _get_norm(delta_begin, np.full_like(delta_begin, delta_end), density)
            norm += (dst_bin_of_end - dst_bin_of_begin - 1) * _get_norm(
                -dst_bin_width / 2, dst_bin_width / 2, density
            )
            dst_bin_of_end_center = (dst_bin_of_end + 0.5) * dst_bin_width
            delta_begin = -dst_bin_width / 2
            delta_end = src_bin_end - dst_bin_of_end_center
            norm += _get_norm(np.full_like(delta_end, delta_begin), delta_end, density)
            return norm.sum()

        # cumulative-fraction-driven greedy shrink (torch/reference algorithm)
        stepsize = 1e-5
        alpha, beta = 0.0, 1.0
        start_bin, end_bin = 0, self.bins - 1
        norm_min = float("inf")
        while alpha < beta:
            next_alpha = alpha + stepsize
            next_beta = beta - stepsize
            l, r = start_bin, end_bin
            while l < end_bin and csum[l] < next_alpha * total:
                l += 1
            while r > start_bin and csum[r] > next_beta * total:
                r -= 1
            if (l - start_bin) > (end_bin - r):
                next_start_bin, next_end_bin = l, end_bin
                alpha = next_alpha
            else:
                next_start_bin, next_end_bin = start_bin, r
                beta = next_beta
            if next_start_bin == start_bin and next_end_bin == end_bin:
                continue
            norm = quantization_error(next_start_bin, next_end_bin)
            if norm > norm_min:
                break
            norm_min = norm
            start_bin, end_bin = next_start_bin, next_end_bin
        new_min = min_val + bin_width * start_bin
        new_max = min_val + bin_width * (end_bin + 1)
        return new_min, new_max

    def calculate_qparams(self):
        if float(self.min_val.value) == jnp.inf:
            return jnp.ones((1,), jnp.float32), jnp.zeros((1,), jnp.int32)
        new_min, new_max = self._non_linear_param_search()
        return calculate_qparams_from_min_max(
            jnp.asarray(new_min), jnp.asarray(new_max), self.quant_min, self.quant_max, self.qscheme
        )

    def reset(self):
        self.histogram.value = jnp.zeros((self.bins,), jnp.float32)
        self.min_val.value = jnp.asarray(jnp.inf, jnp.float32)
        self.max_val.value = jnp.asarray(-jnp.inf, jnp.float32)


class PercentileObserver(ObserverBase):
    """Percentile-clipped range observer (reference observer.py:585-634;
    the reference implementation is partially stubbed — here it is complete)."""

    def __init__(
        self,
        dtype: Format,
        qscheme: str = "per_tensor_affine",
        ch_axis: int = -1,
        percentile: float = 99.99,
    ):
        assert is_per_tensor(qscheme)
        super().__init__(dtype, qscheme, ch_axis)
        self.percentile = percentile
        self.min_val = ObserverState(jnp.asarray(jnp.inf, jnp.float32))
        self.max_val = ObserverState(jnp.asarray(-jnp.inf, jnp.float32))

    def __call__(self, x):
        x = jnp.asarray(x, jnp.float32).ravel()
        lo = jnp.percentile(x, 100.0 - self.percentile)
        hi = jnp.percentile(x, self.percentile)
        self.min_val.value = jnp.minimum(self.min_val.value, lo)
        self.max_val.value = jnp.maximum(self.max_val.value, hi)
        return x

    def calculate_qparams(self):
        return calculate_qparams_from_min_max(
            self.min_val.value, self.max_val.value, self.quant_min, self.quant_max, self.qscheme
        )

    def reset(self):
        self.min_val.value = jnp.asarray(jnp.inf, jnp.float32)
        self.max_val.value = jnp.asarray(-jnp.inf, jnp.float32)


OBSERVERS = {
    "dummy": DummyObserver,
    "minmax": MinMaxObserver,
    "histogram": HistogramObserver,
    "percentile": PercentileObserver,
}
