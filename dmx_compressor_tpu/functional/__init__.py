"""Approximation subsystem: taxonomy + SIMD surrogates."""

from .approximate import (
    ApproximationFunction,
    NoApproximation,
    Identity,
    TorchFunctionApproximation,
    CustomFunctionApproximation,
    Approximate,
    Approximator,
    approx_blend,
)
from . import simd_ops

VSIMD_OP_REF_AVAILABLE = True
