"""Numerics core: formats, rounding, casts, observers, SmoothQuant."""

from .format import (
    Format,
    Same,
    FixedPoint,
    FloatingPoint,
    BlockFloatingPoint,
    ScaledBlockFloatingPoint,
    MXFP,
    MXINT,
)
from .cast import CastTo, CastToDict, Quantize, DeQuantize, QuantState, ste
from .observer import (
    ObserverBase,
    DummyObserver,
    MinMaxObserver,
    HistogramObserver,
    PercentileObserver,
)
from .smoothquant import SmoothQuant, ActivationWeightSmoothQuant
from . import rounding
