"""Approximation-function taxonomy: shorthand grammar and execution.

TPU-native re-design of the reference approximation subsystem
(reference: src/dmx/compressor/functional/approximate.py).  Shorthand grammar
``FUNC[algorithm]{wrapper_params}(extra_params)``; algorithms: ``vsimd``
(dispatches to the in-repo SIMD surrogates in :mod:`simd_ops`) and
``experimental``.

The reference's value-replacement-with-exact-gradient trick
(approximate.py:300-327: run the exact op, then overwrite ``output.data`` with
the approximation) is expressed functionally as::

    out = exact + stop_gradient(approx - exact)

so values match the approximation while gradients flow through the exact op.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import jax

from ..utils.io import kwargs_to_string, string_to_kwargs
from . import simd_ops

TORCH_FUNCTION_IDS = {
    "GELU": "gelu",
    "SILU": "silu",
    "RMS_NORM": "rms_norm",
    "LAYER_NORM": "layer_norm",
    "SOFTMAX": "softmax",
    "EXP": "exp",
}

CUSTOM_FUNCTION_IDS = {
    "QUICK_GELU": "quick_gelu",
    "APPLY_LLAMA_ROPE": "apply_rotary_pos_emb",
}


def approx_blend(exact, approx):
    """Value of ``approx``, gradient of ``exact`` (reference
    approximate.py:300-327)."""
    if isinstance(exact, tuple):
        assert isinstance(approx, tuple), (
            "module and its approximation should both return a tuple"
        )
        return tuple(approx_blend(e, a) for e, a in zip(exact, approx))
    return exact + jax.lax.stop_gradient(approx - exact)


class ApproximationFunction:
    """Abstract approximation algorithm (reference approximate.py:50-74)."""

    def execute(self, *args, **kwargs):
        raise NotImplementedError

    @staticmethod
    def from_shorthand(sh: str) -> "ApproximationFunction":
        sh = sh.strip()
        if sh.startswith("NONE"):
            return NoApproximation.from_shorthand(sh)
        elif sh.startswith(tuple(TORCH_FUNCTION_IDS)):
            return TorchFunctionApproximation.from_shorthand(sh)
        elif sh.startswith(tuple(CUSTOM_FUNCTION_IDS)):
            return CustomFunctionApproximation.from_shorthand(sh)
        else:
            raise ValueError(f"unrecognized approximation function shorthand: {sh}")

    def __eq__(self, other):
        return isinstance(other, ApproximationFunction) and repr(self) == repr(other)

    def __hash__(self):
        return hash(repr(self))


class NoApproximation(ApproximationFunction):
    """No approximation (reference approximate.py:77-96)."""

    def execute(self, *args, **kwargs):
        raise RuntimeError("NoApproximation is not supposed to be executed")

    @classmethod
    def from_shorthand(cls, sh):
        return cls()

    def __repr__(self):
        return "NONE"


Identity = NoApproximation  # alias, as in the reference


_SH_RE = re.compile(r"(\w+)\[(\w+)\]\{(.*?)\}\((.*)\)")


class _FunctionApproximation(ApproximationFunction):
    """Shared machinery for torch-function and custom-function surrogates."""

    _ids: Dict[str, str] = {}

    def __init__(
        self,
        func_id: str,
        algorithm: str = "vsimd",
        wrapper_params: Dict[str, Any] = None,
        extra_params: Dict[str, Any] = None,
    ):
        self.func_id = func_id
        self.func_name = self._ids[func_id]
        self.algorithm = algorithm
        self.wrapper_params = dict(wrapper_params or {})
        self.extra_params = dict(extra_params or {})

    @classmethod
    def from_shorthand(cls, sh):
        m = _SH_RE.fullmatch(sh.strip())
        if m is None:
            raise ValueError(f"malformed approximation shorthand: {sh!r}")
        return cls(
            func_id=m.group(1),
            algorithm=m.group(2),
            wrapper_params=string_to_kwargs(m.group(3)),
            extra_params=string_to_kwargs(m.group(4)),
        )

    def execute(self, *args, **kwargs):
        if self.algorithm in ("vsimd", "experimental"):
            fn = simd_ops.FUNCTIONS[self.func_name]
            return fn(*args, **kwargs, **self.extra_params)
        raise ValueError(
            f"unknown approximation algorithm {self.algorithm} for {self.func_id}"
        )

    def __repr__(self):
        return (
            f"{self.func_id}[{self.algorithm}]"
            f"{{{kwargs_to_string(**self.wrapper_params)}}}"
            f"({kwargs_to_string(**self.extra_params)})"
        )


class TorchFunctionApproximation(_FunctionApproximation):
    """Surrogates for standard functional ops (reference approximate.py:102-163)."""

    _ids = TORCH_FUNCTION_IDS


class CustomFunctionApproximation(_FunctionApproximation):
    """Surrogates for custom functions (reference approximate.py:166-226)."""

    _ids = CUSTOM_FUNCTION_IDS


class Approximate:
    """Approximation operator container (reference approximate.py:229-247)."""

    def __init__(self, function=None):
        self.function: ApproximationFunction = NoApproximation()
        if function is not None:
            self.set_function(function)

    def set_function(self, function) -> None:
        if not isinstance(function, ApproximationFunction):
            function = ApproximationFunction.from_shorthand(function)
        self.function = function

    def __call__(self, *args, **kwargs):
        return self.function.execute(*args, **kwargs)

    def __repr__(self):
        return f"Approximate(function={repr(self.function)})"


class Approximator:
    """Standalone approximation of a single tensor op with error tracking
    (reference approximate.py:250-275)."""

    def __init__(self, function=None):
        if function is None:
            function = NoApproximation()
        if not isinstance(function, ApproximationFunction):
            function = ApproximationFunction.from_shorthand(function)
        self.function = function
        self.approximation_error = None

    def __call__(self, x):
        out = self.function.execute(x)
        out0 = out[0] if isinstance(out, tuple) else out
        if not isinstance(self.function, NoApproximation):
            from ..utils.tracing import try_set

            try_set(self, "approximation_error", jax.lax.stop_gradient(out0 - x))
        return out0
