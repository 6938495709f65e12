"""Tensor numerical format taxonomy with shorthand grammar.

TPU-native re-design of the reference's Format hierarchy
(reference: src/dmx/compressor/numerical/format.py).  Same shorthand grammar
and cast semantics; formats here are frozen, hashable dataclasses so they can
be passed as static arguments through ``jax.jit`` and live in config pytrees
as leaves of static structure.

Shorthand grammar (reference docs/numerics.rst):

- ``SAME``                                      identity
- ``XP[p,f](CSN)``                              fixed point; C=clamp, S=symmetric,
                                                last letter = rounding U/D/N/S
- ``FP[s|e|m,bias](FN)``                        float; F=flush subnormal
- ``BFP[p|8]{B}(SN)``                           block floating point
- ``SBFP<XP[...]><FP[...]>{B}``                 scaled BFP
- ``MXFP8[E4M3]{32}`` / ``MXINT8{32}``          OCP microscaling
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp

from . import rounding as R
from .onnx_ids import BFP_TYPE_IDS

Array = jax.Array

ROUNDING_MODE = {"U": "up", "D": "down", "N": "nearest", "S": "stochastic"}
ROUNDING_MODE_INV = {v: k for k, v in ROUNDING_MODE.items()}


def _rounding(letter: str) -> str:
    try:
        return ROUNDING_MODE[letter]
    except KeyError:
        raise ValueError(
            f"unknown rounding letter {letter!r}; expected one of "
            f"{sorted(ROUNDING_MODE)} (U=up, D=down, N=nearest, S=stochastic)"
        ) from None


class Format:
    """Abstract tensor numerical format (reference format.py:33-76)."""

    blocked: bool = False
    bfp_id: Optional[int] = None

    def cast(self, x: Array, block_dim: int = -1, key: Optional[Array] = None) -> Array:
        raise NotImplementedError

    @property
    def bytes_per_elem(self) -> Optional[float]:
        raise NotImplementedError

    @property
    def bit_precision(self) -> Optional[float]:
        raise NotImplementedError

    @staticmethod
    def from_shorthand(sh: str) -> "Format":
        sh = sh.strip()
        if sh.startswith("SAME"):
            return Same.from_shorthand(sh)
        elif sh.startswith("XP"):
            return FixedPoint.from_shorthand(sh)
        elif sh.startswith("FP"):
            return FloatingPoint.from_shorthand(sh)
        elif sh.startswith("BFP"):
            return BlockFloatingPoint.from_shorthand(sh)
        elif sh.startswith("SBFP"):
            return ScaledBlockFloatingPoint.from_shorthand(sh)
        elif sh.startswith("MXFP"):
            return MXFP.from_shorthand(sh)
        elif sh.startswith("MXINT"):
            return MXINT.from_shorthand(sh)
        else:
            raise ValueError(f"unrecognized format shorthand: {sh}")


def _parse(pattern: str, sh: str, what: str) -> re.Match:
    m = re.fullmatch(pattern, sh.strip())
    if m is None:
        raise ValueError(f"malformed {what} shorthand: {sh!r}")
    return m


@dataclass(frozen=True)
class Same(Format):
    """Identity format: cast is a no-op (reference format.py:79-108)."""

    blocked = False

    def cast(self, x, block_dim=-1, key=None):
        return x

    @property
    def bytes_per_elem(self):
        return None

    @property
    def bit_precision(self):
        return None

    @classmethod
    def from_shorthand(cls, sh: str):
        return cls()

    def __repr__(self):
        return "SAME"


@dataclass(frozen=True)
class FixedPoint(Format):
    """Fixed point simulated in fp32 (reference format.py:111-169)."""

    precision: int
    fraction: int
    clamp: bool = True
    symmetric: bool = True
    rounding: str = "nearest"
    blocked = False

    def __post_init__(self):
        assert 1 <= self.precision <= 24, (
            f"highest integer precision simulated by FP32 is 25, got {self.precision}"
        )

    def cast(self, x, block_dim=-1, key=None):
        return R.fixed_point_quantize(
            x,
            wl=self.precision,
            fl=self.fraction,
            clamp=self.clamp,
            symmetric=self.symmetric,
            rounding=self.rounding,
            key=key,
        )

    @property
    def bytes_per_elem(self):
        return self.precision / 8.0

    @property
    def bit_precision(self):
        return float(self.precision)

    @classmethod
    def from_shorthand(cls, sh: str):
        m = _parse(r"XP\[(-?\d+),(-?\+?\d+)\]\((\w)(\w)(\w)\)", sh, "XP")
        return cls(
            precision=int(m.group(1)),
            fraction=int(m.group(2)),
            clamp=m.group(3) == "C",
            symmetric=m.group(4) == "S",
            rounding=_rounding(m.group(5)),
        )

    def __repr__(self):
        frac = "0" if self.fraction == 0 else f"{self.fraction:+d}"
        return (
            f"XP[{self.precision},{frac}]"
            f"({'C' if self.clamp else '_'}{'S' if self.symmetric else '_'}"
            f"{ROUNDING_MODE_INV[self.rounding]})"
        )


@dataclass(frozen=True)
class FloatingPoint(Format):
    """Low-bit float simulated in fp32 (reference format.py:172-270)."""

    mantissa: int = 23
    exponent: int = 8
    bias: Optional[int] = None
    flush_subnormal: bool = True
    unsigned: bool = False
    rounding: str = "nearest"
    blocked = False

    def __post_init__(self):
        assert 0 <= self.mantissa <= 23
        assert 0 < self.exponent <= 8
        if self.bias is None:
            object.__setattr__(self, "bias", 2 ** (self.exponent - 1) - 1)
        _bias_min = 127 if self.exponent == 8 else -128 + 2**self.exponent
        assert _bias_min <= self.bias <= 127, (
            f"exponent bias for {self.exponent}-bit exponent must be within "
            f"[{_bias_min}, 127], got {self.bias}"
        )

    def cast(self, x, block_dim=-1, key=None):
        r = repr(self)
        if (x.dtype == jnp.float32 and r == "FP[1|8|23,127](_N)") or (
            x.dtype == jnp.float16 and r == "FP[1|5|10,15](FN)"
        ):
            out = x
        elif r == "FP[1|5|10,15](FN)" and x.dtype == jnp.float32:
            # FLOAT16 fast path: the hardware fp16 cast IS the format
            # (round-nearest-even on the same grid); saturate at the fp16 max
            # instead of the reference's default-bias clip (which produces
            # values beyond fp16 range) and flush subnormals below.
            y = jnp.clip(x, -65504.0, 65504.0).astype(jnp.float16)
            y = jnp.where(
                jnp.abs(y) < jnp.float16(6.103515625e-05), jnp.float16(0), y
            )
            return y.astype(x.dtype)
        else:
            out = R.float_quantize(
                x.astype(jnp.float32),
                man=self.mantissa,
                exp=self.exponent,
                bias=self.bias,
                flush_subnormal=self.flush_subnormal,
                rounding=self.rounding,
                key=key,
            ).astype(x.dtype)
        if r == "FP[1|5|10,15](FN)":
            # extra fp16 subnormal flush (reference format.py:222-232)
            smallest_normal = jnp.float32(6.103515625e-05)
            out = jnp.where(jnp.abs(out) < smallest_normal, jnp.zeros_like(out), out)
        return jnp.abs(out) if self.unsigned else out

    @property
    def largest_representable_power_of_two(self):
        return 2.0 ** (2 ** (self.exponent - 1))

    @property
    def bytes_per_elem(self):
        return (self.mantissa + self.exponent + 1) / 8.0

    @property
    def bit_precision(self):
        return float(
            self.mantissa + self.exponent
            if self.unsigned
            else 1 + self.mantissa + self.exponent
        )

    @classmethod
    def from_shorthand(cls, sh: str):
        m = _parse(r"FP\[(\d)\|(\d+)\|(\d+),(-?\d+)\]\((\w)([A-Za-z])\)", sh, "FP")
        return cls(
            mantissa=int(m.group(3)),
            exponent=int(m.group(2)),
            bias=int(m.group(4)),
            flush_subnormal=m.group(5) == "F",
            unsigned=m.group(1) == "0",
            rounding=_rounding(m.group(6)),
        )

    def __repr__(self):
        return (
            f"FP[{'0' if self.unsigned else '1'}|{self.exponent}|{self.mantissa},"
            f"{self.bias}]({'F' if self.flush_subnormal else '_'}"
            f"{ROUNDING_MODE_INV[self.rounding]})"
        )


@dataclass(frozen=True)
class BlockFloatingPoint(Format):
    """Block floating point (reference format.py:273-397).

    ``precision``-bit mantissa sharing an 8-bit exponent over blocks of
    ``block_size`` contiguous elements along the cast-site ``block_dim``.
    """

    precision: int = 8
    block_size: int = 64
    symmetric: bool = True
    rounding: str = "nearest"
    blocked = True

    def __post_init__(self):
        assert 2 <= self.precision <= 25
        assert self.block_size > 0

    @property
    def bfp_id(self):
        name = (
            f"DMX_BFP_{self.precision + 8}"
            f"{'' if self.symmetric else 'A'}_{self.block_size}"
        )
        return BFP_TYPE_IDS[name]

    def cast(self, x, block_dim=-1, key=None):
        if self.block_size == 1:
            # borrow float_quantize (reference format.py:312-320)
            return R.float_quantize(
                x.astype(jnp.float32),
                man=self.precision - 2,  # 1 sign, 1 implicit bit
                exp=8,
                bias=127,
                flush_subnormal=False,
                rounding=self.rounding,
                key=key,
            ).astype(x.dtype)

        bd = block_dim % max(x.ndim, 1) if x.ndim else 0
        if (
            self.symmetric
            and x.ndim >= 1
            and x.shape[block_dim] % self.block_size == 0
        ):
            # serving fast path: layout-preserving, fusion-friendly
            if bd == x.ndim - 1:
                return R.block_quantize_lastdim(
                    x, self.precision, self.block_size, self.rounding, key
                )
            xt = jnp.moveaxis(x, bd, -1)
            q = R.block_quantize_lastdim(
                xt, self.precision, self.block_size, self.rounding, key
            )
            return jnp.moveaxis(q, -1, bd)

        def _fn(blocks):
            q = R.block_quantize(blocks, wl=self.precision, rounding=self.rounding, key=key)
            if not self.symmetric:
                q = R.make_mantissa_asymmetric(q, blocks, self.precision)
            return q

        return R.apply_blockwise(
            x.astype(jnp.float32), block_dim, self.block_size, _fn
        ).astype(x.dtype)

    @property
    def bytes_per_elem(self):
        return (self.precision + 8.0 / self.block_size) / 8.0

    @property
    def bit_precision(self):
        return self.precision + 8.0 / self.block_size

    @classmethod
    def from_shorthand(cls, sh: str):
        # legacy grammar carried the block dim inside the shorthand
        # ("BFP[8|8]{64,-1}(SN)", docs/numerics.rst:70-80); the dim now lives
        # on the cast site (reference format.py:375-387), so it is accepted
        # and ignored here.
        m = _parse(r"BFP\[(\d+)\|8\]\{(\d+)(?:,(-?\d+))?\}\((\w)([A-Za-z])\)", sh, "BFP")
        return cls(
            precision=int(m.group(1)),
            block_size=int(m.group(2)),
            symmetric=m.group(4) == "S",
            rounding=_rounding(m.group(5)),
        )

    def __repr__(self):
        return (
            f"BFP[{self.precision}|8]{{{self.block_size}}}"
            f"({'S' if self.symmetric else '_'}{ROUNDING_MODE_INV[self.rounding]})"
        )


@dataclass(frozen=True)
class ScaledBlockFloatingPoint(Format):
    """Per-block {int mantissa x low-bit fp scale} (reference format.py:400-511)."""

    block_format: FixedPoint
    scaler_format: FloatingPoint
    block_size: int = 64
    blocked = True

    def __post_init__(self):
        assert isinstance(self.block_format, FixedPoint)
        assert isinstance(self.scaler_format, FloatingPoint)
        assert self.block_format.fraction == 0
        assert self.block_format.symmetric
        assert self.block_size > 0

    @property
    def man_scaling(self):
        return 2 ** (self.block_format.precision - 1) - 1  # largest mantissa abs

    @property
    def bfp_id(self):
        name = (
            f"DMX_SBFP_{self.block_format.precision + 8}_"
            f"{self.block_size}_{self.scaler_format.bias}"
        )
        return BFP_TYPE_IDS[name]

    def cast(self, x, block_dim=-1, key=None):
        def _fn(blocks):
            chunk_max = jnp.max(jnp.abs(blocks), axis=-1, keepdims=True) / self.man_scaling
            safe_max = jnp.where(chunk_max > 0.0, chunk_max, 1.0)
            q = self.block_format.cast(blocks / safe_max, key=key) * self.scaler_format.cast(
                chunk_max, key=key
            )
            return jnp.where(chunk_max > 0.0, q, blocks)

        return R.apply_blockwise(
            x.astype(jnp.float32), block_dim, self.block_size, _fn
        ).astype(x.dtype)

    @property
    def bytes_per_elem(self):
        return (
            self.block_format.bytes_per_elem
            + self.scaler_format.bytes_per_elem / self.block_size
        )

    @property
    def bit_precision(self):
        return (
            self.block_format.bit_precision
            + self.scaler_format.bit_precision / self.block_size
        )

    @classmethod
    def from_shorthand(cls, sh: str):
        m = _parse(r"SBFP<([^>]+)><([^>]+)>\{(\d+)\}", sh, "SBFP")
        return cls(
            block_format=FixedPoint.from_shorthand(m.group(1)),
            scaler_format=FloatingPoint.from_shorthand(m.group(2)),
            block_size=int(m.group(3)),
        )

    def __repr__(self):
        return (
            f"SBFP<{repr(self.block_format)}><{repr(self.scaler_format)}>"
            f"{{{self.block_size}}}"
        )


@dataclass(frozen=True)
class MXFP(Format):
    """OCP microscaling float: power-of-two shared scale x low-bit fp element
    (reference format.py:514-610)."""

    element_format: FloatingPoint
    block_size: int = 32
    blocked = True

    def __post_init__(self):
        assert isinstance(self.element_format, FloatingPoint)
        assert self.block_size > 0

    @property
    def scaler_format(self):
        return FloatingPoint(mantissa=0, exponent=8, bias=127, unsigned=True)

    def cast(self, x, block_dim=-1, key=None):
        def _fn(blocks):
            chunk_max = jnp.max(jnp.abs(blocks), axis=-1, keepdims=True)
            e = R._exponent_of(chunk_max)  # floor(log2(max))
            # scale = 2^floor(log2(max)) / 2^emax  (reference format.py:551-555)
            emax = 2 ** (self.element_format.exponent - 1)
            scale = R._mul_pow2(jnp.ones_like(chunk_max), e - emax)
            scale = jnp.where(chunk_max > 0.0, scale, 1.0)
            q = self.element_format.cast(blocks / scale, key=key) * scale
            # log2(0) -> -inf scale in the reference makes zero blocks 0/inf*inf
            # = nan-free zeros via 0/.. == 0; zeros stay zeros here as well.
            return jnp.where(chunk_max > 0.0, q, blocks)

        return R.apply_blockwise(
            x.astype(jnp.float32), block_dim, self.block_size, _fn
        ).astype(x.dtype)

    @property
    def bytes_per_elem(self):
        return (
            self.element_format.bytes_per_elem
            + self.scaler_format.bytes_per_elem / self.block_size
        )

    @property
    def bit_precision(self):
        return (
            self.element_format.mantissa + self.element_format.exponent + 1
        ) + 8.0 / self.block_size

    @classmethod
    def from_shorthand(cls, sh: str):
        m = _parse(r"MXFP(\d+)\[E(\d+)M(\d+)\]\{(\d+)\}", sh, "MXFP")
        precision, e_bits, m_bits = int(m.group(1)), int(m.group(2)), int(m.group(3))
        assert precision == e_bits + m_bits + 1
        return cls(
            element_format=FloatingPoint(
                mantissa=m_bits,
                exponent=e_bits,
                bias=2 ** (e_bits - 1) - 1,
                flush_subnormal=False,
                unsigned=False,
                rounding="nearest",
            ),
            block_size=int(m.group(4)),
        )

    def __repr__(self):
        ef = self.element_format
        return (
            f"MXFP{ef.exponent + ef.mantissa + 1}[E{ef.exponent}M{ef.mantissa}]"
            f"{{{self.block_size}}}"
        )


@dataclass(frozen=True)
class MXINT(BlockFloatingPoint):
    """OCP microscaling int: BFP with nearest rounding (reference format.py:612-653)."""

    def __init__(self, precision: int = 8, block_size: int = 32):
        super().__init__(
            precision=precision,
            block_size=block_size,
            symmetric=True,
            rounding="nearest",
        )

    @classmethod
    def from_shorthand(cls, sh: str):
        m = _parse(r"MXINT(\d+)\{(\d+)\}", sh, "MXINT")
        return cls(precision=int(m.group(1)), block_size=int(m.group(2)))

    def __repr__(self):
        return f"MXINT{self.precision}{{{self.block_size}}}"
