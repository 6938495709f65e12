"""Fine-grain structured weight sparsity.

TPU-native re-design of the reference sparsity subsystem
(reference: src/dmx/compressor/sparse.py).  ``Sparseness`` patterns are frozen
dataclasses with a pure ``get_mask(score)``; gradient routing (STE /
supermask / joint) is expressed with ``stop_gradient`` instead of custom
autograd Functions.  ``Sparsify`` is an nnx Module holding the learnable
``score``; N:M masks are computed with ``jax.lax.top_k`` over reshaped blocks
(MXU/VPU-friendly, no scatter).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

Array = jax.Array


class Sparseness:
    """Abstract sparseness pattern (reference sparse.py:23-64)."""

    blocked: bool = False
    density: Optional[float] = None

    def __init__(self, mask_gradient: bool = False):
        self.mask_gradient = mask_gradient

    def get_mask(self, score: Array, key: Optional[Array] = None) -> Optional[Array]:
        raise NotImplementedError

    @staticmethod
    def from_shorthand(sh: str) -> "Sparseness":
        sh = sh.strip()
        if sh.startswith("DENSE"):
            return Dense.from_shorthand(sh)
        elif sh.startswith("TOPK"):
            return TopK.from_shorthand(sh)
        elif sh.startswith("BTOPK"):
            return BlockTopK.from_shorthand(sh)
        elif sh.startswith("BERN"):
            return Bernoulli.from_shorthand(sh)
        else:
            raise ValueError(f"unrecognized sparseness shorthand: {sh}")


@dataclass(frozen=True)
class Dense(Sparseness):
    """No pruning (reference sparse.py:67-94)."""

    mask_gradient: bool = False
    blocked = False
    density = 1.0

    def get_mask(self, score, key=None):
        return None

    @classmethod
    def from_shorthand(cls, sh):
        return cls()

    def __repr__(self):
        return "DENSE"


@dataclass(frozen=True)
class TopK(Sparseness):
    """Global top-K unstructured sparsity (reference sparse.py:97-144)."""

    density: float = 0.5
    mask_gradient: bool = False
    blocked = False

    def __post_init__(self):
        assert 0 <= self.density <= 1.0, "density has to be between 0 and 1"

    def get_mask(self, score, key=None):
        flat = score.ravel()
        n_prune = int(flat.size * (1.0 - self.density))
        if n_prune == 0:
            return jnp.ones_like(score)
        # lowest-scored n_prune entries get zeroed (argsort order parity with
        # the reference's scatter of ones->zeros)
        threshold_idx = jnp.argsort(flat)[:n_prune]
        mask = jnp.ones_like(flat).at[threshold_idx].set(0.0)
        return mask.reshape(score.shape)

    @classmethod
    def from_shorthand(cls, sh):
        m = re.fullmatch(r"TOPK\{([0-9.]+)\}\((\w)\)", sh.strip())
        if m is None:
            raise ValueError(f"malformed TOPK shorthand: {sh!r}")
        return cls(density=float(m.group(1)), mask_gradient=m.group(2) == "M")

    def __repr__(self):
        return f"TOPK{{{self.density}}}({'M' if self.mask_gradient else 'U'})"


@dataclass(frozen=True)
class BlockTopK(Sparseness):
    """N:M structured sparsity: K non-zeros per ``block_size`` along
    ``block_dim`` (reference sparse.py:147-204)."""

    K: int = 4
    block_size: int = 8
    block_dim: int = -1
    mask_gradient: bool = False
    blocked = True

    def __post_init__(self):
        assert 0 < self.K <= self.block_size

    @property
    def density(self):
        return self.K / self.block_size

    def get_mask(self, score, key=None):
        bd = self.block_dim % score.ndim
        assert score.shape[bd] % self.block_size == 0, (
            f"score has size {score.shape[bd]} at dimension {bd}, "
            f"not a multiple of block size {self.block_size}"
        )
        st = jnp.moveaxis(score, bd, -1)
        shape = st.shape
        blocks = st.reshape(-1, self.block_size)
        # keep the K largest per block: mask where rank >= block_size - K
        kth = jax.lax.top_k(blocks, self.K)[0][:, -1:]
        mask = (blocks >= kth).astype(score.dtype)
        # Tie handling parity: the reference prunes exactly block_size - K via
        # argsort; with ties at the threshold, keep the later indices like a
        # stable argsort-prune of the earlier ones.
        excess = jnp.sum(mask, axis=-1, keepdims=True) - self.K
        tie = (blocks == kth).astype(score.dtype)
        # zero out the earliest `excess` tied entries per block
        tie_rank = jnp.cumsum(tie, axis=-1)
        drop = tie * (tie_rank <= excess)
        mask = mask - drop
        mask = mask.reshape(shape)
        return jnp.moveaxis(mask, -1, bd)

    @classmethod
    def from_shorthand(cls, sh):
        m = re.fullmatch(r"BTOPK\{(\d+):(\d+),(-?\d+)\}\((\w)\)", sh.strip())
        if m is None:
            raise ValueError(f"malformed BTOPK shorthand: {sh!r}")
        return cls(
            K=int(m.group(1)),
            block_size=int(m.group(2)),
            block_dim=int(m.group(3)),
            mask_gradient=m.group(4) == "M",
        )

    def __repr__(self):
        return (
            f"BTOPK{{{self.K}:{self.block_size},{self.block_dim}}}"
            f"({'M' if self.mask_gradient else 'U'})"
        )


@dataclass(frozen=True)
class Bernoulli(Sparseness):
    """Bernoulli supermask sampling (reference sparse.py:207-242)."""

    mask_gradient: bool = False
    blocked = False
    density = None

    def get_mask(self, score, key=None):
        if key is None:
            key = jax.random.key(0)
        # scores must be within [0, 1]
        return jax.random.bernoulli(key, score).astype(score.dtype)

    @classmethod
    def from_shorthand(cls, sh):
        return cls()

    def __repr__(self):
        return "BERN"


class Sparsify(nnx.Module):
    """Sparsification module holding a learnable score
    (reference sparse.py:245-344).  Lazily materializes the score at first
    forward (LazySparsify semantics) when constructed without a shape."""

    def __init__(
        self,
        tensor_shape=None,
        sparseness="DENSE",
        backward_mode: str = "STE",
        score_func=None,
        rngs: Optional[nnx.Rngs] = None,
    ):
        # shape (0,) placeholder = uninitialized (LazySparsify semantics)
        self.score = nnx.Param(
            jax.random.uniform(
                rngs.params() if rngs else jax.random.key(0), tensor_shape
            )
            if tensor_shape is not None
            else jnp.zeros((0,), jnp.float32)
        )
        self.sparseness: Sparseness = Dense()
        self.backward_mode = "STE"
        self.enable_weight_gradient = True
        self.enable_mask_gradient = False
        self.score_func = None
        self.plastic = False
        self.training = False
        self.configure(sparseness, backward_mode, score_func)

    def configure(self, sparseness=None, backward_mode=None, score_func=None):
        if sparseness is not None:
            if not isinstance(sparseness, Sparseness):
                sparseness = Sparseness.from_shorthand(sparseness)
            self.sparseness = sparseness
        if backward_mode is not None:
            self.backward_mode = backward_mode
            self.enable_weight_gradient = backward_mode.lower() in {"ste", "joint"}
            self.enable_mask_gradient = backward_mode.lower() in {"supermask", "joint"}
        if score_func is not None:
            self.score_func = score_func
            self.plastic = True

    def _materialize(self, shape, key=None):
        if self.score.value.shape != shape:
            key = key if key is not None else jax.random.key(0)
            self.score.value = jax.random.uniform(key, shape)

    @property
    def mask(self) -> Optional[Array]:
        if isinstance(self.sparseness, Dense):
            return None
        assert self.score.value.size > 0, "score not materialized yet"
        return self.sparseness.get_mask(self.score.value)

    def __call__(self, x, key: Optional[Array] = None):
        if isinstance(self.sparseness, Dense):
            return x
        from .utils.tracing import eager as _eager

        if _eager():
            self._materialize(x.shape, key)
        assert self.score.value.shape == x.shape, (
            "Sparsify score not materialized; run one eager forward first"
        )
        score = (
            self.score_func(self.score.value, x)
            if (self.plastic and self.score_func is not None)
            else self.score.value
        )
        if _eager():
            self.plastic = False
        mask = self.sparseness.get_mask(score, key=key)
        if self.training:
            if not self.enable_weight_gradient:
                x = jax.lax.stop_gradient(x)
            if not self.enable_mask_gradient:
                mask = jax.lax.stop_gradient(mask)
            elif not self.sparseness.mask_gradient:
                # supermask STE: gradient flows to the score as identity
                mask = score + jax.lax.stop_gradient(mask - score)
        else:
            mask = jax.lax.stop_gradient(mask)
        return x * mask.astype(x.dtype)

    @property
    def density(self) -> float:
        if self.sparseness.density is not None:
            return self.sparseness.density
        m = self.mask
        return float(jnp.sum(m) / m.size)

    def __repr__(self):
        return (
            f"Sparsify(sparseness={repr(self.sparseness)}, "
            f"backward_mode={self.backward_mode})"
        )


# back-compat alias: lazy behavior is the default in this build
LazySparsify = Sparsify


class SparsificationManager:
    """Scheduler-style reconfiguration of many sparsifiers
    (reference sparse.py:347-363)."""

    def __init__(self, sparsify_modules, **kwargs):
        self.sparsify_modules = list(sparsify_modules)

    def step(self, **kwargs):
        for sm in self.sparsify_modules:
            sm.configure(**kwargs)
