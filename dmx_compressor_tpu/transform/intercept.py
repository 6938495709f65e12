"""Jaxpr-level fake-quant interception for arbitrary (un-authored) models.

The reference catches *functional* ops — bare ``torch.matmul``, ``+``,
``F.softmax`` — by fx-tracing any torch model and splicing DmxModules into
the graph (reference fx/tracer.py:27-173, fx/transformer/
dmx_aware_transformer.py).  This build's module-tree substitution
(transform/substitute.py) covers models authored with nnx/rawnn modules;
this module removes the authorship requirement for pure-jax code the same
way the reference removes it for raw torch code: trace the function to a
jaxpr once, then re-evaluate it with fake-quant casts applied around the
intercepted primitives.

    qfn, sites = intercept(fn, example_args, rules=InterceptRules(...))
    y = qfn(*args)          # same function, BASIC numerics at every matmul

``sites`` lists every intercepted primitive (path-like ids in call order),
so configs can address individual sites; per-site overrides replace the
default rule.  Code annotated with ``jax.named_scope`` (or flax's
per-module scopes) gets scope-qualified ids ("encoder/attn/dot_0") — the
analogue of the reference's fx scope recording (QuantTracer's module_path,
fx/tracer.py:27-173); bare trace-order ids remain valid override keys.  The transform is jit-compatible (the interpreter runs at
trace time) and composes with the module-level substitution — use it for
third-party jax functions that cannot be rewritten against the zoo.

Interception points (mirroring the reference's functional substitution
table, fx/transformer/utils.py:53-66):

- ``dot_general``      -> input/multiplier casts + output cast (ActActMatMul
                          contract: blocks along -1 / -2)
- ``add`` (rank >= 1)  -> ResAdd contract: both inputs + output cast
- ``mul`` (rank >= 1)  -> Mul contract
- ``exp``              -> Exp contract (io casts)
- ``custom_jvp_call`` of softmax is visible as exp/sum chains and is
  covered by those primitives' casts.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.extend import core

from ..numerics.format import Format, Same


@dataclasses.dataclass(frozen=True)
class SiteRule:
    """Cast formats for one interception site (shorthand strings)."""

    input_format: str = "SAME"
    multiplier_format: str = "SAME"  # 2nd operand (dot/mul/add residual)
    output_format: str = "SAME"
    input_block_dim: int = -1
    multiplier_block_dim: int = -2


@dataclasses.dataclass
class InterceptRules:
    """Which primitives to intercept and with what formats.  ``overrides``
    maps site ids (as returned in ``sites``) to per-site rules."""

    dot: Optional[SiteRule] = None
    add: Optional[SiteRule] = None
    mul: Optional[SiteRule] = None
    exp: Optional[SiteRule] = None
    overrides: Dict[str, SiteRule] = dataclasses.field(default_factory=dict)

    @classmethod
    def basic(cls) -> "InterceptRules":
        """The BASIC functional-op contract (reference config_rules.BASIC on
        ActActMatMul / ResAdd / Mul / Exp)."""
        return cls(
            dot=SiteRule("BFP[8|8]{64}(SN)", "BFP[8|8]{64}(SN)",
                         "FP[1|5|10,15](FN)"),
            add=SiteRule("FP[1|5|10,15](FN)", "FP[1|5|10,15](FN)",
                         "FP[1|5|10,15](FN)"),
        )


def _apply_cast_module(c, x):
    """Route an operand through a stateful CastTo; rank-0 operands stay
    uncast (blocked casts have no dim to block over), matching _cast."""
    if not hasattr(x, "ndim") or x.ndim == 0:
        return x
    return c(x)


def _cast(x, shorthand: str, block_dim: int):
    fmt = Format.from_shorthand(shorthand)
    if isinstance(fmt, Same) or not hasattr(x, "ndim") or x.ndim == 0:
        return x
    # Format.cast handles non-multiple dims with a remainder block (the same
    # contract as the module path, numerics/rounding.apply_blockwise) — no
    # silent skip for odd tails.
    return fmt.cast(x, block_dim)


_INTERCEPTED = {
    "dot_general": "dot",
    "add": "add",
    "mul": "mul",
    "exp": "exp",
}


def _rule_casts(rule: "SiteRule", kind: str):
    """Stateful CastTo quantizers for one site — the same objects the module
    path hangs off NumericalCastMixin, so observers / calibration /
    freeze-thaw behave identically (reference gives every fx-captured op the
    full DmxModule quantizer surface, fx/transformer/utils.py:12-108;
    calibration then applies to them like any module, cast.py:308-340)."""
    from ..numerics.cast import CastTo

    mult_bd = (
        rule.multiplier_block_dim if kind == "dot" else rule.input_block_dim
    )
    return {
        "input": CastTo(rule.input_format, block_dim=rule.input_block_dim),
        "multiplier": CastTo(rule.multiplier_format, block_dim=mult_bd),
        "output": CastTo(rule.output_format, block_dim=-1),
    }


def _eqn_scope(eqn) -> str:
    """The equation's ``jax.named_scope`` stack ("layer0/attn" style) — the
    TPU-native analogue of the reference's fx scope recording (the reference
    QuantTracer records ``module_path`` per captured op so configs address
    sites by model scope, fx/tracer.py:27-173).  Code that annotates scopes
    (``jax.named_scope`` / flax's per-module scopes) gets scope-qualified
    site ids; unannotated code keeps bare trace-order ids."""
    si = getattr(eqn, "source_info", None)
    ns = getattr(si, "name_stack", None)
    return str(ns) if ns is not None else ""


def _site_id(kind: str, i: int, scope: str) -> str:
    return f"{scope}/{kind}_{i}" if scope else f"{kind}_{i}"


def _sid_kind(sid: str) -> str:
    """Primitive kind from a (possibly scope-qualified) site id."""
    return sid.rsplit("_", 1)[0].rsplit("/", 1)[-1]


def _site_lookup(mapping, sid: str, kind: str, i: int):
    """Per-site table lookup: scope-qualified id first, bare id fallback
    (overrides written before scopes existed keep working)."""
    if sid in mapping:
        return mapping[sid]
    return mapping.get(f"{kind}_{i}")


def _is_site(eqn, kind) -> bool:
    """add/mul only count as sites when both operands are non-scalar tensors
    (the reference substitutes ``+``/``*`` only when both args are Tensors,
    dmx_aware_transformer.py:160-175)."""
    if kind not in ("add", "mul"):
        return True
    return all(
        getattr(getattr(v, "aval", None), "ndim", 0) >= 1 for v in eqn.invars
    )


class QuantizedFunction:
    """A re-configurable fake-quantized view of an arbitrary jax function
    (the functional analogue of ``DmxModel.from_raw``: ``sites`` play the
    role of module names, ``configure`` the role of config rules).

    Every site carries REAL :class:`~..numerics.cast.CastTo` quantizers
    (``site_casts[site_id]["input"/"multiplier"/"output"]``) — observers,
    affine qparams, calibration and freeze/thaw work exactly as on the
    module path: run :meth:`enable_calibration`, stream data through the
    function (eagerly — observer state mutates, like any nnx calibration
    pass), then :meth:`enable_calibration` ``(False)`` to freeze.  Re-``jit``
    after calibrating: a jitted closure bakes the qparams it saw at trace
    time.
    """

    def __init__(self, fn: Callable, example_args: Sequence[Any],
                 rules: Optional["InterceptRules"] = None):
        self._fn = fn
        self._example_args = tuple(example_args)
        self.rules = rules or InterceptRules.basic()
        self.site_casts: Dict[str, Dict[str, Any]] = {}
        self._rebuild()

    def _rebuild(self):
        _, self.sites = intercept(self._fn, self._example_args, self.rules)
        for sid in self.sites:
            if sid in self.site_casts:
                continue
            kind = _sid_kind(sid)
            rule = self.rules.overrides.get(sid, getattr(self.rules, kind))
            if rule is not None:
                self.site_casts[sid] = _rule_casts(rule, kind)
        self._qfn, _ = intercept(
            self._fn, self._example_args, self.rules,
            site_casts=self.site_casts,
        )

    def _canonical_sid(self, key: str) -> Optional[str]:
        """Resolve an override key to a member of ``self.sites``: exact
        match first, then the bare ``<kind>_<i>`` fallback onto the unique
        scoped site sharing that kind/index — the same back-compat rule the
        eval path's ``_site_lookup`` applies (ADVICE r4: configure() used to
        reject bare ids the eval path still honored)."""
        if key in self.sites:
            return key
        matches = [s for s in self.sites if s.rsplit("/", 1)[-1] == key]
        return matches[0] if len(matches) == 1 else None

    def configure(self, overrides: Dict[str, "SiteRule"]) -> "QuantizedFunction":
        """Apply per-site rule overrides (keys from ``self.sites``; bare
        trace-order ids resolve to their scope-qualified site).  Overridden
        sites get fresh quantizers (their observer state resets, like
        reconfiguring a module's format)."""
        resolved = {}
        unknown = []
        for key, rule in overrides.items():
            sid = self._canonical_sid(key)
            if sid is None:
                unknown.append(key)
            else:
                resolved[sid] = rule
        if unknown:
            raise ValueError(f"unknown sites: {sorted(unknown)}")
        self.rules.overrides.update(resolved)
        for sid, rule in resolved.items():
            self.site_casts[sid] = _rule_casts(rule, _sid_kind(sid))
        self._rebuild()
        return self

    def enable_calibration(self, state: bool = True, **kwargs) -> "QuantizedFunction":
        """Begin/end observer calibration on every site quantizer whose
        format is not SAME — the module path's
        ``CastTo.enable_calibration`` applied per site (``observer_cls``,
        ``qscheme_to_overload``, ``group_size``, ``ch_axis`` pass through).
        While calibrating, call the function EAGERLY (not under jit)."""
        for casts in self.site_casts.values():
            for c in casts.values():
                if not isinstance(c.format, Same):
                    c.enable_calibration(state, **kwargs)
        return self

    def named_quantizers(self):
        """(site_id, slot, CastTo) triples — the functional analogue of the
        module tree's named quantizer walk."""
        for sid in self.sites:
            for slot, c in self.site_casts.get(sid, {}).items():
                yield sid, slot, c

    def __call__(self, *args):
        return self._qfn(*args)


def intercept(
    fn: Callable,
    example_args: Sequence[Any],
    rules: Optional[InterceptRules] = None,
    site_casts: Optional[Dict[str, Dict[str, Any]]] = None,
) -> Tuple[Callable, List[str]]:
    """Return ``(quantized_fn, site_ids)`` for an arbitrary jax function.

    ``quantized_fn`` re-evaluates ``fn``'s jaxpr with the rules' casts
    wrapped around every intercepted primitive; ``site_ids`` names the
    sites (``"<prim>_<index>"`` in trace order, prefixed with the
    ``jax.named_scope`` stack when the traced code annotates one) for
    per-site overrides.
    Shapes are fixed by ``example_args`` (retrace per shape, like any
    jaxpr-level tool).  ``site_casts`` (site id -> {"input", "multiplier",
    "output"} CastTo modules) routes matching sites through STATEFUL
    quantizers instead of the rule's bare format strings — the calibration
    surface (:class:`QuantizedFunction` builds and owns these).
    """
    rules = rules or InterceptRules.basic()
    site_casts = site_casts or {}
    closed = jax.make_jaxpr(fn)(*example_args)
    flat_example, in_tree = jax.tree_util.tree_flatten(tuple(example_args))

    def _inner_closed(eqn):
        """The nested jaxpr of a call-like equation (pjit / remat /
        custom_jvp / custom_vjp / closed_call), or None."""
        for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
            inner = eqn.params.get(key)
            if inner is None:
                continue
            if isinstance(inner, core.ClosedJaxpr):
                return inner
            if isinstance(inner, core.Jaxpr):
                return core.ClosedJaxpr(inner, ())
        return None

    def _walk_sites(jaxpr, counters, sites):
        for eqn in jaxpr.eqns:
            inner = _inner_closed(eqn)
            if inner is not None:
                _walk_sites(inner.jaxpr, counters, sites)
                continue
            kind = _INTERCEPTED.get(eqn.primitive.name)
            if (
                kind is not None
                and getattr(rules, kind) is not None
                and _is_site(eqn, kind)
            ):
                i = counters.get(kind, 0)
                counters[kind] = i + 1
                sites.append(_site_id(kind, i, _eqn_scope(eqn)))

    sites: List[str] = []
    _walk_sites(closed.jaxpr, {}, sites)

    def run(jaxpr, consts, args, counts):
        env: Dict[core.Var, Any] = {}

        def read(v):
            return v.val if isinstance(v, core.Literal) else env[v]

        def write(v, val):
            env[v] = val

        for v, c in zip(jaxpr.constvars, consts):
            write(v, c)
        for v, a in zip(jaxpr.invars, args):
            write(v, a)

        for eqn in jaxpr.eqns:
            invals = [read(v) for v in eqn.invars]
            inner = _inner_closed(eqn)
            if inner is not None:
                # re-interpret nested computations (pjit wraps most real
                # code; the shared counter keeps site ids stable)
                outvals = run(inner.jaxpr, inner.consts, invals, counts)
                for v, o in zip(eqn.outvars, outvals):
                    write(v, o)
                continue
            kind = _INTERCEPTED.get(eqn.primitive.name)
            rule = getattr(rules, kind) if kind is not None else None
            if rule is not None and not _is_site(eqn, kind):
                rule = None
            casts = None
            if rule is not None:
                i = counts.get(kind, 0)
                counts[kind] = i + 1
                sid = _site_id(kind, i, _eqn_scope(eqn))
                rule = _site_lookup(rules.overrides, sid, kind, i) or rule
                casts = _site_lookup(site_casts, sid, kind, i)
                if casts is not None:
                    a = _apply_cast_module(casts["input"], invals[0])
                    b = (
                        _apply_cast_module(casts["multiplier"], invals[1])
                        if len(invals) > 1
                        else None
                    )
                else:
                    a = _cast(
                        invals[0], rule.input_format, rule.input_block_dim
                    )
                    bdim = (
                        rule.multiplier_block_dim
                        if kind == "dot"
                        else rule.input_block_dim
                    )
                    b = (
                        _cast(invals[1], rule.multiplier_format, bdim)
                        if len(invals) > 1
                        else None
                    )
                invals = [a] + ([b] + invals[2:] if b is not None else invals[1:])
            outvals = eqn.primitive.bind(*invals, **eqn.params)
            if not eqn.primitive.multiple_results:
                outvals = [outvals]
            if rule is not None:
                if casts is not None:
                    outvals = [
                        _apply_cast_module(casts["output"], o)
                        for o in outvals
                    ]
                else:
                    outvals = [
                        _cast(o, rule.output_format, -1) for o in outvals
                    ]
            for v, o in zip(eqn.outvars, outvals):
                write(v, o)
        return [read(v) for v in jaxpr.outvars]

    out_tree = jax.tree_util.tree_structure(fn(*example_args))

    def quantized_fn(*args):
        flat, tree = jax.tree_util.tree_flatten(tuple(args))
        assert tree == in_tree, "argument structure must match example_args"
        outs = run(closed.jaxpr, closed.consts, flat, {})
        return jax.tree_util.tree_unflatten(out_tree, outs)

    return quantized_fn, sites
