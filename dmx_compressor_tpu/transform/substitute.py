"""Module-tree substitution: the graph-transform layer.

TPU-native re-design of the reference fx transform system
(reference: src/dmx/compressor/fx/transform.py, fx/transformer/utils.py,
fx/transformer/dmx_aware_transformer.py).  Where the reference traces a torch
model into an fx graph and replaces nodes, this build walks the nnx module
tree and replaces sub-modules in place, driven by the same op-substitution
tables.  Functional ops are interceptable because models are authored with
the :mod:`rawnn` wrapper modules (see that module's docstring for the design
rationale).

Substitution preserves parameters by construction (`from_raw` shares or
converts them) and is idempotent: already-Dmx modules are left alone, which
is the analogue of the reference's gm-reuse across retransformations
(dmx_aware_transformer.py:81-92).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, Optional, Tuple, Type

from flax import nnx

from .. import rawnn
from ..nn import modules as dmxnn
from ..nn.core import DmxModule


def _conv_from_raw(raw: nnx.Conv) -> DmxModule:
    nd = raw.kernel.value.ndim - 2
    cls = {1: dmxnn.Conv1d, 2: dmxnn.Conv2d}[nd]
    return cls.from_raw(raw)


# nnx standard modules -> Dmx modules (reference transformer/utils.py:12-28)
DMX_AWARE_MAPPING: Dict[Type, Callable] = {
    nnx.Linear: dmxnn.Linear.from_raw,
    nnx.Conv: _conv_from_raw,
    nnx.Embed: dmxnn.Embedding.from_raw,
    nnx.LayerNorm: dmxnn.LayerNorm.from_raw,
    nnx.RMSNorm: dmxnn.RMSNorm.from_raw,
    nnx.BatchNorm: dmxnn.BatchNorm2d.from_raw,
    nnx.GroupNorm: dmxnn.GroupNorm.from_raw,
    nnx.Dropout: dmxnn.Dropout.from_raw,
}

# rawnn functional-op wrappers -> Dmx modules
# (reference dmx_aware_functional_mappings, transformer/utils.py:53-66)
RAW_OP_MAPPING: Dict[Type, Callable] = {
    rawnn.ResAdd: dmxnn.ResAdd.from_raw,
    rawnn.Mul: dmxnn.Mul.from_raw,
    rawnn.MatMul: dmxnn.ActActMatMul.from_raw,
    rawnn.TiedLinear: dmxnn.Linear.from_tied,
    rawnn.BAddBMM: dmxnn.BAddBMM.from_raw,
    rawnn.Exp: dmxnn.Exp.from_raw,
    rawnn.Softmax: dmxnn.Softmax.from_raw,
    rawnn.ReLU: dmxnn.ReLU.from_raw,
    rawnn.ReLU6: dmxnn.ReLU6.from_raw,
    rawnn.SiLU: dmxnn.SiLU.from_raw,
    rawnn.Tanh: dmxnn.Tanh.from_raw,
    rawnn.GELU: dmxnn.GELU.from_raw,
    rawnn.NewGELU: dmxnn.NewGELU.from_raw,
    rawnn.FastGELU: dmxnn.FastGELU.from_raw,
    rawnn.QuickGELU: dmxnn.QuickGELU.from_raw,
    rawnn.BloomGELU: dmxnn.BloomGELU.from_raw,
    rawnn.Dropout: dmxnn.Dropout.from_raw,
    rawnn.ScaledDotProductAttention: dmxnn.ScaledDotProductAttention.from_raw,
    rawnn.ApplyRotaryPosEmb: dmxnn.ApplyRotaryPosEmb.from_raw,
    rawnn.RotaryEmbedding: dmxnn.RotaryEmbedding.from_raw,
    rawnn.RMSNorm: dmxnn.RMSNorm.from_raw,
    rawnn.GemmaRMSNorm: dmxnn.GemmaRMSNorm.from_raw,
    rawnn.ClippedGELU: dmxnn.ClippedGELU.from_raw,
}


def default_mapping() -> Dict[Type, Callable]:
    mapping = dict(DMX_AWARE_MAPPING)
    mapping.update(RAW_OP_MAPPING)
    return mapping


def _items(container):
    """(key, value) pairs of child slots in a module/list/dict container."""
    if isinstance(container, (nnx.Module, object)) and not isinstance(
        container, (list, tuple, dict)
    ):
        return list(vars(container).items())
    if isinstance(container, dict):
        return list(container.items())
    if isinstance(container, (list, tuple)):
        return list(enumerate(container))
    return []


def _set(container, key, value):
    if isinstance(container, dict):
        container[key] = value
    elif isinstance(container, list):
        container[key] = value
    else:
        setattr(container, key, value)


def _is_module_container(v) -> bool:
    return isinstance(v, (list, dict)) or isinstance(v, nnx.Module)


def substitute_transform(
    model: nnx.Module,
    additional_mappings: Optional[Dict[Type, Callable]] = None,
    filter_fn: Optional[Callable[[str], bool]] = None,
) -> nnx.Module:
    """Substitute raw modules with Dmx-aware ones, in place.

    ``additional_mappings`` extends the tables, mirroring the reference's
    ``additional_dmx_aware_mappings`` (tests/test_additional_mappings.py).
    ``filter_fn`` receives the dotted path and may veto substitution.
    Returns the model (whole-model substitution returns the new module when
    the root itself is mapped, reference transform.py:68-71).
    """
    mapping = default_mapping()
    if additional_mappings:
        mapping.update(additional_mappings)

    def convert(obj, path: str):
        fn = mapping.get(type(obj))
        if fn is not None and (filter_fn is None or filter_fn(path)):
            return fn(obj)
        return None

    root_sub = convert(model, "")
    if root_sub is not None:
        return root_sub

    seen = set()

    def walk(container, prefix: str):
        if id(container) in seen:
            return
        seen.add(id(container))
        for key, value in _items(container):
            if isinstance(key, str) and key.startswith("_"):
                continue
            path = f"{prefix}.{key}" if prefix else str(key)
            if isinstance(value, DmxModule):
                continue  # idempotent: keep existing Dmx modules & their state
            sub = convert(value, path) if isinstance(value, nnx.Module) else None
            if sub is not None:
                _set(container, key, sub)
            elif _is_module_container(value) and not isinstance(value, nnx.Variable):
                walk(value, path)

    walk(model, "")
    return model


def named_dmx_modules(model) -> Iterator[Tuple[str, DmxModule]]:
    """Iterate (dotted_path, module) over all DmxModules, compound children
    included (matching the reference's named_dmx_modules over fx modules)."""
    seen = set()

    def walk(container, prefix: str):
        if id(container) in seen:
            return
        seen.add(id(container))
        for key, value in _items(container):
            if isinstance(key, str) and key.startswith("_"):
                continue
            path = f"{prefix}.{key}" if prefix else str(key)
            if isinstance(value, DmxModule):
                yield path, value
                # compound modules host sub-DmxModules (e.g. SDPA)
                yield from walk(value, path)
            elif _is_module_container(value) and not isinstance(value, nnx.Variable):
                yield from walk(value, path)

    yield from walk(model, "")
