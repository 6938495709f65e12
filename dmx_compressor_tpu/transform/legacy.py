"""Legacy flat-graph transformers over the DmxGraph IR.

Analogues of the reference's fx-era transformers (reference
fx/transformer/input_output_transformer.py, configuration_transformer.py,
nodedict_transformer.py; entry point ``cast_input_output_transform``,
fx/transform.py:204), re-targeted at this build's :class:`DmxGraph` IR:

- :func:`cast_input_output_transform` — wrap every placeholder, ``get_attr``
  weight edge, and the output edge of a flat graph in Q/DQ pairs;
- :func:`configure_graph` — re-set the format annotation of existing Q/DQ
  pairs from a ``{node-name-regex: format-shorthand}`` config (the
  yaml-driven ConfigurationTransformer flow);
- :func:`node_dict` — name → Node map for visualization (NodeDictTransformer).

These operate purely on the IR (no module state), matching the legacy
transformers' role of preparing compiler-facing graphs.
"""

from __future__ import annotations

import re
from typing import Dict, Optional

from .qdq import DmxGraph, Node


def node_dict(graph: DmxGraph) -> Dict[str, Node]:
    """name -> Node map (reference NodeDictTransformer)."""
    return {n.name: n for n in graph.nodes}


def _rewire(graph: DmxGraph, old: Node, new: Node) -> None:
    """Point every consumer of ``old`` (other than ``new``'s own chain) at
    ``new``."""
    for n in graph.nodes:
        if n is new or n.op in ("placeholder", "get_attr"):
            continue
        if any(a is old for a in n.args):
            # skip the quantize node that feeds the new chain
            if n.target == "dmx.quantize" and n.cast_name == new.cast_name:
                continue
            n.args = tuple(new if a is old else a for a in n.args)


def cast_input_output_transform(
    graph: DmxGraph,
    input_format: str = "SAME",
    output_format: str = "SAME",
    weight_format: Optional[str] = None,
    cast_prefix: str = "io",
) -> DmxGraph:
    """Add Q/DQ pairs around every placeholder, optional weight ``get_attr``,
    and the output edge (reference InputOutputTransformer flow: every
    placeholder/output/weight get_attr is followed by the right cast node;
    tests assert the same topology, reference tests/test_transforms.py:43-76).

    Formats are shorthand strings recorded as edge annotations; the graph
    stays purely declarative (the IR's Q/DQ pairs evaluate as fake-quant
    casts only where a module provides the cast state).
    """
    out_node = next(n for n in graph.nodes if n.op == "output")
    graph.nodes.remove(out_node)

    for n in list(graph.nodes):
        if n.op == "placeholder":
            dq = graph.qdq(n, f"{cast_prefix}.input_casts.{n.name}", input_format)
            _rewire(graph, n, dq)
        elif n.op == "get_attr" and weight_format is not None:
            leaf = str(n.target).rsplit(".", 1)[-1]
            if leaf in ("weight", "kernel"):
                dq = graph.qdq(
                    n, f"{cast_prefix}.weight_casts.{n.name}", weight_format
                )
                _rewire(graph, n, dq)

    result = out_node.args[0]
    if isinstance(result, Node):
        result = graph.qdq(
            result, f"{cast_prefix}.output_casts.output", output_format
        )
    graph.output(result)
    return graph


def configure_graph(graph: DmxGraph, config: Dict[str, str]) -> int:
    """Re-set the ``cast_format`` annotation of existing Q/DQ pairs whose
    *node name* matches a config key regex (reference
    ConfigurationTransformer: formats of existing casts re-set from a yaml
    cfg keyed by scope).  Returns the number of nodes updated."""
    updated = 0
    for pattern, fmt in config.items():
        rx = re.compile(pattern)
        for n in graph.nodes:
            if (
                n.op == "call_function"
                and n.target in ("dmx.quantize", "dmx.dequantize")
                and n.cast_name is not None
                and (rx.fullmatch(n.name) or rx.fullmatch(n.cast_name))
            ):
                n.cast_format = fmt
                if n.target == "dmx.quantize":
                    n.args = n.args[:3] + (fmt,)
                updated += 1
    return updated
