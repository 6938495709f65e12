"""Visualization helpers: braille sparsity masks and model trees.

TPU-native port of the reference visualization utilities
(reference: src/dmx/compressor/utils/visualization.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def mask2braille(mask, dims: Sequence[int] = (0, 1), max_elems: int = 4096) -> str:
    """Render a binary mask as braille dot-art (each char = 4x2 cells)."""
    m = np.asarray(mask)
    if m.ndim > 2:
        keep = [d % m.ndim for d in dims]
        other = tuple(i for i in range(m.ndim) if i not in keep)
        m = m.transpose(*keep, *other).reshape(m.shape[keep[0]], -1)
    elif m.ndim == 1:
        m = m[None, :]
    if m.size > max_elems:
        factor = int(np.ceil(np.sqrt(m.size / max_elems)))
        H = (m.shape[0] // factor) * factor
        W = (m.shape[1] // factor) * factor
        m = m[:H, :W].reshape(H // factor, factor, W // factor, factor).max((1, 3))
    H, W = m.shape
    ph, pw = (-H) % 4, (-W) % 2
    m = np.pad(m, ((0, ph), (0, pw)))
    H, W = m.shape
    # braille bit layout per 4x2 cell
    weights = np.array([[0x01, 0x08], [0x02, 0x10], [0x04, 0x20], [0x40, 0x80]])
    rows = []
    for r in range(0, H, 4):
        chars = []
        for c in range(0, W, 2):
            cell = (m[r : r + 4, c : c + 2] > 0).astype(int)
            code = 0x2800 + int((cell * weights).sum())
            chars.append(chr(code))
        rows.append("".join(chars))
    return "\n".join(rows)


def print_model_tree(model, printer=print) -> str:
    """ASCII tree of the module hierarchy with Dmx modules annotated."""
    from ..nn.core import DmxModule

    lines = []

    def walk(obj, name, depth, seen):
        if id(obj) in seen:
            return
        seen.add(id(obj))
        tag = type(obj).__name__
        if isinstance(obj, DmxModule):
            fmts = []
            if obj.weight_format is not None:
                fmts.append(f"w={repr(obj.weight_format)}")
            inp = obj.input_formats.get("input_cast")
            if inp is not None:
                fmts.append(f"in={repr(inp)}")
            tag += " [" + ", ".join(fmts) + "]" if fmts else ""
        lines.append("  " * depth + f"{name}: {tag}")
        items = []
        if isinstance(obj, (list, tuple)):
            items = list(enumerate(obj))
        elif hasattr(obj, "__dict__"):
            items = [
                (k, v)
                for k, v in vars(obj).items()
                if not (isinstance(k, str) and k.startswith("_"))
            ]
        for k, v in items:
            from flax import nnx

            if isinstance(v, (nnx.Module, list)) and not isinstance(v, nnx.Variable):
                walk(v, str(k), depth + 1, seen)

    walk(model, "model", 0, set())
    out = "\n".join(lines)
    if printer:
        printer(out)
    return out
