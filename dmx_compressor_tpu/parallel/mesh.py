"""Device mesh construction and sharding rules for quantized models.

The reference's only multi-device mechanism is accelerate whole-layer
placement (reference: modeling/hf.py:252-311 balanced_device_map); this build
replaces it with XLA GSPMD: a ``jax.sharding.Mesh`` over ICI/DCN axes and
PartitionSpec rules per parameter path.  XLA inserts all_gather /
reduce_scatter / psum collectives automatically from the annotations (the
"How to Scale Your Model" recipe).

Sharding quantized tensors: per-block scales must stay co-located with their
blocks.  All rules here shard weights only along dimensions that are NOT the
quantization block axis, or along it in multiples of the block size
(Linear [out, in] with block_dim=-1: tensor-parallel sharding of `out` is
always safe; sharding `in` requires in % (tp * block_size) == 0, which holds
for transformer dims with block 16..128).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Sequence[int],
    axis_names: Sequence[str] = ("dp", "tp"),
    devices=None,
) -> Mesh:
    """Mesh over the first prod(shape) devices; ICI-major ordering."""
    devices = devices if devices is not None else jax.devices()
    n = int(np.prod(shape))
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    return Mesh(np.array(devices[:n]).reshape(shape), tuple(axis_names))


# (path regex, PartitionSpec) — first match wins.  Weight layout is the torch
# convention [out, in] (nn/modules.py Linear), so "column parallel" = shard
# dim 0, "row parallel" = shard dim 1.
TRANSFORMER_RULES: Tuple[Tuple[str, P], ...] = (
    # attention QKV and MLP up: column parallel (shard out over tp)
    (r".*(q_proj|k_proj|v_proj|fc1|gate_proj|up_proj).*weight$", P("tp", None)),
    (r".*(q_proj|k_proj|v_proj|fc1|gate_proj|up_proj).*bias$", P("tp")),
    # attention out and MLP down: row parallel (shard in over tp)
    (r".*(out_proj|o_proj|fc2|down_proj).*weight$", P(None, "tp")),
    (r".*(out_proj|o_proj|fc2|down_proj).*bias$", P()),
    # embeddings: shard vocab over tp
    (r".*embed_tokens.*", P("tp", None)),
    (r".*embed_positions.*", P(None)),
    # per-channel quantizer state on column-parallel modules follows out dim
    (r".*(q_proj|k_proj|v_proj|fc1).*(scale|zero_point)$", P()),
    # norms and everything else: replicated
    (r".*", P()),
)


def spec_for_path(path: str, rules=TRANSFORMER_RULES) -> P:
    for pat, spec in rules:
        if re.fullmatch(pat, path):
            return spec
    return P()


def _path_str(path) -> str:
    return ".".join(str(getattr(p, "key", p)) for p in path)


def shard_state(state, mesh: Mesh, rules=TRANSFORMER_RULES, data_axis: str = "dp"):
    """Apply NamedShardings to an nnx State pytree by path rules.

    Specs are rank-clipped to each leaf and dropped when the dimension size
    does not divide the mesh axis (falls back to replication on that dim).
    """

    def shard_leaf(path, leaf):
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return jax.device_put(leaf, NamedSharding(mesh, P()))
        spec = spec_for_path(_path_str(path), rules)
        dims = list(spec) + [None] * (leaf.ndim - len(spec))
        dims = dims[: leaf.ndim]
        for i, ax in enumerate(dims):
            if ax is not None and leaf.shape[i] % mesh.shape[ax] != 0:
                dims[i] = None
        return jax.device_put(leaf, NamedSharding(mesh, P(*dims)))

    return jax.tree_util.tree_map_with_path(shard_leaf, state)


def data_sharding(mesh: Mesh, data_axis: str = "dp") -> NamedSharding:
    """Batch-dim sharding for inputs."""
    return NamedSharding(mesh, P(data_axis))
