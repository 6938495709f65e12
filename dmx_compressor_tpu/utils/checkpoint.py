"""Orbax checkpoint / resume for quantized models.

The reference's only persistence is per-module pickle state-dicts registered
by URL (reference modeling/nn/core.py:112-132, utils.py:24-30) plus whole-
model config freeze/thaw to yaml (model.py:116-132) — there are no training
checkpoints at all (SURVEY §5 "Checkpoint / resume").  The TPU-native
equivalent named there is built here: one orbax checkpoint holding

- ``model``   — every nnx variable of the model: parameters AND quantizer
  state (CastTo scale/zero_point, observer min/max/histograms, SmoothQuant
  maxabs, sparsifier scores, packed payloads), as a flat ``path -> array``
  tree;
- ``opt``     — an optional optimizer-state pytree (optax), so QAT /
  fine-tuning resumes bit-exactly;
- ``meta``    — JSON: the step number plus the frozen DmxConfig yaml (the
  "config tree"), so a restored model can have its formats/sparseness/
  approximations re-applied without the original python setup code.

Sharding-aware by construction: leaves are saved with whatever
``jax.sharding`` they carry (orbax writes per-shard), and ``restore_*``
builds its abstract target from the LIVE model state — a model whose state
was placed with ``parallel.mesh.shard_state`` restores directly into the
same placement, no host-side gather/scatter round-trip.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "restored_config",
    "CheckpointManager",
]


# per-forward diagnostic buffers — input-shaped, recomputed every call; a
# model that has run a forward must checkpoint the same tree as one that
# hasn't
_TRANSIENT = ("approximation_error",)


def _flat_arrays(model) -> Dict[str, Any]:
    """Model state as {path-string: array}; non-array variables (python
    scalars, None) and transient diagnostics are excluded — they are static
    config / per-call scratch, not checkpoint state."""
    flat = {}
    for path, leaf in nnx.to_flat_state(nnx.state(model)):
        v = leaf.value if hasattr(leaf, "value") else leaf
        if v is None or not hasattr(v, "shape"):
            continue
        if np.prod(v.shape) == 0:
            continue  # zero-size placeholder (e.g. uncalibrated maxabs)
        if str(path[-1]) in _TRANSIENT:
            continue
        flat["/".join(str(p) for p in path)] = v
    return flat


def _abstract_like(flat: Dict[str, Any]) -> Dict[str, Any]:
    def abs_leaf(x):
        sharding = x.sharding if isinstance(x, jax.Array) else None
        return jax.ShapeDtypeStruct(np.shape(x), x.dtype, sharding=sharding)

    return {k: abs_leaf(v) for k, v in flat.items()}


def _apply_flat(model, flat: Dict[str, Any]) -> None:
    updates = []
    for path, leaf in nnx.to_flat_state(nnx.state(model)):
        k = "/".join(str(p) for p in path)
        if k in flat:
            v = flat[k]
            if not isinstance(v, jax.Array):
                v = jnp.asarray(v)
            leaf = leaf.replace(v) if hasattr(leaf, "replace") else v
        updates.append((path, leaf))
    nnx.update(model, nnx.from_flat_state(updates))


def _config_yaml(model) -> Optional[str]:
    """Frozen DmxConfig yaml for the model (or its wrapped module), if it
    carries any DmxModules."""
    from ..modeling.model import DmxConfig
    from .io import dump_config_str

    module = getattr(model, "_module", model)
    try:
        cfg = DmxConfig.from_model(module, freeze=False)
    except Exception:
        return None
    if not cfg:
        return None
    return dump_config_str({k: dict(v) for k, v in cfg.items()})


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.Checkpointer(ocp.CompositeCheckpointHandler())


def save_checkpoint(
    path: str,
    model,
    *,
    optimizer_state: Any = None,
    step: int = 0,
    force: bool = True,
) -> str:
    """Write one composite orbax checkpoint at ``path`` (a directory).

    ``model`` may be a raw nnx module or a ``DmxModel``-wrapped one; the
    frozen DmxConfig is recorded when the model carries DmxModules."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    meta = {"step": int(step), "dmx_config_yaml": _config_yaml(model)}
    items = dict(
        model=ocp.args.StandardSave(_flat_arrays(model)),
        meta=ocp.args.JsonSave(meta),
    )
    if optimizer_state is not None:
        items["opt"] = ocp.args.StandardSave(optimizer_state)
    with _checkpointer() as ckptr:
        ckptr.save(path, args=ocp.args.Composite(**items), force=force)
    return path


def restore_checkpoint(
    path: str,
    model,
    *,
    optimizer_state: Any = None,
) -> Tuple[int, Any]:
    """Restore ``model`` (in place) from ``path``; returns (step,
    optimizer_state).  Shapes/dtypes/shardings are taken from the live model
    state, so a sharded model restores sharded.  Pass the current
    ``optimizer_state`` pytree as the restore template to also resume the
    optimizer."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    items = dict(
        model=ocp.args.StandardRestore(_abstract_like(_flat_arrays(model))),
        meta=ocp.args.JsonRestore(),
    )
    if optimizer_state is not None:
        items["opt"] = ocp.args.StandardRestore(
            jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(
                    np.shape(x), x.dtype,
                    sharding=x.sharding if isinstance(x, jax.Array) else None,
                ),
                optimizer_state,
            )
        )
    with _checkpointer() as ckptr:
        restored = ckptr.restore(path, args=ocp.args.Composite(**items))
    _apply_flat(model, dict(restored["model"]))
    opt = restored["opt"] if optimizer_state is not None else None
    return int(restored["meta"]["step"]), opt


def restored_config(path: str):
    """The DmxConfig stored in the checkpoint (or None) — apply with
    ``DmxModel.configure`` after writing to yaml, or use directly as a
    config dict."""
    import orbax.checkpoint as ocp

    from ..modeling.model import DmxConfig
    from .io import load_config_str

    with _checkpointer() as ckptr:
        meta = ckptr.restore(
            os.path.abspath(path),
            args=ocp.args.Composite(meta=ocp.args.JsonRestore()),
        )["meta"]
    text = meta.get("dmx_config_yaml")
    if not text:
        return None
    return DmxConfig({k: v for k, v in load_config_str(text).items()})


class CheckpointManager:
    """Step-numbered training checkpoints with retention, on top of
    :func:`save_checkpoint`'s layout.

    >>> mgr = CheckpointManager(dir, max_to_keep=3)
    >>> mgr.save(step, model, optimizer_state=opt_state)
    >>> step, opt_state = mgr.restore_latest(model, optimizer_state=opt_state)
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        self.max_to_keep = max_to_keep
        os.makedirs(self.directory, exist_ok=True)

    def _step_dir(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:010d}")

    def steps(self):
        out = []
        for name in os.listdir(self.directory):
            if name.startswith("step_"):
                try:
                    out.append(int(name[5:]))
                except ValueError:
                    pass
        return sorted(out)

    def save(self, step: int, model, *, optimizer_state: Any = None) -> str:
        path = save_checkpoint(
            self._step_dir(step), model,
            optimizer_state=optimizer_state, step=step,
        )
        extra = self.steps()[: -self.max_to_keep or None]
        if self.max_to_keep:
            import shutil

            for s in extra:
                shutil.rmtree(self._step_dir(s), ignore_errors=True)
        return path

    def restore_latest(self, model, *, optimizer_state: Any = None):
        steps = self.steps()
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        return restore_checkpoint(
            self._step_dir(steps[-1]), model, optimizer_state=optimizer_state
        )
