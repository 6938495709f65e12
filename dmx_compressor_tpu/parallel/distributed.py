"""Multi-host startup and cross-host data utilities.

The reference has no distributed runtime at all (SURVEY §2.10: no
torch.distributed/NCCL anywhere); multi-host here is native JAX:
``jax.distributed.initialize`` for process bootstrap, a global mesh spanning
ICI within a slice and DCN across hosts, and host-local data feeding with
``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bootstrap multi-host JAX (no-op for single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def pod_mesh(
    dcn_axis: str = "dp",
    ici_axes: Sequence[str] = ("tp",),
    ici_shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Mesh with the data axis over DCN (hosts) and model axes over ICI.

    Collectives on ``ici_axes`` ride the intra-slice interconnect; only the
    ``dcn_axis`` (gradient/batch) communication crosses hosts — the layout
    the scaling-book recipe prescribes.
    """
    n_proc = jax.process_count()
    per_proc = jax.local_device_count()
    if ici_shape is None:
        ici_shape = (per_proc,) if len(ici_axes) == 1 else None
    assert ici_shape is not None and int(np.prod(ici_shape)) == per_proc
    devices = np.array(jax.devices()).reshape((n_proc, *ici_shape))
    return Mesh(devices, (dcn_axis, *ici_axes))


def host_local_batch(global_batch: np.ndarray, mesh: Mesh, data_axis: str = "dp"):
    """Assemble a globally-sharded batch from per-host local data."""
    sharding = NamedSharding(mesh, P(data_axis))
    return jax.make_array_from_process_local_data(sharding, global_batch)
