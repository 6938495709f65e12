"""Pipeline parallelism: GPipe microbatching over a ``pp`` mesh axis.

The reference has no pipeline engine — its nearest analogue is accelerate
whole-layer placement (reference modeling/hf.py:252-311), which moves
tensors between GPUs inside eager forward.  The TPU-native design instead
compiles ONE program for all stages with ``shard_map``: every device holds
its contiguous slice of the (stacked) layer parameters, microbatches flow
stage-to-stage over ICI via ``lax.ppermute``, and the whole schedule —
fill, steady state, drain — is a single ``lax.scan`` XLA can pipeline.

Schedule: classic GPipe.  With S stages and M microbatches the loop runs
``M + S - 1`` ticks; stage 0 ingests microbatch ``t`` at tick ``t``, stage
``S-1`` emits microbatch ``t-(S-1)`` at tick ``t``.  Bubble fraction is
``(S-1)/(M+S-1)`` — pick ``M >= 4*S`` for >80% utilization.

Composes with the dp/tp shardings in parallel/mesh.py: the microbatch batch
dim may additionally be sharded over ``dp``, and ``layer_apply`` may contain
tp-sharded matmuls (XLA GSPMD handles those inside each stage).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def stack_layer_states(states: Sequence[Any]):
    """Stack per-layer pytrees (e.g. from ``nnx.split`` of each decoder
    layer) into one pytree with a leading layer dim — the layout
    ``pipeline_forward`` shards over stages."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def pipeline_forward(
    stacked_params,
    x,
    layer_apply: Callable[[Any, jax.Array], jax.Array],
    mesh: Mesh,
    *,
    num_microbatches: int,
    pp_axis: str = "pp",
    dp_axis: str | None = None,
    param_specs=None,
):
    """Run ``x`` through L stacked layers, pipelined over ``mesh[pp_axis]``.

    ``stacked_params``: pytree with leading dim L (``stack_layer_states``);
    L must divide by the number of stages S.  ``x``: [B, ...] with
    B % num_microbatches == 0.  ``layer_apply(params_i, h) -> h`` applies
    one layer.  Returns ``layer_L(...layer_1(x))`` — identical (up to fp
    reassociation) to the sequential loop, with stage-to-stage transfers on
    ICI and a single compiled schedule.

    ``param_specs`` (optional): per-leaf PartitionSpecs for the STAGED
    params (leading dims [S, L/S, ...]) to compose tensor parallelism with
    the pipeline — e.g. ``P("pp", None, None, "tp")`` column-shards a
    [S, L/S, d, f] weight over a ``tp`` mesh axis; ``layer_apply`` then
    sees tp-local shards and must ``lax.psum(.., "tp")`` after its
    row-parallel contraction (the Megatron pattern, manual-collective form).
    Default: params sharded over ``pp`` only.
    """
    S = mesh.shape[pp_axis]
    M = num_microbatches
    L = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    assert L % S == 0, f"{L} layers do not divide into {S} stages"
    B = x.shape[0]
    assert B % M == 0, f"batch {B} does not divide into {M} microbatches"

    # [L, ...] -> [S, L/S, ...]; stage dim sharded over pp
    staged = jax.tree_util.tree_map(
        lambda a: a.reshape((S, L // S) + a.shape[1:]), stacked_params
    )
    mb = x.reshape((M, B // M) + x.shape[1:])

    if param_specs is None:
        param_specs = jax.tree_util.tree_map(lambda _: P(pp_axis), staged)
    mb_spec = P(None, dp_axis) if dp_axis else P()
    out_spec = P(dp_axis) if dp_axis else P()

    def stage_body(params_local, mb_local):
        # local shapes: params [1, L/S, ...], mb [M, B/M(, /dp), ...]
        params_block = jax.tree_util.tree_map(lambda a: a[0], params_local)
        stage = lax.axis_index(pp_axis)

        def apply_block(h):
            def body(h, p):
                return layer_apply(p, h), None

            h, _ = lax.scan(body, h, params_block)
            return h

        perm = [(i, i + 1) for i in range(S - 1)]
        zero = jnp.zeros_like(mb_local[0])
        outputs0 = jnp.zeros_like(mb_local)

        def tick(carry, t):
            state, outputs = carry
            # stage 0 ingests microbatch t (clamped; ticks >= M feed stale
            # data whose results drain past the loop and are never read)
            fresh = mb_local[jnp.minimum(t, M - 1)]
            state = jnp.where(stage == 0, fresh, state)
            out = apply_block(state)
            # collect on the last stage: tick t completes microbatch t-(S-1)
            t_out = t - (S - 1)
            slot = jnp.maximum(t_out, 0)
            current = lax.dynamic_index_in_dim(outputs, slot, 0, keepdims=False)
            outputs = lax.dynamic_update_index_in_dim(
                outputs, jnp.where(t_out >= 0, out, current), slot, 0
            )
            if S > 1:
                state = lax.ppermute(out, pp_axis, perm)
            else:
                state = out
            return (state, outputs), None

        (_, outputs), _ = lax.scan(
            tick, (zero, outputs0), jnp.arange(M + S - 1)
        )
        # only the last stage's buffer is the real result; masked psum
        # replicates it across the pp axis
        outputs = jnp.where(stage == S - 1, outputs, jnp.zeros_like(outputs))
        return lax.psum(outputs, pp_axis)

    y_mb = shard_map(
        stage_body,
        mesh=mesh,
        in_specs=(param_specs, mb_spec),
        out_specs=mb_spec,
        check_rep=False,
    )(staged, mb)
    return y_mb.reshape((B,) + y_mb.shape[2:])
