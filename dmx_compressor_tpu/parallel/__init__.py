from .mesh import (
    make_mesh,
    shard_state,
    spec_for_path,
    data_sharding,
    TRANSFORMER_RULES,
)
from .distributed import initialize, pod_mesh, host_local_batch
from .pipeline import pipeline_forward, stack_layer_states
from .sequence import ring_attention
