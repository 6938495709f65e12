from .io import (
    load_config_file,
    save_config_file,
    string_to_kwargs,
    kwargs_to_string,
    compute_md5,
)
from .checkpoint import (
    CheckpointManager,
    restore_checkpoint,
    restored_config,
    save_checkpoint,
)
