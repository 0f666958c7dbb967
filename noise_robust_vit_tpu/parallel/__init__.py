"""Device-mesh parallelism (replaces the reference's NCCL/DDP stack).

The reference scales only by data parallelism — DDP gradient all-reduce,
SyncBatchNorm, all_gather of eval features (SURVEY.md §2.5). Here that maps
onto a `jax.sharding.Mesh`: batches are sharded over the ``data`` axis,
parameters replicated (or sharded over ``model`` for tensor parallelism the
reference never had), and XLA inserts the ICI collectives.
"""

from .mesh import (
    batch_sharding,
    local_mesh,
    make_mesh,
    replicated,
    shard_batch,
)
from .distributed import (
    global_mesh,
    init_distributed,
    local_batch_to_global,
    process_info,
    setup_print_once,
)
from .fsdp import fsdp_param_shardings, shard_params_fsdp
from .pp import pipeline_forward, pipeline_shardings, stack_layer_params
from .tp import (
    DEFAULT_TP_RULES,
    constrain_activation,
    shard_params,
    tp_param_shardings,
    tp_shardings_active,
)

__all__ = [
    "batch_sharding",
    "global_mesh",
    "init_distributed",
    "local_batch_to_global",
    "process_info",
    "setup_print_once",
    "fsdp_param_shardings",
    "shard_params_fsdp",
    "pipeline_forward",
    "pipeline_shardings",
    "stack_layer_params",
    "local_mesh",
    "make_mesh",
    "replicated",
    "shard_batch",
    "DEFAULT_TP_RULES",
    "constrain_activation",
    "shard_params",
    "tp_param_shardings",
    "tp_shardings_active",
]
