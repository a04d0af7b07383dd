from .mesh import (
    classifier_sharding,
    create_mesh,
    create_multislice_mesh,
    data_sharding,
    is_main_process,
    maybe_initialize_distributed,
    replicated,
    shard_batch,
)
from .sharded_cosface import (
    cosface_ce_sharded,
    local_margin_logits,
    shard_one_hot,
    sharded_softmax_ce,
)

__all__ = [
    "classifier_sharding",
    "create_mesh",
    "create_multislice_mesh",
    "data_sharding",
    "is_main_process",
    "maybe_initialize_distributed",
    "replicated",
    "shard_batch",
    "cosface_ce_sharded",
    "local_margin_logits",
    "shard_one_hot",
    "sharded_softmax_ce",
]
