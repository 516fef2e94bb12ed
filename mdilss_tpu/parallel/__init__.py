from .mesh import (
    jit_distill_step,
    jit_eval_step,
    jit_train_step,
    make_mesh,
    replicate,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "jit_train_step",
    "jit_distill_step",
    "jit_eval_step",
]
