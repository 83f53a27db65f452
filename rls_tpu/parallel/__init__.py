from .mesh import (
    batch_sharding,
    make_mesh,
    row_sharded_operator,
    shard_batch,
    solve_batched_sharded,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "shard_batch",
    "row_sharded_operator",
    "solve_batched_sharded",
]
