from .mesh import (
    init_distributed,
    make_mesh,
    shard_batch,
    solve_batch_compact_sharded,
    solve_batch_sharded,
    weak_scaling,
)

__all__ = [
    "init_distributed",
    "make_mesh",
    "shard_batch",
    "solve_batch_compact_sharded",
    "solve_batch_sharded",
    "weak_scaling",
]
