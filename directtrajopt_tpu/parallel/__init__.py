from .mesh import make_mesh, shard_batch, solve_batch_sharded

__all__ = ["make_mesh", "shard_batch", "solve_batch_sharded"]
