from .sharding import ShardedSolver

__all__ = ["ShardedSolver"]
