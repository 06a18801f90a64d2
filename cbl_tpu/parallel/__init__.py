from .shard import ShardedCBL, make_mesh

__all__ = ["ShardedCBL", "make_mesh"]
