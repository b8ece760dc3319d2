from .mesh import get_default_mesh, make_mesh, replicate, shard_batch

__all__ = ["get_default_mesh", "make_mesh", "replicate", "shard_batch"]
