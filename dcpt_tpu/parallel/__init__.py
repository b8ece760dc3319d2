from .mesh import get_default_mesh, make_mesh, replicate, set_default_mesh, shard_batch

__all__ = ["get_default_mesh", "make_mesh", "replicate", "set_default_mesh", "shard_batch"]
