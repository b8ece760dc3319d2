from .mesh import get_default_mesh, make_mesh, replicate, set_default_mesh, shard_batch
from .zero import shard_opt_state, zero_specs

__all__ = ["get_default_mesh", "make_mesh", "replicate", "set_default_mesh",
           "shard_batch", "shard_opt_state", "zero_specs"]
