"""Device mesh + sharding helpers — the framework's parallelism substrate.

The reference scales with DDP data parallelism only (SURVEY §2.9:
``basicsr/utils/dist_util.py`` + DDP wrap in ``base_model.py:100-118``).  The
TPU-native equivalent is a ``jax.sharding.Mesh`` with batch-dim
``NamedSharding``: jit compiles the gradient all-reduce onto ICI, replacing
NCCL/DDP entirely.  The mesh axes here are ('data',) by default; a second
implemented axis is 'spatial' — huge-image context parallelism that shards H
across devices with halo exchange while keeping MDTA statistics globally
exact (``parallel/spatial.py``, ``Restormer(cp_axis=..., cp_halo=...)``; both
axes exercised together by ``dryrun_multichip`` in ``__graft_entry__.py``).
Arbitrary axis names from ``parallel.mesh_shape`` in the yml are accepted.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_default_mesh: Mesh | None = None


def make_mesh(mesh_shape: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a mesh; default = all devices on one 'data' axis."""
    if devices is None:
        devices = jax.devices()
    if not mesh_shape:
        mesh_shape = {"data": len(devices)}
    axis_names = tuple(mesh_shape.keys())
    shape = tuple(mesh_shape.values())
    n = int(np.prod(shape))
    assert n <= len(devices), f"mesh {mesh_shape} needs {n} devices, have {len(devices)}"
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, axis_names)


def get_default_mesh(opt: dict | None = None) -> Mesh:
    """Process-wide mesh, configured once from the run options."""
    global _default_mesh
    if _default_mesh is None:
        mesh_shape = None
        if opt is not None:
            mesh_shape = (opt.get("parallel") or {}).get("mesh_shape")
            num = opt.get("num_gpu")
            if mesh_shape is None and isinstance(num, int) and num > 0:
                # num_gpu is per-host (reference semantics); the mesh is GLOBAL,
                # so multi-host runs span world_size × num_gpu devices
                total = num * opt.get("world_size", 1) if opt.get("dist") else num
                mesh_shape = {"data": min(total, len(jax.devices()))}
        _default_mesh = make_mesh(mesh_shape)
    return _default_mesh


def set_default_mesh(mesh: Mesh | None) -> None:
    global _default_mesh
    _default_mesh = mesh


def shard_batch(array, mesh: Mesh, axis: str = "data"):
    """Place an array on the mesh, sharded along dim 0 over ``axis``."""
    spec = P(axis) if axis in mesh.axis_names else P()
    return jax.device_put(array, NamedSharding(mesh, spec))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
