"""Multi-host distributed helpers — the dist_util API surface on JAX.

The reference wraps NCCL process groups (``basicsr/utils/dist_util.py:11-82``);
on TPU the analog is ``jax.distributed.initialize()`` per host, with rank/world
from ``jax.process_index/count``.  Collectives are compiled by XLA inside jit —
no explicit communication API is needed at this layer.
"""

from __future__ import annotations

import functools


def init_dist(launcher: str = "jax", backend: str | None = None, **kwargs) -> None:
    """Initialise multi-host JAX (reference init_dist, dist_util.py:11-19).

    No-op when running single-process (e.g. local testing)."""
    import jax

    if launcher in ("none", None):
        return
    if jax.distributed.is_initialized():
        return
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:  # single-process fallback (no coordinator env)
        import logging

        logging.getLogger("dcpt_tpu").warning(f"jax.distributed.initialize failed ({e}); running single-process")


def get_dist_info() -> tuple[int, int]:
    """(rank, world_size) (reference: dist_util.py:61-72)."""
    try:
        import jax

        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def barrier(name: str, timeout_s: int = 600) -> None:
    """Block until every process reaches this point (no-op single-process).

    Uses the coordination-service barrier (long, explicit timeout) rather than
    a device collective: after rank-0-only work (validation, checkpoint I/O)
    the other ranks may wait MINUTES here, and a collective's backend context
    init (e.g. Gloo's 30 s key-value deadline on CPU meshes) would time out —
    observed as ``Gloo context initialization failed: DEADLINE_EXCEEDED`` when
    rank 1 raced into the next training collective mid-validation."""
    import jax

    if jax.process_count() == 1:
        return
    try:
        from jax._src import distributed

        client = distributed.global_state.client
        if client is not None:
            client.wait_at_barrier(f"dcpt_{name}", timeout_in_ms=timeout_s * 1000)
            return
    except Exception:
        pass
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def master_only(func):
    """Run only on rank 0 (reference: dist_util.py:75-82)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        rank, _ = get_dist_info()
        if rank == 0:
            return func(*args, **kwargs)

    return wrapper
