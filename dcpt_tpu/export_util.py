"""Serving export: restoration networks → portable StableHLO artifacts.

Beyond-reference capability (the torch reference has no deployment story —
its inference entry is the research ``basicsr/test.py`` loop): a trained
dcpt_tpu network is exported once with :mod:`jax.export` into a
self-contained, version-stable StableHLO artifact that a serving process
loads WITHOUT the model zoo, the yml config system, or even this package —
only jax is needed at load time.  TPU-first by construction:

* the artifact records the lowering for explicit ``platforms`` (default
  ``("tpu", "cpu")`` so the same file serves on TPU and can be smoke-tested
  on CPU);
* the batch dimension is exported SYMBOLICALLY (``jax.export`` shape
  polymorphism) — the server picks any batch size at run time while H/W stay
  static, preserving XLA's static-shape tiling for the MXU;
* params are baked into the artifact as constants (one file to ship) in the
  requested dtype (bf16 for the v5e fast path).

Usage (programmatic)::

    blob = export_network(net, params, height=128, width=128)
    restore = load_exported(blob)         # any process, any machine
    sr = restore(lq_batch)                # (b, 128, 128, 3) for ANY b

CLI (mirrors the test-pipeline surface)::

    python -m dcpt_tpu.export_util -opt options/.../test_NAFNet_5d.yml \
        --height 128 --width 128 --out nafnet_128.shlo
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_network(
    net,
    params,
    *,
    height: int,
    width: int,
    channels: int = 3,
    dtype=jnp.float32,
    platforms: tuple[str, ...] = ("tpu", "cpu"),
    symbolic_batch: bool = True,
) -> bytes:
    """Serialize ``net.apply`` with baked-in ``params`` to StableHLO bytes.

    The exported callable maps ``(b, height, width, channels) -> restored``
    with ``b`` symbolic (any positive batch) unless ``symbolic_batch=False``
    (then ``b`` is pinned to 1 — marginally faster serving for bs1 because
    no symbolic-dim bounds checks are traced).
    """
    cast = jax.tree.map(lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a, params)

    def fwd(x):
        out = net.apply({"params": cast}, x.astype(dtype))
        if isinstance(out, tuple):  # archs return (restored, taps)
            out = out[0]
        return out.astype(dtype)

    if symbolic_batch:
        (b,) = jax_export.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, height, width, channels), dtype)
    else:
        spec = jax.ShapeDtypeStruct((1, height, width, channels), dtype)
    exported = jax_export.export(jax.jit(fwd), platforms=list(platforms))(spec)
    return bytes(exported.serialize())


def export_network_dp(
    net,
    params,
    *,
    devices: int,
    height: int,
    width: int,
    channels: int = 3,
    dtype=jnp.float32,
    platforms: tuple[str, ...] = ("tpu", "cpu"),
) -> bytes:
    """Multi-chip serving artifact: the batch is sharded over ``devices``.

    The artifact records the mesh size and shardings (``Exported.nr_devices
    == devices``); the serving host calls it with a batch laid out over the
    same-sized mesh and XLA runs every chip in SPMD — no per-host batch
    slicing code needed.  Batch stays symbolic as ``devices·b`` (any multiple
    of the mesh size)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import numpy as np

    cast = jax.tree.map(lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a, params)

    def fwd(x):
        out = net.apply({"params": cast}, x.astype(dtype))
        return (out[0] if isinstance(out, tuple) else out).astype(dtype)

    mesh = Mesh(np.array(jax.devices()[:devices]), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    (b,) = jax_export.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((devices * b, height, width, channels), dtype, sharding=sharding)
    f = jax.jit(fwd, in_shardings=sharding, out_shardings=sharding)
    return bytes(jax_export.export(f, platforms=list(platforms))(spec).serialize())


def export_network_cp(
    net_cp,
    params,
    *,
    devices: int,
    height: int,
    width: int,
    halo: int,
    axis: str = "data",
    channels: int = 3,
    dtype=jnp.float32,
    platforms: tuple[str, ...] = ("tpu", "cpu"),
) -> bytes:
    """Context-parallel serving artifact: ONE huge image H-sharded over chips.

    Wraps :func:`dcpt_tpu.parallel.spatial.spatial_sharded_apply` (ppermute
    halo exchange; the arch's ``cp_*`` options keep global statistics exact
    via psums) and exports the whole sharded program — collectives included —
    as one artifact.  ``net_cp`` must be built with ``cp_axis=axis`` and
    ``cp_halo=halo`` (same contract as ``val.spatial_cp``); ``params`` come
    from the param-compatible plain net (cp psums cannot trace outside
    shard_map, so init with ``cp_axis=None``).  H and W are static — CP
    serving is for a fixed huge-image geometry."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import numpy as np

    from .parallel.spatial import spatial_sharded_apply

    # same exactness contract as val.spatial_cp: a halo/axis mismatch between
    # the wrapper and the arch's cp options silently breaks global statistics
    net_axis = getattr(net_cp, "cp_axis", None)
    net_halo = getattr(net_cp, "cp_halo", None)
    if net_axis is not None and net_axis != axis:
        raise ValueError(f"net_cp.cp_axis={net_axis!r} != export axis {axis!r}")
    if net_halo not in (None, 0) and net_halo != halo:
        raise ValueError(f"net_cp.cp_halo={net_halo} != export halo {halo}")
    if height % devices != 0:
        raise ValueError(f"H={height} must divide over {devices} shards")

    cast = jax.tree.map(lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
    mesh = Mesh(np.array(jax.devices()[:devices]), (axis,))
    sharding = NamedSharding(mesh, P(None, axis))

    def fwd(p, xs):
        out = net_cp.apply({"params": p}, xs.astype(dtype))
        return (out[0] if isinstance(out, tuple) else out).astype(dtype)

    def cp_apply(x):
        return spatial_sharded_apply(fwd, cast, x, mesh, halo=halo, axis=axis)

    spec = jax.ShapeDtypeStruct((1, height, width, channels), dtype, sharding=sharding)
    f = jax.jit(cp_apply, in_shardings=sharding, out_shardings=sharding)
    return bytes(jax_export.export(f, platforms=list(platforms))(spec).serialize())


def load_exported(blob_or_path, jit: bool = True):
    """bytes or file path → callable ``restore(x)`` running the artifact.

    ``jit=True`` (default) wraps the call for dispatch caching — right for
    real serving hosts where compilation is local.  On environments that
    remote-compile (e.g. a tunnel-attached dev TPU) the baked-in param
    constants make the program body large; pass ``jit=False`` there to call
    the artifact eagerly."""
    if isinstance(blob_or_path, str):
        with open(blob_or_path, "rb") as f:
            blob = f.read()
    else:
        blob = bytes(blob_or_path)
    exported = jax_export.deserialize(blob)
    return jax.jit(exported.call) if jit else exported.call


def main() -> None:
    import argparse
    import os.path as osp

    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("-opt", required=True, help="test yml (network_g + path.pretrain_network_g)")
    parser.add_argument("--height", type=int, required=True)
    parser.add_argument("--width", type=int, required=True)
    parser.add_argument("--out", required=True, help="output artifact path")
    parser.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    parser.add_argument("--platforms", default="tpu,cpu")
    parser.add_argument("--static-batch", action="store_true")
    args = parser.parse_args()

    from dcpt_tpu.archs import build_network
    from dcpt_tpu.models.base_model import BaseModel
    from dcpt_tpu.utils.options import yaml_load

    opt = yaml_load(args.opt)
    net = build_network(dict(opt["network_g"]))
    # init on the host CPU device: full-size param init must not run through
    # a remote accelerator (CLAUDE.md: init large params on CPU first)
    with jax.default_device(jax.devices("cpu")[0]):
        init = net.init(jax.random.PRNGKey(0), jnp.zeros((1, args.height, args.width, 3)))["params"]
    load_path = (opt.get("path") or {}).get("pretrain_network_g")
    if load_path:
        # the loader is stateless (verified: no self attrs) — reuse it without
        # instantiating the full model/optimizer stack
        params = BaseModel.load_network_params(
            None, net, load_path, param_key=(opt.get("path") or {}).get("param_key_g", "params"),
            init_params=init)
    else:
        params = init

    blob = export_network(
        net, params, height=args.height, width=args.width,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        platforms=tuple(args.platforms.split(",")),
        symbolic_batch=not args.static_batch,
    )
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out} ({osp.getsize(args.out):,} bytes)")


if __name__ == "__main__":
    main()
