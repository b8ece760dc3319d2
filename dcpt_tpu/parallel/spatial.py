"""Spatial (height) sharding for huge-image inference — the context-parallel
analog for restoration nets.

The reference handles large images with host-looped halo tiling
(``SRModel.test_tile``, sr_model.py:273-361).  On a TPU mesh the same
halo-overlap idea runs in PARALLEL: the image's H dimension is sharded across
the 'data' axis with ``shard_map``; each device exchanges ``halo`` boundary
rows with its neighbours over ICI (``jax.lax.ppermute``), runs the network on
its slice + halo, and crops the halo off.  Outer edges reflect-pad, matching
the eval harness's padding convention.

Accuracy has the same contract as ``test_tile``: exact when ``halo`` covers the
conv receptive field; global-pool layers (NAFNet's SCA) see per-shard
statistics unless the arch cooperates.  All four flagship archs do (their
``cp_axis``/``cp_halo`` options, param-free):

* ``NAFNetBaseline``: SCA's global mean becomes an interior-masked psum;
* ``Restormer``/``PromptIR``: every MDTA routes through interior-masked
  psums (plus PromptIR's psum'd prompt GAP + global-height prompt resize) —
  attention statistics stay GLOBAL, seam-exact beyond what ``test_tile`` does;
* ``SwinIR``: the shifted windows' cyclic rolls wrap across shard ends via a
  ppermute exchange, and out-of-image halo rows re-zero before each conv —
  H-sharded output is exact INCLUDING the global border rows.

SURVEY §5.7 lists this as the genuine beyond-reference extension.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spatial_mdta(q, k, v, temperature, axis: str, use_softmax: bool = False, interior: slice | None = None):
    """EXACT context-parallel MDTA for pixel-sharded shards (call under shard_map).

    Transposed channel attention is linear in pixels: the C×C Gram and the
    q/k squared norms are sums over the pixel axis, so sharding L costs one
    O(C²) ``psum`` — no ring, no halo, no activation exchange (contrast with
    token attention, which needs ring/all-gather of K/V).  ``attn @ v`` is
    pixel-local, so the output shard needs nothing further.

    q, k, v: (BH, c, L_local).  ``interior`` optionally restricts the Gram
    accumulation to a pixel sub-range (use when shards carry conv halos, so
    overlap pixels aren't double-counted).
    """
    import jax.numpy as jnp

    qi = q[:, :, interior] if interior is not None else q
    ki = k[:, :, interior] if interior is not None else k

    gram = jax.lax.psum(jnp.einsum("bcl,bdl->bcd", qi, ki), axis)
    qn2 = jax.lax.psum(jnp.sum(qi * qi, axis=-1, keepdims=True), axis)
    kn2 = jax.lax.psum(jnp.sum(ki * ki, axis=-1, keepdims=True), axis)

    inv_q = jax.lax.rsqrt(jnp.maximum(qn2, 1e-24))
    inv_k = jax.lax.rsqrt(jnp.maximum(kn2, 1e-24))
    attn = gram * inv_q * jnp.swapaxes(inv_k, 1, 2) * temperature.reshape(q.shape[0], 1, 1)
    attn = jax.nn.softmax(attn, axis=-1) if use_softmax else jax.nn.relu(attn)
    return jnp.einsum("bcd,bdl->bcl", attn, v)


def spatial_sharded_apply(forward_fn, params, x: jax.Array, mesh: Mesh, halo: int, axis: str = "data", scale: int = 1):
    """Run ``forward_fn(params, x_slice)`` H-sharded over ``axis`` with halo exchange.

    x: (B, H, W, C) with H divisible by the axis size. Returns (B, H·scale, W·scale, C).
    """
    n = mesh.shape[axis]
    b, h, w, c = x.shape
    assert h % n == 0, f"H={h} must divide over {n} shards"

    batch_axis = next((a for a in mesh.axis_names if a != axis), None)

    def shard_fn(params, xl):
        # xl: (B[/data], H/n, W, C) local slice
        idx = jax.lax.axis_index(axis)
        up = [(i, (i - 1) % n) for i in range(n)]  # send to previous → receive from next
        down = [(i, (i + 1) % n) for i in range(n)]  # send to next → receive from previous

        # halo rows from neighbours (wrapped values fixed up below)
        from_prev = jax.lax.ppermute(xl[:, -halo:], axis, down)  # prev device's last rows
        from_next = jax.lax.ppermute(xl[:, :halo], axis, up)  # next device's first rows

        # outer edges: reflect own rows (matches jnp.pad 'reflect')
        top_reflect = xl[:, 1 : halo + 1][:, ::-1]
        bot_reflect = xl[:, -halo - 1 : -1][:, ::-1]
        top = jnp.where(idx == 0, top_reflect, from_prev)
        bot = jnp.where(idx == n - 1, bot_reflect, from_next)

        padded = jnp.concatenate([top, xl, bot], axis=1)
        out = forward_fn(params, padded)
        return out[:, halo * scale : out.shape[1] - halo * scale]

    # 2-D meshes: batch over the other axis (DP × SP), H over `axis`
    x_spec = P(batch_axis, axis) if batch_axis else P(None, axis)
    shard = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), x_spec),
        out_specs=x_spec,
        check_vma=False,
    )
    x = jax.device_put(x, NamedSharding(mesh, x_spec))
    params = jax.device_put(params, NamedSharding(mesh, P()))
    return shard(params, x)
