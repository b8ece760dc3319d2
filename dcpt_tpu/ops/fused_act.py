"""Fused bias + LeakyReLU (+√2 scale) — the StyleGAN2 fused_act op.

TPU-native equivalent of the reference's ``fused_act_ext``
(``basicsr/ops/fused_act/src/fused_bias_act_kernel.cu:19-100``):
``out = scale · leaky_relu(x + bias)`` with analytic backward
``gx = scale · g · (1 if out_pre > 0 else slope)`` and ``gb = Σ gx`` over all
non-channel dims.  One elementwise VMEM pass fwd and bwd.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(rows: int) -> int:
    for t in (1024, 512, 256, 128, 64, 32, 16, 8):
        if rows % t == 0:
            return t
    return rows


def _fwd_kernel(x_ref, b_ref, out_ref, mask_ref, *, slope: float, scale: float):
    v = x_ref[:] + b_ref[:]
    pos = v > 0
    mask_ref[:] = pos.astype(jnp.int8)
    out_ref[:] = jnp.where(pos, v, v * slope) * scale


def _bwd_kernel(g_ref, mask_ref, gx_ref, *, slope: float, scale: float):
    g = g_ref[:]
    gx_ref[:] = jnp.where(mask_ref[:] > 0, g, g * slope) * scale


def _fwd_call(x2d, b, slope, scale, interpret):
    rows, c = x2d.shape
    tile = _pick_tile(rows)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, slope=slope, scale=scale),
        grid=(rows // tile,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, c), x2d.dtype),
            jax.ShapeDtypeStruct((rows, c), jnp.int8),
        ],
        interpret=interpret,
    )(x2d, b[None, :])


def _bwd_call(g2d, mask, slope, scale, interpret):
    rows, c = g2d.shape
    tile = _pick_tile(rows)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, slope=slope, scale=scale),
        grid=(rows // tile,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, c), g2d.dtype),
        interpret=interpret,
    )(g2d, mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_bias_leaky_relu(x, bias, negative_slope: float = 0.2, scale: float = 2**0.5, interpret: bool = False):
    """``scale · leaky_relu(x + bias)`` over (..., C) arrays (fused_act_ext twin)."""
    return _fa_fwd(x, bias, negative_slope, scale, interpret)[0]


def _fa_fwd(x, bias, negative_slope, scale, interpret):
    shape = x.shape
    out2d, mask = _fwd_call(x.reshape(-1, shape[-1]), bias, negative_slope, scale, interpret)
    return out2d.reshape(shape), (mask, shape)


def _fa_bwd(negative_slope, scale, interpret, res, g):
    mask, shape = res
    gx2d = _bwd_call(g.reshape(-1, shape[-1]), mask, negative_slope, scale, interpret)
    gx = gx2d.reshape(shape)
    gb = jnp.sum(gx2d, axis=0)
    return gx, gb


fused_bias_leaky_relu.defvjp(_fa_fwd, _fa_bwd)
