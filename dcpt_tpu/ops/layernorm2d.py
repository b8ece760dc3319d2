"""Fused channel LayerNorm for NHWC maps — Pallas kernel + analytic VJP.

TPU-native equivalent of the reference's ``layernorm_ext``
(``basicsr/ops/layernorm/src/layernorm_kernel.cpp:14-55``): forward computes
``y = (x − μ_C) · rsqrt(σ²_C + eps)``, ``out = y·w + b``; backward uses the
analytic gradient ``gx = rsigma · (g·w − y·mean_C(g·w·y) − mean_C(g·w))``,
``gw = Σ g·y``, ``gb = Σ g`` — one VMEM pass each way instead of XLA's
multi-kernel reduction chain.

The kernel flattens NHWC → (rows, C) and tiles rows; the channel reduction
stays resident in VMEM.  Set ``interpret=True`` (tests) to run on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_tile(rows: int, c: int) -> int:
    """Largest row tile with ~4 live (tile, c_pad) fp32 buffers under ~8 MB.

    Rows-only picking capped at 512 made bs-16 full-res maps run as
    512-instance grids of trivial blocks — grid overhead swamped the fusion
    win (the round-2 bs16 'Pallas collapse', PARITY.md)."""
    c_pad = _round_up(c, 128)
    budget = 8 * 1024 * 1024 // (4 * 4 * c_pad)
    for t in (8192, 4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if rows % t == 0 and t <= budget:
            return t
    # no power-of-two divisor fits: fall back to the largest divisor within
    # budget rather than mapping the whole array as one (possibly OOM) block
    # (same discipline as naf_ffn._pick_tile)
    for t in range(min(rows, max(budget, 1)), 0, -1):
        if rows % t == 0:
            return t
    return 1


def _fwd_kernel_primal(x_ref, w_ref, b_ref, out_ref, *, eps: float):
    x = x_ref[:]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    out_ref[:] = (x - mu) * jax.lax.rsqrt(var + eps) * w_ref[:] + b_ref[:]


def _fwd_kernel(x_ref, w_ref, b_ref, out_ref, y_ref, rsig_ref, *, eps: float):
    x = x_ref[:]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    rsigma = jax.lax.rsqrt(var + eps)
    y = (x - mu) * rsigma
    y_ref[:] = y
    rsig_ref[:] = rsigma
    out_ref[:] = y * w_ref[:] + b_ref[:]


def _bwd_kernel(g_ref, y_ref, rsig_ref, w_ref, gx_ref):
    g = g_ref[:] * w_ref[:]
    y = y_ref[:]
    mean_gy = jnp.mean(g * y, axis=-1, keepdims=True)
    mean_g = jnp.mean(g, axis=-1, keepdims=True)
    gx_ref[:] = rsig_ref[:] * (g - y * mean_gy - mean_g)


def _fwd_call_primal(x2d, w, b, eps: float, interpret: bool):
    """Inference/primal forward: emits only ``out`` — no residual writes."""
    rows, c = x2d.shape
    tile = _pick_tile(rows, c)
    grid = (rows // tile,)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_primal, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, c), x2d.dtype),
        interpret=interpret,
    )(x2d, w[None, :], b[None, :])


def _fwd_call(x2d, w, b, eps: float, interpret: bool):
    rows, c = x2d.shape
    tile = _pick_tile(rows, c)
    grid = (rows // tile,)
    out, y, rsig = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, c), x2d.dtype),
            jax.ShapeDtypeStruct((rows, c), x2d.dtype),
            jax.ShapeDtypeStruct((rows, 1), x2d.dtype),
        ],
        interpret=interpret,
    )(x2d, w[None, :], b[None, :])
    return out, y, rsig


def _bwd_call(g2d, y, rsig, w, interpret: bool):
    rows, c = g2d.shape
    tile = _pick_tile(rows, c)
    grid = (rows // tile,)
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, c), g2d.dtype),
        interpret=interpret,
    )(g2d, y, rsig, w[None, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def layer_norm_2d(x, weight, bias, eps: float = 1e-6, interpret: bool = False):
    """Channel LayerNorm over NHWC (or any (..., C)) via a fused Pallas kernel.

    The primal (inference) path writes only ``out``; the residuals for the
    analytic VJP (``y``, ``rsigma``) are produced only under differentiation
    (``_ln_fwd``) — saving 2× the HBM writes when just inferring."""
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    return _fwd_call_primal(x2d, weight, bias, eps, interpret).reshape(shape)


def _ln_fwd(x, weight, bias, eps, interpret):
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    out, y, rsig = _fwd_call(x2d, weight, bias, eps, interpret)
    return out.reshape(shape), (y, rsig, weight, shape)


def _ln_bwd(eps, interpret, res, g):
    y, rsig, weight, shape = res
    g2d = g.reshape(-1, shape[-1])
    gx = _bwd_call(g2d, y, rsig, weight, interpret)
    gw = jnp.sum(g2d * y, axis=0)
    gb = jnp.sum(g2d, axis=0)
    return gx.reshape(shape), gw, gb


layer_norm_2d.defvjp(_ln_fwd, _ln_bwd)
