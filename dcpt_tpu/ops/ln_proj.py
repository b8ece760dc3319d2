"""Fused channel-LayerNorm + 1×1 projection — the transformer-block prefix.

Generalises the NAFNet expand fusion to Restormer/PromptIR blocks: both MDTA
(LN → qkv 1×1) and GDFN (LN → project_in 1×1) start with a pointwise
LN-then-matmul whose intermediate XLA round-trips through HBM.  Supports the
reference's three LN flavours: standard (mean-subtracted, weight+bias),
BiasFree (centred variance, un-centred output, weight only), both at
configurable eps (Restormer 1e-6, PromptIR 1e-5).

Backward recomputes via the jnp reference (custom_vjp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_C = 512


def ln_proj_ref(x, ln_w, ln_b, w, eps: float, biasfree: bool):
    """jnp reference over (rows, c) → (rows, c_out); ln_b is zeros when biasfree."""
    # fp32 LN statistics (== archs ChannelLayerNorm; twin is the train graph)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    rs = jax.lax.rsqrt(var + eps)
    ln = (xf * rs).astype(x.dtype) * ln_w if biasfree else ((xf - mu) * rs).astype(x.dtype) * ln_w + ln_b
    return ln @ w


def _kernel(x_ref, lnw_ref, lnb_ref, w_ref, out_ref, *, eps: float, biasfree: bool):
    x = x_ref[:]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    rs = jax.lax.rsqrt(var + eps)
    if biasfree:
        ln = (x * rs) * lnw_ref[:]
    else:
        ln = ((x - mu) * rs) * lnw_ref[:] + lnb_ref[:]
    out_ref[:] = jnp.dot(ln, w_ref[:], preferred_element_type=jnp.float32)


def _pick_tile(rows: int) -> int:
    for t in (1024, 512, 256, 128, 64, 32, 16, 8):
        if rows % t == 0:
            return t
    return rows


def _lp_pallas(x2d, ln_w, ln_b, w, eps, biasfree, interpret):
    rows, c = x2d.shape
    c_out = w.shape[1]
    tile = _pick_tile(rows)
    vec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, biasfree=biasfree),
        grid=(rows // tile,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            vec(c), vec(c),
            pl.BlockSpec((c, c_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, c_out), x2d.dtype),
        interpret=interpret,
    )(x2d, ln_w[None], ln_b[None], w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_ln_proj(x, ln_w, ln_b, w, eps: float = 1e-6, biasfree: bool = False, interpret: bool = False):
    """Fused LN + (..., c) @ (c, c_out); pass ln_b=zeros for BiasFree."""
    c = x.shape[-1]
    shape = x.shape
    x2d = x.reshape(-1, c)
    # weight block must fit VMEM: qkv projection is c×3c
    if (not interpret) and (c > _MAX_C or c % 16 != 0 or c * w.shape[1] * 4 > 6 * 1024 * 1024):
        out = ln_proj_ref(x2d, ln_w, ln_b, w, eps, biasfree)
    else:
        out = _lp_pallas(x2d, ln_w, ln_b, w, eps, biasfree, interpret)
    return out.reshape(*shape[:-1], w.shape[1])


def _fwd(x, ln_w, ln_b, w, eps, biasfree, interpret):
    # Differentiated path: hand XLA the jnp twin outright (see naf_block.py)
    shape = x.shape
    out, vjp = jax.vjp(
        lambda x, lw, lb, w: ln_proj_ref(x.reshape(-1, shape[-1]), lw, lb, w, eps, biasfree).reshape(
            *shape[:-1], w.shape[1]
        ),
        x, ln_w, ln_b, w,
    )
    return out, vjp


def _bwd(eps, biasfree, interpret, vjp, g):
    return vjp(g)


fused_ln_proj.defvjp(_fwd, _bwd)
