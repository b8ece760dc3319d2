"""Fused NAFBlock FFN branch: LN → 1×1 expand → SimpleGate → 1×1 → residual.

Beyond-reference fusion (SURVEY §7.6d): the FFN half of every NAFBlock
(nafnet_arch.py:180-186) is a pure pointwise chain — LayerNorm2d, a c→2c
matmul, the channel-halving gate, a c→c matmul, and the γ-scaled residual.
XLA materialises the 2c-wide intermediate in HBM between the two convs; this
kernel keeps the whole chain in VMEM per row tile: y is read once, out written
once, weights stay resident across the grid.

Backward recomputes through the jnp reference (custom_vjp).  Guarded to
c ≤ 512 so the weight blocks fit VMEM (the flagship's 28-block stage is c=512).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_C = 512


def naf_ffn_ref(y, ln_w, ln_b, w4, b4, w5, b5, gamma, eps: float = 1e-6):
    """jnp reference over (rows, c) tensors."""
    # fp32 LN statistics (== archs LayerNorm2d; this twin is the train graph)
    yf = y.astype(jnp.float32)
    mu = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.mean((yf - mu) ** 2, axis=-1, keepdims=True)
    ln = ((yf - mu) * jax.lax.rsqrt(var + eps)).astype(y.dtype) * ln_w + ln_b
    h = ln @ w4 + b4
    h1, h2 = jnp.split(h, 2, axis=-1)
    out = (h1 * h2) @ w5 + b5
    return y + gamma * out


def _kernel(y_ref, lnw_ref, lnb_ref, w4_ref, b4_ref, w5_ref, b5_ref, g_ref, out_ref, *, eps: float):
    y = y_ref[:]
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
    ln = (y - mu) * jax.lax.rsqrt(var + eps) * lnw_ref[:] + lnb_ref[:]
    h = jnp.dot(ln, w4_ref[:], preferred_element_type=jnp.float32) + b4_ref[:]
    c = y.shape[-1]
    g = h[:, :c] * h[:, c:]
    out = jnp.dot(g, w5_ref[:], preferred_element_type=jnp.float32) + b5_ref[:]
    out_ref[:] = y + g_ref[:] * out


def _pick_tile(rows: int, c: int, c_out: int) -> int:
    """Largest row tile whose live VMEM set fits the ~16 MB scoped stack.

    Live fp32 buffers per instance: x/ln (tile, c), h (tile, c_out), gate +
    out (tile, c), plus the grid-resident weights (c·c_out + (c_out//2)·c or
    c·c_out alone for the expand kernel).  The flagship deep stage (c=512,
    c_out=1024) OOMs at tile 1024 — rows-only picking chose exactly that for
    batch≥16, which is why the fused path collapsed there (PARITY.md)."""
    weights = 4 * (c * c_out + (c_out // 2) * c)
    budget = 10 * 1024 * 1024 - weights
    for t in (1024, 512, 256, 128, 64, 32, 16, 8):
        if rows % t == 0 and 4 * t * (3 * c + 2 * c_out) <= budget:
            return t
    return 8 if rows % 8 == 0 else rows


def _ffn_pallas(y2d, ln_w, ln_b, w4, b4, w5, b5, gamma, eps, interpret):
    rows, c = y2d.shape
    tile = _pick_tile(rows, c, w4.shape[1])
    row_spec = pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(rows // tile,),
        in_specs=[
            row_spec,
            vec(c), vec(c),
            pl.BlockSpec((c, 2 * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec(2 * c),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec(c),
            vec(c),
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((rows, c), y2d.dtype),
        interpret=interpret,
    )(y2d, ln_w[None], ln_b[None], w4, b4[None], w5, b5[None], gamma[None])


# ---------------------------------------------------------------------------
# LN + 1×1 expand (the attention-branch prefix, nafnet_arch.py:168-170)
# ---------------------------------------------------------------------------


def naf_expand_ref(x, ln_w, ln_b, w1, b1, eps: float = 1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    ln = (x - mu) * jax.lax.rsqrt(var + eps) * ln_w + ln_b
    return ln @ w1 + b1


def _expand_kernel(x_ref, lnw_ref, lnb_ref, w1_ref, b1_ref, out_ref, *, eps: float):
    x = x_ref[:]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    ln = (x - mu) * jax.lax.rsqrt(var + eps) * lnw_ref[:] + lnb_ref[:]
    out_ref[:] = jnp.dot(ln, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]


def _expand_pallas(x2d, ln_w, ln_b, w1, b1, eps, interpret):
    rows, c = x2d.shape
    c_out = w1.shape[1]
    tile = _pick_tile(rows, c, c_out)
    vec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_expand_kernel, eps=eps),
        grid=(rows // tile,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            vec(c), vec(c),
            pl.BlockSpec((c, c_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec(c_out),
        ],
        out_specs=pl.BlockSpec((tile, c_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, c_out), x2d.dtype),
        interpret=interpret,
    )(x2d, ln_w[None], ln_b[None], w1, b1[None])


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def naf_expand(x, ln_w, ln_b, w1, b1, eps: float = 1e-6, interpret: bool = False):
    """Fused LN + 1×1 expand over (..., c) → (..., c_out).

    NOT wired into NAFBlock's attention branch: on v5e, any non-convolution
    producer (this custom call, or even a pure-XLA dot/einsum) in front of
    the grouped depthwise conv that follows compiles ~10× slower at batch
    (67.5 vs 7.2 ms on the bs16 c=512 stage — measured round 2, PARITY.md).
    Kept (and parity-tested) for fusion sites with conv-free consumers."""
    c = x.shape[-1]
    shape = x.shape
    x2d = x.reshape(-1, c)
    if (not interpret) and (c > _MAX_C or c % 16 != 0):
        out = naf_expand_ref(x2d, ln_w, ln_b, w1, b1, eps)
    else:
        out = _expand_pallas(x2d, ln_w, ln_b, w1, b1, eps, interpret)
    return out.reshape(*shape[:-1], w1.shape[1])


def _exp_fwd(x, ln_w, ln_b, w1, b1, eps, interpret):
    # Differentiated path: hand XLA the jnp twin outright (see naf_block.py)
    shape = x.shape
    out, vjp = jax.vjp(
        lambda x, lw, lb, w, b: naf_expand_ref(x.reshape(-1, shape[-1]), lw, lb, w, b, eps).reshape(
            *shape[:-1], w.shape[1]
        ),
        x, ln_w, ln_b, w1, b1,
    )
    return out, vjp


def _exp_bwd(eps, interpret, vjp, g):
    return vjp(g)


naf_expand.defvjp(_exp_fwd, _exp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def naf_ffn(y, ln_w, ln_b, w4, b4, w5, b5, gamma, eps: float = 1e-6, interpret: bool = False):
    """Fused FFN over (..., c); falls back to jnp when c > 512 or rows unaligned."""
    c = y.shape[-1]
    shape = y.shape
    y2d = y.reshape(-1, c)
    if (not interpret) and (c > _MAX_C or c % 16 != 0):
        return naf_ffn_ref(y2d, ln_w, ln_b, w4, b4, w5, b5, gamma, eps).reshape(shape)
    return _ffn_pallas(y2d, ln_w, ln_b, w4, b4, w5, b5, gamma, eps, interpret).reshape(shape)


def _fwd(y, ln_w, ln_b, w4, b4, w5, b5, gamma, eps, interpret):
    shape = y.shape
    out, vjp = jax.vjp(
        lambda y, lw, lb, w4, b4, w5, b5, gm: naf_ffn_ref(y.reshape(-1, shape[-1]), lw, lb, w4, b4, w5, b5, gm, eps).reshape(shape),
        y, ln_w, ln_b, w4, b4, w5, b5, gamma,
    )
    return out, vjp


def _bwd(eps, interpret, vjp, g):
    return vjp(g)


naf_ffn.defvjp(_fwd, _bwd)
