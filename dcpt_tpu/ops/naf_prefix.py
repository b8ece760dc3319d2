"""Fused NAFBlock attention-branch prefix: LN → 1×1 expand → 3×3 depthwise →
SimpleGate, one VMEM pass per batch element.

Why the depthwise conv is INSIDE the kernel: on v5e, any non-convolution
producer (a dot, an einsum, or a Pallas custom call) feeding a grouped
depthwise conv hits a ~10× compiler cliff (measured: 67.5 vs 7.2 ms on the
bs16 c=512 stage — PARITY.md "NAFNet kernel A/B"), which killed the round-1
LN+expand-only fusion.  Fusing *through* the dwconv removes that boundary:
the kernel's consumer is SCA's global mean + 1×1 convs, a boundary the fused
FFN kernel already proved safe.

The depthwise 3×3 runs as 9 shifted multiply-adds on the VMEM-resident
(H, W, DW) map (zero padding = concatenated zero rows/cols); the expand is
one MXU matmul.  Backward recomputes through the jnp reference (custom VJP),
so training still benefits from the fused forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# block (1, H, W, DW) must keep ~3 live copies + weights under the 16 MB
# scoped-VMEM stack
_VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def naf_prefix_ref(x, ln_w, ln_b, w1, b1, wdw, bdw, eps: float = 1e-6):
    """jnp reference on (B, H, W, C): LN → 1×1 (C→DW) → depthwise 3×3 → gate."""
    # fp32 LN statistics (== archs LayerNorm2d; this twin is the train graph)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    t = ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * ln_w + ln_b
    # 1×1 expand as a CONV, not an einsum: on v5e any dot/einsum producer
    # feeding the grouped dwconv below compiles+runs ~10× slower (PARITY.md
    # "NAFNet kernel A/B (round 2)"); this ref is what differentiated traces
    # compile (the custom-VJP _fwd delegation), so it must dodge the cliff.
    c = x.shape[-1]
    dw = w1.shape[1]
    t = jax.lax.conv_general_dilated(
        t, w1.reshape(1, 1, c, dw), (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b1
    if _dw_dense_enabled():
        # DCPT_TPU_DW_DENSE=1 (trace-time, A/B lever for the train graph):
        # the depthwise weights scattered onto the (3,3,DW,DW) channel
        # diagonal make a DENSE conv — DW× more FLOPs, but on the MXU
        # instead of the VPU's 9 shifted multiply-adds, and the scatter is
        # differentiated through so weight grads land back on the diagonal.
        # Measured end-to-end by scripts/bench_dw_dense_e2e.py (micro-
        # benches through the tunnel only see dispatch — CLAUDE.md).
        eye = jnp.eye(dw, dtype=wdw.dtype)
        t = jax.lax.conv_general_dilated(
            t, wdw.reshape(3, 3, 1, dw) * eye, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bdw
    else:
        t = jax.lax.conv_general_dilated(
            t, wdw.reshape(3, 3, 1, dw), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=dw,
        ) + bdw
    t1, t2 = jnp.split(t, 2, axis=-1)
    return t1 * t2


def _dw_dense_enabled() -> bool:
    import os

    return os.environ.get("DCPT_TPU_DW_DENSE", "0") == "1"


def _shift_h(t, dy):
    """Shift along H (axis 0 of (H, W, DW)) with zero fill."""
    h = t.shape[0]
    zero = jnp.zeros_like(t[:1])
    if dy == 1:  # neighbour row above: y[i] = t[i-1]
        return jnp.concatenate([zero, t[: h - 1]], axis=0)
    if dy == -1:
        return jnp.concatenate([t[1:], zero], axis=0)
    return t


def _shift_w(t, dx):
    w = t.shape[1]
    zero = jnp.zeros_like(t[:, :1])
    if dx == 1:
        return jnp.concatenate([zero, t[:, : w - 1]], axis=1)
    if dx == -1:
        return jnp.concatenate([t[:, 1:], zero], axis=1)
    return t


def _kernel(x_ref, lnw_ref, lnb_ref, w1_ref, b1_ref, wdw_ref, bdw_ref, out_ref, *, eps: float):
    _, h, w, c = x_ref.shape
    dw = w1_ref.shape[1]
    x = x_ref[0].reshape(h * w, c)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    ln = (x - mu) * jax.lax.rsqrt(var + eps) * lnw_ref[0] + lnb_ref[0]
    t = (jnp.dot(ln, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[0]).reshape(h, w, dw)

    acc = jnp.broadcast_to(bdw_ref[0][None, None, :], (h, w, dw)).astype(jnp.float32)
    for dy in (-1, 0, 1):
        ty = _shift_h(t, dy)
        for dx in (-1, 0, 1):
            # torch/lax SAME conv: out[i,j] += w[ky,kx] * in[i+ky-1, j+kx-1];
            # shifting by (dy,dx)=(1-ky, 1-kx) aligns in → out
            tap = wdw_ref[1 - dy, 1 - dx]  # (dw,)
            acc = acc + _shift_w(ty, dx) * tap[None, None, :]
    g1 = acc[:, :, : dw // 2]
    g2 = acc[:, :, dw // 2 :]
    out_ref[0] = (g1 * g2).astype(out_ref.dtype)


def _prefix_pallas(x, ln_w, ln_b, w1, b1, wdw, bdw, eps, interpret):
    b, h, w, c = x.shape
    dw = w1.shape[1]
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, dw), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dw), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, dw), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dw), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, dw // 2), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, dw // 2), x.dtype),
        interpret=interpret,
    )(x, ln_w[None], ln_b[None], w1, b1[None], wdw, bdw[None])


def prefix_fits(h: int, w: int, c: int, dw: int) -> bool:
    """Whole-map residency guard (the eval tiler bounds spatial size anyway)."""
    return 3 * h * w * dw * 4 <= _VMEM_BUDGET_BYTES


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def naf_prefix(x, ln_w, ln_b, w1, b1, wdw, bdw, eps: float = 1e-6, interpret: bool = False):
    """Fused LN + 1×1 expand + depthwise 3×3 + SimpleGate over (B, H, W, C)."""
    return _prefix_pallas(x, ln_w, ln_b, w1, b1, wdw, bdw, eps, interpret)


def _fwd(x, ln_w, ln_b, w1, b1, wdw, bdw, eps, interpret):
    # Differentiated path: hand XLA the jnp twin outright (see naf_block.py
    # _fwd — kernel-fwd + twin-recompute-bwd lost 1.86× on a real train step)
    out, vjp = jax.vjp(lambda *a: naf_prefix_ref(*a, eps), x, ln_w, ln_b, w1, b1, wdw, bdw)
    return out, vjp


def _bwd(eps, interpret, vjp, g):
    return vjp(g)


naf_prefix.defvjp(_fwd, _bwd)
