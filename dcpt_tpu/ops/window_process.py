"""Fused cyclic-shift + window partition / merge — the Swin window op.

TPU-native equivalent of the reference's ``window_process`` CUDA kernels
(``basicsr/ops/window_process/src/window_process_kernel.cu:42-132``), which
fuse ``torch.roll`` with window (un)partition via modular index arithmetic.
Here the same fusion is a single Pallas gather pass: for each output window
row the kernel computes the rolled source row index and DMA-free copies from
the VMEM-resident feature block — no intermediate rolled tensor in HBM.

These match ``swinir_arch.window_partition``/``window_reverse`` composed with
``jnp.roll`` bit-for-bit (see tests), and serve as the drop-in fast path for
SwinIR's shifted blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _partition_kernel(x_ref, out_ref, *, shift: int, ws: int, h: int, w: int):
    """Grid over (batch, window_row wy, window_col wx): emit one (ws·ws, C) window."""
    wy = pl.program_id(1)
    wx = pl.program_id(2)
    for i in range(ws):
        src_row = (wy * ws + i + shift) % h
        for j in range(ws):
            src_col = (wx * ws + j + shift) % w
            out_ref[0, 0, 0, i * ws + j, :] = x_ref[0, src_row, src_col, :]


def _reverse_kernel(win_ref, out_ref, *, shift: int, ws: int, h: int, w: int):
    """Grid over (batch, window_row, window_col): scatter one window back with unroll."""
    wy = pl.program_id(1)
    wx = pl.program_id(2)
    for i in range(ws):
        dst_row = (wy * ws + i + shift) % h
        for j in range(ws):
            dst_col = (wx * ws + j + shift) % w
            out_ref[0, dst_row, dst_col, :] = win_ref[0, 0, 0, i * ws + j, :]


def window_partition_fused(x: jax.Array, window_size: int, shift: int = 0, interpret: bool = False) -> jax.Array:
    """(B, H, W, C) → (B·nW, ws², C) with the cyclic −shift fused in."""
    b, h, w, c = x.shape
    ws = window_size
    ny, nx = h // ws, w // ws
    out = pl.pallas_call(
        functools.partial(_partition_kernel, shift=shift, ws=ws, h=h, w=w),
        grid=(b, ny, nx),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda bi, wy, wx: (bi, 0, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 1, ws * ws, c), lambda bi, wy, wx: (bi, wy, wx, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ny, nx, ws * ws, c), x.dtype),
        interpret=interpret,
    )(x)
    return out.reshape(b * ny * nx, ws * ws, c)


def window_reverse_fused(windows: jax.Array, window_size: int, h: int, w: int, shift: int = 0, interpret: bool = False) -> jax.Array:
    """(B·nW, ws², C) → (B, H, W, C) with the cyclic +shift fused in."""
    ws = window_size
    ny, nx = h // ws, w // ws
    b = windows.shape[0] // (ny * nx)
    c = windows.shape[-1]
    win = windows.reshape(b, ny, nx, ws * ws, c)
    return pl.pallas_call(
        functools.partial(_reverse_kernel, shift=shift, ws=ws, h=h, w=w),
        grid=(b, ny, nx),
        in_specs=[pl.BlockSpec((1, 1, 1, ws * ws, c), lambda bi, wy, wx: (bi, wy, wx, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w, c), lambda bi, wy, wx: (bi, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), windows.dtype),
        interpret=interpret,
    )(win)
