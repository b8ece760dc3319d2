"""Fused window self-attention for SwinIR — qkv → scores → softmax → PV → proj
in one kernel per window tile.

SURVEY §7 "hard parts" flags SwinIR as small-matmul-bound: each 8×8 window is a
64-token attention whose six XLA ops (qkv matmul, reshape, scores, softmax, PV,
proj) each round-trip HBM.  This kernel keeps a tile of windows resident in
VMEM with the weights grid-resident, emitting only the final output.

Heads are unrolled (static, small); the per-tile batch runs as batched
``dot_general`` on the MXU.  Backward recomputes via the jnp reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def window_attention_ref(x, wqkv, bqkv, wproj, bproj, num_heads: int):
    """jnp reference: x (NW, N, C) windows."""
    nw, n, c = x.shape
    hd = c // num_heads
    scale = hd**-0.5
    qkv = x @ wqkv + bqkv  # (nw, n, 3c)
    qkv = qkv.reshape(nw, n, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = jax.nn.softmax(jnp.einsum("whnd,whmd->whnm", q * scale, k), axis=-1)
    out = jnp.einsum("whnm,whmd->whnd", attn, v).transpose(0, 2, 1, 3).reshape(nw, n, c)
    return out @ wproj + bproj


def _kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, out_ref, *, num_heads: int):
    t, n, c = x_ref.shape
    hd = c // num_heads
    scale = hd**-0.5
    x = x_ref[:].reshape(t * n, c)
    qkv = jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32) + bqkv_ref[0]
    qkv = qkv.reshape(t, n, 3 * c)

    outs = []
    for h in range(num_heads):
        q = qkv[:, :, h * hd : (h + 1) * hd] * scale
        k = qkv[:, :, c + h * hd : c + (h + 1) * hd]
        v = qkv[:, :, 2 * c + h * hd : 2 * c + (h + 1) * hd]
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        attn = jax.nn.softmax(scores, axis=-1)
        outs.append(
            jax.lax.dot_general(
                attn, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )
        )
    merged = jnp.concatenate(outs, axis=-1).reshape(t * n, c)
    out = jnp.dot(merged, wproj_ref[:], preferred_element_type=jnp.float32) + bproj_ref[0]
    out_ref[:] = out.reshape(t, n, c).astype(out_ref.dtype)


def _pick_tile(nw: int, n: int, c: int) -> int:
    budget = 2 * 1024 * 1024  # per input block
    for t in (64, 32, 16, 8, 4, 2, 1):
        if nw % t == 0 and t * n * c * 4 <= budget:
            return t
    return 1


def _wa_pallas(x, wqkv, bqkv, wproj, bproj, num_heads, interpret):
    nw, n, c = x.shape
    t = _pick_tile(nw, n, c)
    return pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads),
        grid=(nw // t,),
        in_specs=[
            pl.BlockSpec((t, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw, n, c), x.dtype),
        interpret=interpret,
    )(x, wqkv, bqkv[None], wproj, bproj[None])


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_window_attention(x, wqkv, bqkv, wproj, bproj, num_heads: int, interpret: bool = False):
    """Fused W-MSA over (NW, N, C) windows (no rel-pos bias, per the modified
    reference SwinIR)."""
    return _wa_pallas(x, wqkv, bqkv, wproj, bproj, num_heads, interpret)


def _fwd(x, wqkv, bqkv, wproj, bproj, num_heads, interpret):
    return fused_window_attention(x, wqkv, bqkv, wproj, bproj, num_heads, interpret), (x, wqkv, bqkv, wproj, bproj)


def _bwd(num_heads, interpret, res, g):
    x, wqkv, bqkv, wproj, bproj = res
    _, vjp = jax.vjp(lambda *a: window_attention_ref(*a, num_heads), x, wqkv, bqkv, wproj, bproj)
    return vjp(g)


fused_window_attention.defvjp(_fwd, _bwd)
