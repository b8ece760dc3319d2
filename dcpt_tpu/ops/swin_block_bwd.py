"""Analytic single-pass Pallas backward for the whole-SwinBlock kernel.

Third application of the analytic-backward recipe (naf_block_bwd,
mdta_block_bwd): the fused SwinBlock forward (window_attention.py v3,
reference ``basicsr/archs/swinir_arch.py`` SwinTransformerBlock) wins big at
the 128px training geometry, but training delegates to the jnp twin.  Unlike
NAF/MDTA, every op here is per-token or window-local — no depthwise halos,
no global pixel reductions — so the whole backward is ONE kernel per window
tile: recompute the forward (LN1 → qkv → per-head masked attention → proj →
residual → LN2 → MLP), keep the per-head attention probabilities in VMEM
(n=64-token windows: tiny), then run the full chain backward, accumulating
every weight grad across the sequential grid.

The per-head lane-masking trick works unchanged in reverse: dk = dscoresᵀ·(q⊙m)
and dv = attnᵀ·dacc⊙m land on disjoint lane partitions, so the per-head
cotangents accumulate in place with no relayouts.  Every grad matches
``jax.vjp(swin_block_ref)`` (parity test, interpret mode).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mdta_block_bwd import _gelu_and_grad
from .naf_block_bwd import _acc, _ln_bwd, _sum8


def _block_bwd_kernel(
    x_ref, dz_ref, l1w_ref, l1b_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref,
    bv_ref, wproj_ref, bproj_ref, l2w_ref, l2b_ref, wfc1_ref, bfc1_ref,
    wfc2_ref, bfc2_ref,
    dx_ref, dl1w_ref, dl1b_ref, dwq_ref, dwk_ref, dwv_ref, dbq_ref, dbk_ref,
    dbv_ref, dwproj_ref, dbproj_ref, dl2w_ref, dl2b_ref, dwfc1_ref, dbfc1_ref,
    dwfc2_ref, dbfc2_ref,
    *, num_heads: int, eps: float,
):
    f32 = jnp.float32
    first = pl.program_id(0) == 0
    t, n, c = x_ref.shape
    hd = c // num_heads
    scale = hd**-0.5
    tn = t * n

    def ln_fwd(tns, w_ref, b_ref):
        mu = jnp.mean(tns, axis=-1, keepdims=True)
        var = jnp.mean((tns - mu) ** 2, axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(var + eps)
        xh = (tns - mu) * inv
        return xh * w_ref[0].astype(f32) + b_ref[0].astype(f32), xh, inv

    # ---- forward recompute (== window_attention._block_kernel) ----
    x = x_ref[:].astype(f32).reshape(tn, c)
    xn, xh1, inv1 = ln_fwd(x, l1w_ref, l1b_ref)
    q = (jnp.dot(xn, wq_ref[:].astype(f32), preferred_element_type=f32) + bq_ref[0].astype(f32)) * scale
    k = jnp.dot(xn, wk_ref[:].astype(f32), preferred_element_type=f32) + bk_ref[0].astype(f32)
    v = jnp.dot(xn, wv_ref[:].astype(f32), preferred_element_type=f32) + bv_ref[0].astype(f32)
    q = q.reshape(t, n, c)
    k = k.reshape(t, n, c)
    v = v.reshape(t, n, c)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c), 2)
    masks = [((lane >= h * hd) & (lane < (h + 1) * hd)).astype(f32) for h in range(num_heads)]
    attns = []
    acc = jnp.zeros((t, n, c), f32)
    for h in range(num_heads):
        scores = jax.lax.dot_general(
            q * masks[h], k, dimension_numbers=(((2,), (2,)), ((0,), (0,))), preferred_element_type=f32)
        attn = jax.nn.softmax(scores, axis=-1)
        attns.append(attn)  # (t, n, n) per head — 64-token windows, VMEM-cheap
        acc = acc + jax.lax.dot_general(
            attn, v * masks[h], dimension_numbers=(((2,), (1,)), ((0,), (0,))), preferred_element_type=f32)

    accf = acc.reshape(tn, c)
    y = x + jnp.dot(accf, wproj_ref[:].astype(f32), preferred_element_type=f32) + bproj_ref[0].astype(f32)
    yn, yh2, inv2 = ln_fwd(y, l2w_ref, l2b_ref)
    pre1 = jnp.dot(yn, wfc1_ref[:].astype(f32), preferred_element_type=f32) + bfc1_ref[0].astype(f32)
    g, gd = _gelu_and_grad(pre1)

    # ---- backward ----
    dz = dz_ref[:].astype(f32).reshape(tn, c)
    _acc(dwfc2_ref, first, jnp.dot(g.T, dz, preferred_element_type=f32))
    _acc(dbfc2_ref, first, _sum8(jnp.sum(dz, axis=0)))
    dpre1 = jnp.dot(dz, wfc2_ref[:].astype(f32).T, preferred_element_type=f32) * gd
    _acc(dwfc1_ref, first, jnp.dot(yn.T, dpre1, preferred_element_type=f32))
    _acc(dbfc1_ref, first, _sum8(jnp.sum(dpre1, axis=0)))
    dyn = jnp.dot(dpre1, wfc1_ref[:].astype(f32).T, preferred_element_type=f32)
    _acc(dl2w_ref, first, _sum8(jnp.sum(dyn * yh2, axis=0)))
    _acc(dl2b_ref, first, _sum8(jnp.sum(dyn, axis=0)))
    dy = dz + _ln_bwd(dyn * l2w_ref[0].astype(f32), yh2, inv2)

    _acc(dwproj_ref, first, jnp.dot(accf.T, dy, preferred_element_type=f32))
    _acc(dbproj_ref, first, _sum8(jnp.sum(dy, axis=0)))
    dacc = jnp.dot(dy, wproj_ref[:].astype(f32).T, preferred_element_type=f32).reshape(t, n, c)

    dq = jnp.zeros((t, n, c), f32)
    dk = jnp.zeros((t, n, c), f32)
    dv = jnp.zeros((t, n, c), f32)
    for h in range(num_heads):
        m = masks[h]
        attn = attns[h]
        # dattn[t,i,j] = Σ_d dacc[t,i,d]·(v⊙m)[t,j,d] — the mask confines the
        # contraction to this head's lanes
        dattn = jax.lax.dot_general(
            dacc, v * m, dimension_numbers=(((2,), (2,)), ((0,), (0,))), preferred_element_type=f32)
        dv = dv + jax.lax.dot_general(
            attn, dacc, dimension_numbers=(((1,), (1,)), ((0,), (0,))), preferred_element_type=f32) * m
        dscores = attn * (dattn - jnp.sum(dattn * attn, axis=-1, keepdims=True))
        # dq,dk land on this head's lane partition (qm/k contractions carry m)
        dq = dq + jax.lax.dot_general(
            dscores, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))), preferred_element_type=f32) * m
        dk = dk + jax.lax.dot_general(
            dscores, q * m, dimension_numbers=(((1,), (1,)), ((0,), (0,))), preferred_element_type=f32)

    dq = (dq * scale).reshape(tn, c)
    dk = dk.reshape(tn, c)
    dv = dv.reshape(tn, c)
    _acc(dwq_ref, first, jnp.dot(xn.T, dq, preferred_element_type=f32))
    _acc(dwk_ref, first, jnp.dot(xn.T, dk, preferred_element_type=f32))
    _acc(dwv_ref, first, jnp.dot(xn.T, dv, preferred_element_type=f32))
    _acc(dbq_ref, first, _sum8(jnp.sum(dq, axis=0)))
    _acc(dbk_ref, first, _sum8(jnp.sum(dk, axis=0)))
    _acc(dbv_ref, first, _sum8(jnp.sum(dv, axis=0)))
    dxn = (jnp.dot(dq, wq_ref[:].astype(f32).T, preferred_element_type=f32)
           + jnp.dot(dk, wk_ref[:].astype(f32).T, preferred_element_type=f32)
           + jnp.dot(dv, wv_ref[:].astype(f32).T, preferred_element_type=f32))
    _acc(dl1w_ref, first, _sum8(jnp.sum(dxn * xh1, axis=0)))
    _acc(dl1b_ref, first, _sum8(jnp.sum(dxn, axis=0)))
    dx = dy + _ln_bwd(dxn * l1w_ref[0].astype(f32), xh1, inv1)
    dx_ref[:] = dx.reshape(t, n, c).astype(dx_ref.dtype)


def pick_bwd_tile(nw: int, n: int, c: int, hidden: int, num_heads: int) -> int | None:
    """Window tile for the backward kernel, or None → delegate to the twin.

    Live fp32 per window: ~15 (n, c)-maps (x/xn/q/k/v/acc/y/yn/dz/dy/dacc/
    dq/dk/dv/dxn), ~3 (n, hidden)-maps, and the saved per-head attention +
    2 score temps ((n, n) each); fixed cost: weights + their VMEM grad
    accumulators.  Budget mirrors the other analytic pickers (10 MB against
    the real 16 MB scoped limit).  DCPT_TPU_SWIN_BWD_T forces a tile."""
    forced = int(_os.environ.get("DCPT_TPU_SWIN_BWD_T", "0"))
    if forced:
        return forced if nw % forced == 0 else None
    lanep = lambda d: -(-d // 128) * 128  # noqa: E731
    per_win = 4 * n * (15 * lanep(c) + 3 * lanep(hidden) + (num_heads + 2) * lanep(n))
    fixed = 8 * (4 * c * c + 2 * c * hidden)
    budget = 10 * 1024 * 1024
    for t in (32, 16, 8, 4, 2, 1):
        if nw % t == 0 and t * per_win + fixed <= budget:
            return t
    return None


def swin_block_bwd(x, ln1_w, ln1_b, wqkv, bqkv, wproj, bproj, ln2_w, ln2_b,
                   wfc1, bfc1, wfc2, bfc2, dz,
                   num_heads: int, eps: float, t: int, interpret: bool = False):
    """All 13 input cotangents of swin_block_ref, given upstream dz."""
    nw, n, c = x.shape
    hidden = wfc1.shape[1]
    f32 = jnp.float32
    wq, wk, wv = wqkv[:, :c], wqkv[:, c : 2 * c], wqkv[:, 2 * c :]
    bq, bk, bv = bqkv[:c][None], bqkv[c : 2 * c][None], bqkv[2 * c :][None]

    xspec = pl.BlockSpec((t, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    cspec = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)  # noqa: E731
    sum_shapes = lambda *shapes: [jax.ShapeDtypeStruct(s, f32) for s in shapes]  # noqa: E731

    outs = pl.pallas_call(
        functools.partial(_block_bwd_kernel, num_heads=num_heads, eps=eps),
        grid=(nw // t,),
        in_specs=[
            xspec, xspec,
            cspec((1, c)), cspec((1, c)),
            cspec((c, c)), cspec((c, c)), cspec((c, c)),
            cspec((1, c)), cspec((1, c)), cspec((1, c)),
            cspec((c, c)), cspec((1, c)),
            cspec((1, c)), cspec((1, c)),
            cspec((c, hidden)), cspec((1, hidden)),
            cspec((hidden, c)), cspec((1, c)),
        ],
        out_specs=[xspec] + [cspec(s) for s in (
            (8, c), (8, c), (c, c), (c, c), (c, c), (8, c), (8, c), (8, c),
            (c, c), (8, c), (8, c), (8, c), (c, hidden), (8, hidden),
            (hidden, c), (8, c))],
        out_shape=[jax.ShapeDtypeStruct((nw, n, c), x.dtype)] + sum_shapes(
            (8, c), (8, c), (c, c), (c, c), (c, c), (8, c), (8, c), (8, c),
            (c, c), (8, c), (8, c), (8, c), (c, hidden), (8, hidden),
            (hidden, c), (8, c)),
        interpret=interpret,
    )(x, dz, ln1_w[None], ln1_b[None], wq, wk, wv, bq, bk, bv,
      wproj, bproj[None], ln2_w[None], ln2_b[None], wfc1, bfc1[None], wfc2, bfc2[None])

    (dx, dl1w, dl1b, dwq, dwk, dwv, dbq, dbk, dbv,
     dwproj, dbproj, dl2w, dl2b, dwfc1, dbfc1, dwfc2, dbfc2) = outs
    grads = (
        dx, dl1w[0], dl1b[0],
        jnp.concatenate([dwq, dwk, dwv], axis=1),
        jnp.concatenate([dbq[0], dbk[0], dbv[0]], axis=0),
        dwproj, dbproj[0], dl2w[0], dl2b[0],
        dwfc1, dbfc1[0], dwfc2, dbfc2[0],
    )
    primals = (x, ln1_w, ln1_b, wqkv, bqkv, wproj, bproj, ln2_w, ln2_b,
               wfc1, bfc1, wfc2, bfc2)
    return tuple(g.astype(p.dtype) for g, p in zip(grads, primals))
