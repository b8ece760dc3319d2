"""Analytic Pallas backward for the whole-NAFBlock kernel (VERDICT r3 item 3).

The forward fusion (``naf_block.py``) cut HBM traversals ~12 → ~4 and won
+18% at the shallow stages, but training never benefited: the custom-VJP
``_fwd`` delegates to the jnp twin, because running the kernel forward and
RECOMPUTING the twin in ``_bwd`` lost 1.86× (PARITY "NAFNet kernel A/B
(round 3)").  This module is the unexplored lever: a hand-derived backward in
two Pallas passes, scaling the layernorm2d analytic-VJP pattern (reference
``basicsr/ops/layernorm/src/layernorm_kernel.cpp:14-55``) up to the whole
block (reference block: ``basicsr/archs/nafnet_arch.py:83-186``):

  B1  per (batch, row-tile): recompute prefix g (halo-1 window) + stage-2
      forward (SCA·1×1·residual·LN2·FFN), then the stage-2 backward:
      emits dy and the LOCAL dg, accumulates the stage-2 weight grads
      (dW3/dbeta/dn2/dW4/dW5/biases/dgamma) in VMEM across the sequential
      grid, and per-tile partials of datt = Σ da·g (SCA's global coupling).
  --  host: datt → dpooled, dWsca, dbsca; dgk = dpooled/(H·W)  (micro)
  B2  per (batch, row-tile): recompute ln1/t/dwconv on a halo-2 window,
      ddw = (dg_local + dgk)·swap(dwm), the two depthwise stencils
      (dWdw correlation + dt transpose-conv), LN1 backward → dx; stage-A
      weight grads accumulate in VMEM.

Out-of-image halo rows are masked exactly like the forward kernel so the
depthwise borders match lax zero padding; every grad matches
``jax.vjp(naf_block_ref)`` (parity test, interpret mode + silicon checker).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_fwd(x2, eps):
    mu = jnp.mean(x2, axis=-1, keepdims=True)
    var = jnp.mean((x2 - mu) ** 2, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return (x2 - mu) * inv, inv


def _ln_bwd(dxh, xh, inv):
    # d/dx of x̂ = (x-μ)σ⁻¹ given cotangent dx̂ (γ already folded in)
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xh, axis=-1, keepdims=True)
    return inv * (dxh - m1 - xh * m2)


def _shift_cols(t, dx):
    w = t.shape[1]
    zero = jnp.zeros_like(t[:, :1])
    if dx == 1:
        return jnp.concatenate([zero, t[:, : w - 1]], axis=1)
    if dx == -1:
        return jnp.concatenate([t[:, 1:], zero], axis=1)
    return t


def _sum8(v):
    """(K,) or (1,K) → an (8,K) block (row 0 meaningful, TPU-tileable)."""
    v = v.reshape(1, -1)
    return jnp.concatenate([v, jnp.zeros((7, v.shape[1]), v.dtype)], axis=0)


def _acc(ref, first, val):
    @pl.when(first)
    def _():
        ref[...] = jnp.zeros_like(ref)

    ref[...] += val.astype(ref.dtype)


# ---------------------------------------------------------------------------
# B1: stage-2 backward + datt partials
# ---------------------------------------------------------------------------


def _b1_kernel(xt_ref, dz_ref, att_ref,
               n1w_ref, n1b_ref, w1_ref, b1_ref, wdw_ref, bdw_ref,
               w3_ref, b3_ref, beta_ref, n2w_ref, n2b_ref,
               w4_ref, b4_ref, w5_ref, b5_ref, gamma_ref,
               dg_ref, dy_ref, datt_ref,
               dW3_ref, db3_ref, dbeta_ref, dn2w_ref, dn2b_ref,
               dW4_ref, db4_ref, dW5_ref, db5_ref, dgamma_ref,
               *, eps: float, th: int):
    from .naf_block import _prefix_tile

    f32 = jnp.float32
    bb, it = pl.program_id(0), pl.program_id(1)
    n_t = pl.num_programs(1)
    first = (bb == 0) & (it == 0)

    win = xt_ref[0, 0].astype(f32)  # (th+2, W, C)
    _, w, c = win.shape
    n = th * w
    g = _prefix_tile(win, n1w_ref[0].astype(f32), n1b_ref[0].astype(f32),
                     w1_ref[:].astype(f32), b1_ref[0].astype(f32),
                     wdw_ref[:].astype(f32), bdw_ref[0].astype(f32), eps, th, it, n_t)
    d2 = g.shape[-1]
    ffn = w4_ref.shape[1]
    gf = g.reshape(n, d2)
    att = att_ref[0, 0].astype(f32)  # (D,)
    a = gf * att
    u = jnp.dot(a, w3_ref[:].astype(f32), preferred_element_type=f32) + b3_ref[0].astype(f32)
    xf = win[1 : th + 1].reshape(n, c)
    beta = beta_ref[0].astype(f32)
    y = xf + u * beta
    yh, inv2 = _ln_fwd(y, eps)
    n2w = n2w_ref[0].astype(f32)
    ln2 = yh * n2w + n2b_ref[0].astype(f32)
    h = jnp.dot(ln2, w4_ref[:].astype(f32), preferred_element_type=f32) + b4_ref[0].astype(f32)
    h1, h2 = h[:, : ffn // 2], h[:, ffn // 2 :]
    hg = h1 * h2
    o = jnp.dot(hg, w5_ref[:].astype(f32), preferred_element_type=f32) + b5_ref[0].astype(f32)

    dz = dz_ref[0].astype(f32).reshape(n, c)
    gamma = gamma_ref[0].astype(f32)
    _acc(dgamma_ref, first, _sum8(jnp.sum(dz * o, axis=0)))
    do = dz * gamma
    _acc(dW5_ref, first, jnp.dot(hg.T, do, preferred_element_type=f32))
    _acc(db5_ref, first, _sum8(jnp.sum(do, axis=0)))
    dhg = jnp.dot(do, w5_ref[:].astype(f32).T, preferred_element_type=f32)
    dh = jnp.concatenate([dhg * h2, dhg * h1], axis=-1)
    _acc(dW4_ref, first, jnp.dot(ln2.T, dh, preferred_element_type=f32))
    _acc(db4_ref, first, _sum8(jnp.sum(dh, axis=0)))
    dln2 = jnp.dot(dh, w4_ref[:].astype(f32).T, preferred_element_type=f32)
    _acc(dn2w_ref, first, _sum8(jnp.sum(dln2 * yh, axis=0)))
    _acc(dn2b_ref, first, _sum8(jnp.sum(dln2, axis=0)))
    dy = dz + _ln_bwd(dln2 * n2w, yh, inv2)
    _acc(dbeta_ref, first, _sum8(jnp.sum(dy * u, axis=0)))
    du = dy * beta
    _acc(dW3_ref, first, jnp.dot(a.T, du, preferred_element_type=f32))
    _acc(db3_ref, first, _sum8(jnp.sum(du, axis=0)))
    da = jnp.dot(du, w3_ref[:].astype(f32).T, preferred_element_type=f32)

    dg_ref[0] = (da * att).reshape(th, w, d2).astype(dg_ref.dtype)
    dy_ref[0] = dy.reshape(th, w, c).astype(dy_ref.dtype)
    datt_ref[0, 0] = _sum8(jnp.sum(da * gf, axis=0))


# ---------------------------------------------------------------------------
# B2: stage-A (prefix) backward
# ---------------------------------------------------------------------------


def _b2_kernel(xt_ref, dgt_ref, dy_ref, dgk_ref,
               n1w_ref, n1b_ref, w1_ref, b1_ref, wdw_ref, bdw_ref,
               dx_ref,
               dW1_ref, db1_ref, dWdw_ref, dbdw_ref, dn1w_ref, dn1b_ref,
               *, eps: float, th: int):
    f32 = jnp.float32
    bb, it = pl.program_id(0), pl.program_id(1)
    n_t = pl.num_programs(1)
    first = (bb == 0) & (it == 0)

    win = xt_ref[0, 0].astype(f32)  # (th+4, W, C): global rows it·th-2 … it·th+th+2
    hp, w, c = win.shape
    dw = w1_ref.shape[1]
    d2 = dw // 2
    n = th * w

    x2 = win.reshape(hp * w, c)
    xh, inv1 = _ln_fwd(x2, eps)
    n1w = n1w_ref[0].astype(f32)
    ln1 = xh * n1w + n1b_ref[0].astype(f32)
    t = (jnp.dot(ln1, w1_ref[:].astype(f32), preferred_element_type=f32)
         + b1_ref[0].astype(f32)).reshape(hp, w, dw)
    # zero t on out-of-image window rows (halo-2 layout: rows 0,1 of the first
    # tile and rows th+2,th+3 of the last are outside the image)
    row = jax.lax.broadcasted_iota(jnp.int32, (hp, 1, 1), 0)
    t_valid = ~(((row < 2) & (it == 0)) | ((row >= hp - 2) & (it == n_t - 1)))
    t = jnp.where(t_valid, t, 0.0)

    # dwconv outputs on window rows [1, th+3) — full neighbour support
    wdw = wdw_ref[:].astype(f32)
    acc = jnp.broadcast_to(bdw_ref[0].astype(f32)[None, None, :], (th + 2, w, dw))
    for p in range(3):
        tp = t[p : p + th + 2]  # rows (w_d + p) for w_d ∈ [0, th+2) — see dWdw note
        for q in range(3):
            acc = acc + _shift_cols(tp, 1 - q) * wdw[p, q][None, None, :]
    dwm = acc  # (th+2, W, DW): dw-output at global rows it·th-1 … it·th+th+1

    # dg on the same (th+2) halo-1 window: spilled local part (host-padded
    # with zeros) + the global SCA part, masked to in-image rows
    dgk = dgk_ref[0, 0].astype(f32)  # (D,)
    dg = dgt_ref[0, 0].astype(f32) + dgk[None, None, :]
    rowd = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
    d_valid = ~(((rowd < 1) & (it == 0)) | ((rowd >= th + 1) & (it == n_t - 1)))
    dg = jnp.where(d_valid, dg, 0.0)

    ddw = jnp.concatenate([dg * dwm[:, :, d2:], dg * dwm[:, :, :d2]], axis=-1)  # (th+2, W, DW)

    inner = ddw[1 : th + 1]  # the tile's own rows
    _acc(dbdw_ref, first, _sum8(jnp.sum(inner, axis=(0, 1))))
    # dWdw[p,q,ch] = Σ_{r∈tile,s} ddw[r,s,ch]·t[r+p-1, s+q-1, ch]; in window
    # coords ddw row w_d=r+1 pairs with t row w_d+p — per-tap reductions
    taps = []
    for p in range(3):
        tp = t[p + 1 : p + 1 + th]  # t rows aligned to inner ddw rows
        for q in range(3):
            taps.append(jnp.sum(inner * _shift_cols(tp, 1 - q), axis=(0, 1)))
    _acc(dWdw_ref, first, jnp.concatenate(
        [jnp.stack(taps, axis=0), jnp.zeros((7, dw), f32)], axis=0))

    # dt on the tile rows: dt[r,s] = Σ_pq ddw_win[r+2-p, s+1-q]·wdw[p,q]
    dt = jnp.zeros((th, w, dw), f32)
    for p in range(3):
        dp = ddw[2 - p : 2 - p + th]
        for q in range(3):
            dt = dt + _shift_cols(dp, q - 1) * wdw[p, q][None, None, :]
    dtf = dt.reshape(n, dw)
    _acc(db1_ref, first, _sum8(jnp.sum(dtf, axis=0)))
    ln1_in = ln1.reshape(hp, w, c)[2 : th + 2].reshape(n, c)
    _acc(dW1_ref, first, jnp.dot(ln1_in.T, dtf, preferred_element_type=f32))
    dln1 = jnp.dot(dtf, w1_ref[:].astype(f32).T, preferred_element_type=f32)
    xh_in = xh.reshape(hp, w, c)[2 : th + 2].reshape(n, c)
    _acc(dn1w_ref, first, _sum8(jnp.sum(dln1 * xh_in, axis=0)))
    _acc(dn1b_ref, first, _sum8(jnp.sum(dln1, axis=0)))
    inv1_in = inv1.reshape(hp, w, 1)[2 : th + 2].reshape(n, 1)
    dx = dy_ref[0].astype(f32).reshape(n, c) + _ln_bwd(dln1 * n1w, xh_in, inv1_in)
    dx_ref[0] = dx.reshape(th, w, c).astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# host orchestration
# ---------------------------------------------------------------------------


def pick_bwd_tile(h: int, w: int, c: int) -> int | None:
    """Row tile for the backward passes, or None → delegate to the twin.

    B1's live set is the fat one (~22 C-equivalent fp32 maps per row: the
    6-map prefix at 2C, three FFN-wide maps, ~10 C/D-wide stage-2 maps);
    weights + VMEM-resident grad accumulators add 8·C·DW fp32 bytes.  10 MB
    budget, mirroring the forward picker's calibration (real v5e scoped limit
    16 MB, estimates undercount ~1.37×).  DCPT_TPU_NAF_BWD_TH forces a tile
    for on-chip tuning."""
    import os

    forced = int(os.environ.get("DCPT_TPU_NAF_BWD_TH", "0"))
    if forced:
        return forced if h % forced == 0 else None
    per_row = 4 * w * c * 22
    fixed = 8 * c * (2 * c) * 4  # w1+dW1+w4+dW4 dominate
    budget = 10 * 1024 * 1024
    for th in (32, 16, 8, 4):
        if h % th == 0 and (th + 4) * per_row + fixed <= budget:
            return th
    return None


def naf_block_bwd(x, n1w, n1b, w1, b1, wdw, bdw, wsca, bsca, w3, b3, beta,
                  n2w, n2b, w4, b4, w5, b5, gamma, pooled, att, dz,
                  eps: float, th: int, interpret: bool = False):
    """All 19 input cotangents of naf_block_ref, given upstream dz.

    ``pooled``/``att`` are the forward's SCA intermediates (saved residuals —
    recomputing them would cost an extra P1 pass)."""
    b, h, w, c = x.shape
    dw = w1.shape[1]
    d2 = dw // 2
    ffn = w4.shape[1]
    f2 = ffn // 2
    n_t = h // th
    f32 = jnp.float32

    xp1 = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    xt2 = jnp.stack([xp1[:, i * th : i * th + th + 2] for i in range(n_t)], 1)

    cst = lambda shape: pl.BlockSpec(shape, lambda bb, tt: (0,) * len(shape), memory_space=pltpu.VMEM)  # noqa: E731
    tile = lambda shape: pl.BlockSpec((1,) + shape, lambda bb, tt: (bb, tt) + (0,) * (len(shape) - 1), memory_space=pltpu.VMEM)  # noqa: E731
    wtile = lambda shape: pl.BlockSpec((1, 1) + shape, lambda bb, tt: (bb, tt) + (0,) * len(shape), memory_space=pltpu.VMEM)  # noqa: E731

    sum_shapes = lambda *shapes: [jax.ShapeDtypeStruct(s, f32) for s in shapes]  # noqa: E731

    dg, dy, datt_p, dW3, db3, dbeta, dn2w, dn2b, dW4, db4, dW5, db5, dgamma = pl.pallas_call(
        functools.partial(_b1_kernel, eps=eps, th=th),
        grid=(b, n_t),
        in_specs=[
            wtile((th + 2, w, c)),
            tile((th, w, c)),
            pl.BlockSpec((1, 8, d2), lambda bb, tt: (bb, 0, 0), memory_space=pltpu.VMEM),
            cst((1, c)), cst((1, c)), cst((c, dw)), cst((1, dw)), cst((3, 3, dw)), cst((1, dw)),
            cst((d2, c)), cst((1, c)), cst((1, c)), cst((1, c)), cst((1, c)),
            cst((c, ffn)), cst((1, ffn)), cst((f2, c)), cst((1, c)), cst((1, c)),
        ],
        out_specs=[
            tile((th, w, d2)),
            tile((th, w, c)),
            wtile((8, d2)),
            cst((d2, c)), cst((8, c)), cst((8, c)), cst((8, c)), cst((8, c)),
            cst((c, ffn)), cst((8, ffn)), cst((f2, c)), cst((8, c)), cst((8, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, d2), f32),
            jax.ShapeDtypeStruct((b, h, w, c), f32),
            jax.ShapeDtypeStruct((b, n_t, 8, d2), f32),
        ] + sum_shapes((d2, c), (8, c), (8, c), (8, c), (8, c),
                       (c, ffn), (8, ffn), (f2, c), (8, c), (8, c)),
        interpret=interpret,
    )(xt2, dz, jnp.broadcast_to(att.astype(f32)[:, None, :], (b, 8, d2)),
      n1w[None], n1b[None], w1, b1[None], wdw, bdw[None],
      w3, b3[None], beta[None], n2w[None], n2b[None],
      w4, b4[None], w5, b5[None], gamma[None])

    datt = jnp.sum(datt_p[:, :, 0], axis=1)  # (B, D)
    dpooled = datt @ wsca.astype(f32).T
    dWsca = pooled.astype(f32).T @ datt
    dbsca = jnp.sum(datt, axis=0)
    dgk = dpooled / jnp.float32(h * w)  # (B, D)

    xp2 = jnp.pad(x, ((0, 0), (2, 2), (0, 0), (0, 0)))
    xt4 = jnp.stack([xp2[:, i * th : i * th + th + 4] for i in range(n_t)], 1)
    dgp = jnp.pad(dg, ((0, 0), (1, 1), (0, 0), (0, 0)))
    dgt = jnp.stack([dgp[:, i * th : i * th + th + 2] for i in range(n_t)], 1)

    dx, dW1, db1, dWdw9, dbdw, dn1w, dn1b = pl.pallas_call(
        functools.partial(_b2_kernel, eps=eps, th=th),
        grid=(b, n_t),
        in_specs=[
            wtile((th + 4, w, c)),
            wtile((th + 2, w, d2)),
            tile((th, w, c)),
            pl.BlockSpec((1, 8, d2), lambda bb, tt: (bb, 0, 0), memory_space=pltpu.VMEM),
            cst((1, c)), cst((1, c)), cst((c, dw)), cst((1, dw)), cst((3, 3, dw)), cst((1, dw)),
        ],
        out_specs=[
            tile((th, w, c)),
            cst((c, dw)), cst((8, dw)), cst((16, dw)), cst((8, dw)), cst((8, c)), cst((8, c)),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, h, w, c), f32)]
        + sum_shapes((c, dw), (8, dw), (16, dw), (8, dw), (8, c), (8, c)),
        interpret=interpret,
    )(xt4, dgt, dy,
      jnp.broadcast_to(dgk[:, None, :], (b, 8, d2)),
      n1w[None], n1b[None], w1, b1[None], wdw, bdw[None])

    grads = (
        dx,
        dn1w[0], dn1b[0],
        dW1, db1[0], dWdw9[:9].reshape(3, 3, dw), dbdw[0],
        dWsca, dbsca,
        dW3, db3[0], dbeta[0],
        dn2w[0], dn2b[0],
        dW4, db4[0],
        dW5, db5[0],
        dgamma[0],
    )
    primals = (x, n1w, n1b, w1, b1, wdw, bdw, wsca, bsca, w3, b3, beta,
               n2w, n2b, w4, b4, w5, b5, gamma)
    return tuple(g.astype(p.dtype) for g, p in zip(grads, primals))
