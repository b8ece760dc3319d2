"""Analytic Pallas backward for the whole-TransformerBlock (MDTA+GDFN) kernel.

The forward fusion (``mdta_block.py``) wins 2.0× fp32 / 1.6× bf16 at the
128px training geometry, but training never benefited: the custom-VJP
``_fwd`` delegates to the jnp twin (the NAF recompute-VJP lesson — PARITY
"NAFNet kernel A/B (round 3)").  This module scales the proven
``naf_block_bwd`` two-pass recipe to the TransformerBlock (reference block:
``basicsr/archs/restormer_arch.py:75-145``):

  B1  per (batch, row-tile): recompute out = v·attnᵀ, y, LN2 and the GDFN
      forward on a halo-2 window, then the stage-2 backward: GELU-gate →
      dwconv transpose + tap grads → project_in/LN2 backward → dy; then the
      attention application backward: dout = dy·wprojᵀ, dv = dout·attn
      (spilled), and the GLOBAL C×C  dattn += doutᵀ·v  accumulated across
      tiles — the only cross-tile coupling of stage 2.
  --  host: activation backward on the C×C micro-matrix (softmax / masked
      ReLU), temperature grad, and the L2-normalisation backward, which
      collapses to C-vector math:  dqn2_c = −½·iq_c²·⟨ds_c·, s_c·⟩  (the
      norm-backward inner product ⟨dq̂_c, q̂_c⟩ equals Σ_d dĜ_cd·Ĝ_cd, so no
      extra pixel pass is needed) — then dgram feeds B2.
  B2  per (batch, row-tile): recompute LN1 → qkv 1×1 → dwconv per C-chunk
      (q and k stay in VMEM, the 3C map never materialises), form
      dq = k·dgramᵀ + 2q·dqn2 and dk = q·dgram + 2k·dkn2 on the halo-1
      window, then per chunk the depthwise stencils (dWdwq correlation +
      transpose conv), qkv weight grad, LN1 backward → dx (+dy residual).

Out-of-image halo rows are masked exactly like the forward kernel so the
depthwise borders match lax zero padding; every grad matches
``jax.vjp(mdta_block_ref)`` (parity test, interpret mode) for both flavours
(Restormer ReLU/BiasFree and PromptIR softmax/WithBias).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .naf_block import _shift_cols
from .naf_block_bwd import _acc, _ln_bwd, _sum8


def _ln_fwd_flavored(x2, w, b, eps, ln_bias):
    """Channel LN forward keeping the backward residuals.

    Returns (ln, xh, mu, inv) where xh is the pre-weight normalised output
    (the dw cotangent pairs with it in both flavours)."""
    mu = jnp.mean(x2, axis=-1, keepdims=True)
    var = jnp.mean((x2 - mu) ** 2, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    if ln_bias:
        xh = (x2 - mu) * inv
        return xh * w + b, xh, mu, inv
    xh = x2 * inv  # BiasFree: un-centred output, centred variance
    return xh * w, xh, mu, inv


def _ln_bwd_biasfree(dl, x2, mu, inv):
    """d/dx of  x·rsqrt(var(x)+eps)  given cotangent dl (weight folded in):
    dx_j = inv·dl_j − inv³·(x_j−μ)·mean_i(dl_i·x_i)."""
    return inv * dl - inv**3 * (x2 - mu) * jnp.mean(dl * x2, axis=-1, keepdims=True)


def _gelu_and_grad(x):
    """Exact-erf GELU value and derivative (fp32), sharing the rational erf
    of ops/erf_gelu.py: gelu'(x) = ½(1+erf(x/√2)) + x·φ(x)."""
    z = x * 0.7071067811865476
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf_abs = 1.0 - poly * jnp.exp(-az * az)
    erf = jnp.where(z >= 0, erf_abs, -erf_abs)
    half = 0.5 * (1.0 + erf)
    phi = 0.3989422804014327 * jnp.exp(-0.5 * x * x)
    return x * half, half + x * phi


# ---------------------------------------------------------------------------
# B1: GDFN + attention-application backward, global dattn accumulation
# ---------------------------------------------------------------------------


def _b1_kernel(xt_ref, vt_ref, dzt_ref, attn_ref,
               wproj_ref, n2w_ref, n2b_ref, win_ref, wdwf_ref, wout_ref,
               dy_ref, dv_ref, dattn_ref,
               dwproj_ref, dn2w_ref, dn2b_ref, dwin_ref, dWdwf_ref, dwout_ref,
               *, eps: float, ln_bias: bool, th: int):
    f32 = jnp.float32
    bb, it = pl.program_id(0), pl.program_id(1)
    n_t = pl.num_programs(1)
    first = (bb == 0) & (it == 0)

    xw = xt_ref[0, 0].astype(f32)  # (th+4, W, C): global rows it·th-2 … it·th+th+2
    vw = vt_ref[0, 0].astype(f32)
    hp, w, c = xw.shape
    f = win_ref.shape[1] // 2
    n = th * w
    nw = (th + 2) * w

    # recompute out = v·attnᵀ and y = x + out·wproj on the whole window
    # (zero-padded rows stay zero: x, v are zero outside the image and every
    # 1×1 is bias-free in the shipped configs)
    A = attn_ref[0].astype(f32)
    vf = vw.reshape(hp * w, c)
    out = jax.lax.dot_general(vf, A, (((1,), (1,)), ((), ())), preferred_element_type=f32)
    y = xw.reshape(hp * w, c) + jnp.dot(out, wproj_ref[:].astype(f32), preferred_element_type=f32)

    n2w = n2w_ref[0].astype(f32)
    ln2, yh, mu, inv = _ln_fwd_flavored(y, n2w, n2b_ref[0].astype(f32), eps, ln_bias)

    row = jax.lax.broadcasted_iota(jnp.int32, (hp, 1, 1), 0)
    t_valid = ~(((row < 2) & (it == 0)) | ((row >= hp - 2) & (it == n_t - 1)))

    def _half_fwd(lo, hi):
        """project_in + dwconv for one GDFN half: pre-conv map on all hp rows
        (masked to zero outside the image), dw output on the th+2 window.
        The dw weight half is sliced on the REF (forward-kernel pattern) —
        lane-slicing a loaded value at an unaligned offset and broadcasting
        it is a Mosaic invalid-layout error at F=255 (level-2 GDFN)."""
        t = jnp.dot(ln2, win_ref[:, lo:hi].astype(f32), preferred_element_type=f32).reshape(hp, w, hi - lo)
        t = jnp.where(t_valid, t, 0.0)
        wdwf_h = wdwf_ref[:, :, lo:hi].astype(f32)
        acc = jnp.zeros((th + 2, w, hi - lo), f32)
        for p in range(3):
            tp = t[p : p + th + 2]
            for q in range(3):
                acc = acc + _shift_cols(tp, 1 - q) * wdwf_h[p, q][None, None, :]
        return t, acc

    ta_pre, ta = _half_fwd(0, f)
    tb_pre, tb = _half_fwd(f, 2 * f)
    taf = ta.reshape(nw, f)
    tbf = tb.reshape(nw, f)

    dz = dzt_ref[0, 0].astype(f32).reshape(nw, c)  # halo-1 dz window (zero padded)
    dgated = jnp.dot(dz, wout_ref[:].astype(f32).T, preferred_element_type=f32)
    ga, gd = _gelu_and_grad(taf)
    dz_in = dz.reshape(th + 2, w, c)[1 : th + 1].reshape(n, c)
    gated_in = (ga * tbf).reshape(th + 2, w, f)[1 : th + 1].reshape(n, f)
    _acc(dwout_ref, first,
         jax.lax.dot_general(gated_in, dz_in, (((0,), (0,)), ((), ())), preferred_element_type=f32))

    rowd = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
    d_valid = ~(((rowd < 1) & (it == 0)) | ((rowd >= th + 1) & (it == n_t - 1)))
    dta = jnp.where(d_valid, (dgated * tbf * gd).reshape(th + 2, w, f), 0.0)
    dtb = jnp.where(d_valid, (dgated * ga).reshape(th + 2, w, f), 0.0)

    def _half_bwd(dt2, t_pre, lo, hi):
        """Tap grads (each dt2 row counted once, on the tile's own rows) and
        the transpose conv back to the pre-dw map — naf_block_bwd._b2 indices."""
        taps = []
        for p in range(3):
            tp = t_pre[p + 1 : p + 1 + th]
            for q in range(3):
                taps.append(jnp.sum(dt2[1 : th + 1] * _shift_cols(tp, 1 - q), axis=(0, 1)))
        wdwf_h = wdwf_ref[:, :, lo:hi].astype(f32)
        dt = jnp.zeros((th, w, hi - lo), f32)
        for p in range(3):
            dp = dt2[2 - p : 2 - p + th]
            for q in range(3):
                dt = dt + _shift_cols(dp, q - 1) * wdwf_h[p, q][None, None, :]
        return jnp.stack(taps, axis=0), dt

    tapsa, dtina = _half_bwd(dta, ta_pre, 0, f)
    tapsb, dtinb = _half_bwd(dtb, tb_pre, f, 2 * f)
    _acc(dWdwf_ref, first, jnp.concatenate(
        [jnp.concatenate([tapsa, tapsb], axis=1), jnp.zeros((7, 2 * f), f32)], axis=0))

    ln2_in = ln2.reshape(hp, w, c)[2 : th + 2].reshape(n, c)
    dta_f = dtina.reshape(n, f)
    dtb_f = dtinb.reshape(n, f)
    _acc(dwin_ref, first, jnp.concatenate(
        [jnp.dot(ln2_in.T, dta_f, preferred_element_type=f32),
         jnp.dot(ln2_in.T, dtb_f, preferred_element_type=f32)], axis=1))
    dln2 = (jnp.dot(dta_f, win_ref[:, :f].astype(f32).T, preferred_element_type=f32)
            + jnp.dot(dtb_f, win_ref[:, f:].astype(f32).T, preferred_element_type=f32))

    yh_in = yh.reshape(hp, w, c)[2 : th + 2].reshape(n, c)
    _acc(dn2w_ref, first, _sum8(jnp.sum(dln2 * yh_in, axis=0)))
    _acc(dn2b_ref, first, _sum8(jnp.sum(dln2, axis=0)))
    dl = dln2 * n2w
    inv_in = inv.reshape(hp, w, 1)[2 : th + 2].reshape(n, 1)
    if ln_bias:
        dy_ln = _ln_bwd(dl, yh_in, inv_in)
    else:
        y_in = y.reshape(hp, w, c)[2 : th + 2].reshape(n, c)
        mu_in = mu.reshape(hp, w, 1)[2 : th + 2].reshape(n, 1)
        dy_ln = _ln_bwd_biasfree(dl, y_in, mu_in, inv_in)
    dy = dz_in + dy_ln

    out_in = out.reshape(hp, w, c)[2 : th + 2].reshape(n, c)
    _acc(dwproj_ref, first,
         jax.lax.dot_general(out_in, dy, (((0,), (0,)), ((), ())), preferred_element_type=f32))
    dout = jnp.dot(dy, wproj_ref[:].astype(f32).T, preferred_element_type=f32)
    v_in = vw[2 : th + 2].reshape(n, c)
    da = jax.lax.dot_general(dout, v_in, (((0,), (0,)), ((), ())), preferred_element_type=f32)

    @pl.when(it == 0)
    def _init():
        dattn_ref[0] = da

    @pl.when(it > 0)
    def _accum():
        dattn_ref[0] += da

    dv = jax.lax.dot_general(dout, A, (((1,), (0,)), ((), ())), preferred_element_type=f32)
    dy_ref[0] = dy.reshape(th, w, c)
    dv_ref[0] = dv.reshape(th, w, c)


# ---------------------------------------------------------------------------
# B2: qkv-prefix backward
# ---------------------------------------------------------------------------


def _b2_kernel(xt_ref, dvt_ref, dy_ref, dgram_ref, dqn2_ref, dkn2_ref,
               n1w_ref, n1b_ref, wqkv_ref, wdwq_ref,
               dx_ref, dwqkv_ref, dWdwq_ref, dn1w_ref, dn1b_ref,
               *, eps: float, ln_bias: bool, th: int):
    f32 = jnp.float32
    bb, it = pl.program_id(0), pl.program_id(1)
    n_t = pl.num_programs(1)
    first = (bb == 0) & (it == 0)

    win = xt_ref[0, 0].astype(f32)  # (th+4, W, C)
    hp, w, c = win.shape
    n = th * w
    nw = (th + 2) * w

    x2 = win.reshape(hp * w, c)
    n1w = n1w_ref[0].astype(f32)
    ln1, xh, mu, inv = _ln_fwd_flavored(x2, n1w, n1b_ref[0].astype(f32), eps, ln_bias)

    row = jax.lax.broadcasted_iota(jnp.int32, (hp, 1, 1), 0)
    t_valid = ~(((row < 2) & (it == 0)) | ((row >= hp - 2) & (it == n_t - 1)))

    def _pre(lo, hi):
        t = jnp.dot(ln1, wqkv_ref[:, lo:hi].astype(f32), preferred_element_type=f32).reshape(hp, w, hi - lo)
        return jnp.where(t_valid, t, 0.0)

    def _dw(t, lo, hi):
        # dw weight chunk sliced on the REF — see _half_fwd in _b1_kernel
        wdwq_c = wdwq_ref[:, :, lo:hi].astype(f32)
        acc = jnp.zeros((th + 2, w, hi - lo), f32)
        for p in range(3):
            tp = t[p : p + th + 2]
            for q in range(3):
                acc = acc + _shift_cols(tp, 1 - q) * wdwq_c[p, q][None, None, :]
        return acc

    tq_pre = _pre(0, c)
    tk_pre = _pre(c, 2 * c)
    qf = _dw(tq_pre, 0, c).reshape(nw, c)
    kf = _dw(tk_pre, c, 2 * c).reshape(nw, c)

    rowd = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
    d_valid = ~(((rowd < 1) & (it == 0)) | ((rowd >= th + 1) & (it == n_t - 1)))
    dgram = dgram_ref[0].astype(f32)  # (C, C)
    dqn2 = dqn2_ref[0, 0].astype(f32)  # (C,)
    dkn2 = dkn2_ref[0, 0].astype(f32)
    # dq_pc = Σ_d dG_cd·k_pd + 2·q_pc·dqn2_c ; dk_pd = Σ_c q_pc·dG_cd + 2·k_pd·dkn2_d
    dq = (jax.lax.dot_general(kf, dgram, (((1,), (1,)), ((), ())), preferred_element_type=f32)
          + 2.0 * qf * dqn2[None, :])
    dk = (jax.lax.dot_general(qf, dgram, (((1,), (0,)), ((), ())), preferred_element_type=f32)
          + 2.0 * kf * dkn2[None, :])
    dq = jnp.where(d_valid, dq.reshape(th + 2, w, c), 0.0)
    dk = jnp.where(d_valid, dk.reshape(th + 2, w, c), 0.0)
    dv = jnp.where(d_valid, dvt_ref[0, 0].astype(f32), 0.0)

    ln1_in = ln1.reshape(hp, w, c)[2 : th + 2].reshape(n, c)
    dln1 = jnp.zeros((n, c), f32)
    taps_all, dwqkv_cols = [], []
    for lo, dchunk, t_pre in ((0, dq, tq_pre), (c, dk, tk_pre), (2 * c, dv, _pre(2 * c, 3 * c))):
        taps = []
        for p in range(3):
            tp = t_pre[p + 1 : p + 1 + th]
            for q in range(3):
                taps.append(jnp.sum(dchunk[1 : th + 1] * _shift_cols(tp, 1 - q), axis=(0, 1)))
        taps_all.append(jnp.stack(taps, axis=0))
        wdwq_c = wdwq_ref[:, :, lo : lo + c].astype(f32)
        dt = jnp.zeros((th, w, c), f32)
        for p in range(3):
            dp = dchunk[2 - p : 2 - p + th]
            for q in range(3):
                dt = dt + _shift_cols(dp, q - 1) * wdwq_c[p, q][None, None, :]
        dtf = dt.reshape(n, c)
        dwqkv_cols.append(jnp.dot(ln1_in.T, dtf, preferred_element_type=f32))
        dln1 = dln1 + jnp.dot(dtf, wqkv_ref[:, lo : lo + c].astype(f32).T, preferred_element_type=f32)
    _acc(dWdwq_ref, first, jnp.concatenate(
        [jnp.concatenate(taps_all, axis=1), jnp.zeros((7, 3 * c), f32)], axis=0))
    _acc(dwqkv_ref, first, jnp.concatenate(dwqkv_cols, axis=1))

    xh_in = xh.reshape(hp, w, c)[2 : th + 2].reshape(n, c)
    _acc(dn1w_ref, first, _sum8(jnp.sum(dln1 * xh_in, axis=0)))
    _acc(dn1b_ref, first, _sum8(jnp.sum(dln1, axis=0)))
    dl = dln1 * n1w
    inv_in = inv.reshape(hp, w, 1)[2 : th + 2].reshape(n, 1)
    if ln_bias:
        dx = _ln_bwd(dl, xh_in, inv_in)
    else:
        x_in = win[2 : th + 2].reshape(n, c)
        mu_in = mu.reshape(hp, w, 1)[2 : th + 2].reshape(n, 1)
        dx = _ln_bwd_biasfree(dl, x_in, mu_in, inv_in)
    dx = dy_ref[0].astype(f32).reshape(n, c) + dx
    dx_ref[0] = dx.reshape(th, w, c).astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# host orchestration
# ---------------------------------------------------------------------------


def pick_bwd_tile(h: int, w: int, c: int, f: int) -> int | None:
    """Row tile for the backward passes, or None → delegate to the twin.

    B1 holds ~8 C-wide fp32 row maps (x/v/out/y/ln2 windows, dz/dy/dv/dout)
    plus ~12 F-wide maps at peak (the two GDFN halves' pre/post/cotangent
    maps and the dwconv shift pipeline); B2 is ~14 C-wide.  Budget mirrors
    naf_block_bwd.pick_bwd_tile (10 MB against the real 16 MB scoped-vmem
    limit, estimates undercount ~1.37×).  DCPT_TPU_MDTA_BWD_TH forces a tile
    for on-chip tuning."""
    forced = int(_os.environ.get("DCPT_TPU_MDTA_BWD_TH", "0"))
    if forced:
        return forced if h % forced == 0 else None
    per_row = 4 * w * max(8 * c + 12 * f, 14 * c)
    fixed = 4 * (4 * c * 3 * c + 4 * c * 2 * f + 2 * c * c)
    budget = 10 * 1024 * 1024
    for th in (32, 16, 8, 4):
        if h % th == 0 and (th + 4) * per_row + fixed <= budget:
            return th
    return None


def mdta_block_bwd(x, n1w, n1b, wqkv, wdwq, temperature, wproj, n2w, n2b,
                   win_, wdwf, wout, v, gram, qn2, kn2, attn, dz,
                   heads: int, use_softmax: bool, ln_bias: bool, eps: float,
                   th: int, interpret: bool = False):
    """All 12 input cotangents of mdta_block_ref, given upstream dz.

    ``v``/``gram``/``qn2``/``kn2``/``attn`` are the forward kernel's saved
    residuals (mdta_block._block_pallas with_res=True)."""
    b, h, w, c = x.shape
    f = win_.shape[1] // 2
    n_t = h // th
    f32 = jnp.float32
    ch = c // heads

    def win4(t):
        tp = jnp.pad(t, ((0, 0), (2, 2), (0, 0), (0, 0)))
        return jnp.stack([tp[:, i * th : i * th + th + 4] for i in range(n_t)], 1)

    def win2(t):
        tp = jnp.pad(t, ((0, 0), (1, 1), (0, 0), (0, 0)))
        return jnp.stack([tp[:, i * th : i * th + th + 2] for i in range(n_t)], 1)

    cst = lambda shape: pl.BlockSpec(shape, lambda bb, tt: (0,) * len(shape), memory_space=pltpu.VMEM)  # noqa: E731
    tile = lambda shape: pl.BlockSpec((1,) + shape, lambda bb, tt: (bb, tt) + (0,) * (len(shape) - 1), memory_space=pltpu.VMEM)  # noqa: E731
    wtile = lambda shape: pl.BlockSpec((1, 1) + shape, lambda bb, tt: (bb, tt) + (0,) * len(shape), memory_space=pltpu.VMEM)  # noqa: E731
    perb = lambda shape: pl.BlockSpec((1,) + shape, lambda bb, tt: (bb,) + (0,) * len(shape), memory_space=pltpu.VMEM)  # noqa: E731
    sum_shapes = lambda *shapes: [jax.ShapeDtypeStruct(s, f32) for s in shapes]  # noqa: E731

    dy, dv, dattn, dwproj, dn2w, dn2b, dwin, dWdwf16, dwout = pl.pallas_call(
        functools.partial(_b1_kernel, eps=eps, ln_bias=ln_bias, th=th),
        grid=(b, n_t),
        in_specs=[
            wtile((th + 4, w, c)), wtile((th + 4, w, c)), wtile((th + 2, w, c)),
            perb((c, c)),
            cst((c, c)), cst((1, c)), cst((1, c)), cst((c, 2 * f)), cst((3, 3, 2 * f)), cst((f, c)),
        ],
        out_specs=[
            tile((th, w, c)), tile((th, w, c)), perb((c, c)),
            cst((c, c)), cst((8, c)), cst((8, c)), cst((c, 2 * f)), cst((16, 2 * f)), cst((f, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, c), f32),
            jax.ShapeDtypeStruct((b, h, w, c), f32),
            jax.ShapeDtypeStruct((b, c, c), f32),
        ] + sum_shapes((c, c), (8, c), (8, c), (c, 2 * f), (16, 2 * f), (f, c)),
        interpret=interpret,
    )(win4(x), win4(v), win2(dz), attn.astype(f32),
      wproj, n2w[None], n2b[None], win_, wdwf, wout)

    # --- host micro: activation + temperature + L2-normalisation backward ---
    gram = gram.astype(f32)
    attn = attn.astype(f32)
    iq = jax.lax.rsqrt(jnp.maximum(qn2.astype(f32), 1e-24))
    ik = jax.lax.rsqrt(jnp.maximum(kn2.astype(f32), 1e-24))
    ngram = gram * iq[:, :, None] * ik[:, None, :]
    temp = jnp.repeat(temperature.reshape(heads).astype(f32), ch)
    blk = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0) // ch == (
        jax.lax.broadcasted_iota(jnp.int32, (c, c), 1) // ch)
    if use_softmax:
        ds = attn * (dattn - jnp.sum(dattn * attn, axis=-1, keepdims=True))
    else:
        s = ngram * temp[None, :, None]
        ds = jnp.where(blk[None] & (s > 0), dattn, 0.0)
    dtemp = jnp.sum(jnp.where(blk[None], ds * ngram, 0.0), axis=(0, 2))
    dtemp = jnp.sum(dtemp.reshape(heads, ch), axis=1).reshape(temperature.shape)
    dsn = ds * temp[None, :, None]  # cotangent on the normalised Gram
    dgram = dsn * iq[:, :, None] * ik[:, None, :]
    # rsqrt backward: d iq/d qn2 = −½·iq³ (clamp inactive for qn2 > 1e-24)
    dqn2 = jnp.sum(dsn * gram * ik[:, None, :], axis=2) * (-0.5) * iq**3 * (qn2 > 1e-24)
    dkn2 = jnp.sum(dsn * gram * iq[:, :, None], axis=1) * (-0.5) * ik**3 * (kn2 > 1e-24)

    dx, dwqkv, dWdwq16, dn1w, dn1b = pl.pallas_call(
        functools.partial(_b2_kernel, eps=eps, ln_bias=ln_bias, th=th),
        grid=(b, n_t),
        in_specs=[
            wtile((th + 4, w, c)), wtile((th + 2, w, c)), tile((th, w, c)),
            perb((c, c)), perb((8, c)), perb((8, c)),
            cst((1, c)), cst((1, c)), cst((c, 3 * c)), cst((3, 3, 3 * c)),
        ],
        out_specs=[
            tile((th, w, c)),
            cst((c, 3 * c)), cst((16, 3 * c)), cst((8, c)), cst((8, c)),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, h, w, c), f32)]
        + sum_shapes((c, 3 * c), (16, 3 * c), (8, c), (8, c)),
        interpret=interpret,
    )(win4(x), win2(dv), dy, dgram,
      jnp.broadcast_to(dqn2[:, None, :], (b, 8, c)),
      jnp.broadcast_to(dkn2[:, None, :], (b, 8, c)),
      n1w[None], n1b[None], wqkv, wdwq)

    zeros_b = (jnp.zeros_like(n1b), jnp.zeros_like(n2b))
    grads = (
        dx,
        dn1w[0], dn1b[0] if ln_bias else zeros_b[0],
        dwqkv, dWdwq16[:9].reshape(3, 3, 3 * c),
        dtemp,
        dwproj,
        dn2w[0], dn2b[0] if ln_bias else zeros_b[1],
        dwin, dWdwf16[:9].reshape(3, 3, 2 * f),
        dwout,
    )
    primals = (x, n1w, n1b, wqkv, wdwq, temperature, wproj, n2w, n2b, win_, wdwf, wout)
    return tuple(g.astype(p.dtype) for g, p in zip(grads, primals))
