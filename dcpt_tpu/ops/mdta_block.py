"""Whole-TransformerBlock (MDTA + GDFN) fusion — two Pallas kernels + a host
attention micro-matrix.

The Restormer roofline (PARITY.md) measured the model HBM-bandwidth-bound
across many small well-fused XLA ops, with the remaining ~2× headroom gated
on whole-block VMEM residency — which single-pass kernels can't provide
because the MDTA q/k L2-normalisation and channel Gram are GLOBAL pixel
reductions.  This module supplies the two-phase answer (the NAFBlock /
SwinBlock round-3 recipe, reference basicsr/archs/restormer_arch.py:75-145):

  P1  per (batch, row-tile): LN1 → qkv 1×1 → depthwise 3×3, then
      accumulate the RAW channel Gram  G += qᵀk  (C×C, fp32), the squared
      norms |q|²,|k|² (C), and spill v — q and k never touch HBM;
  --  host: attn = act(G · rsqrt|q|² ⊗ rsqrt|k|² · T) on the C×C micro
      matrix, with the per-head structure applied as a BLOCK-DIAGONAL mask
      (channels stay packed: no per-head relayouts, C_h is 48 at every
      level of the shipped configs so the masked waste is small and the
      lane-unaligned head reshapes that sank the round-2 per-op kernels
      disappear);
  P2  per (batch, row-tile): out = v·attnᵀ → project_out → +x residual →
      LN2 → project_in → depthwise 3×3 → exact-erf GELU gate →
      project_out → +residual, emitting the block output once.

L2-normalising AFTER the Gram is exact: (q̂k̂ᵀ)_cd = G_cd/(|q_c||k_d|) —
the same identity the context-parallel MDTA psums use
(archs/restormer_arch.py MDTA.cp).  Softmax (PromptIR) is computed on the
host micro-matrix with off-block logits at −∞, equal to the per-head
softmax.  Supports BiasFree (Restormer, eps 1e-6) and WithBias (PromptIR,
eps 1e-5) LayerNorms; all convs are bias-free in both shipped configs.

HBM traffic per block: read x twice (+2 halo rows/tile), write+read v,
write z ≈ 6 C-wide traversals vs XLA's ~20+.  Backward delegates to the
jnp twin (kernels fire on inference traces only — see naf_block.py).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .erf_gelu import gelu_exact as _gelu_exact  # shared with window_attention
from .naf_block import _halo_pairs, _shift_cols, _shift_rows


def _ln_channel(x2, w, b, eps, ln_bias):
    """Channel LayerNorm on (rows, C) fp32; BiasFree keeps the uncentred
    output with centred variance (reference restormer_arch.py:26-41)."""
    mu = jnp.mean(x2, axis=-1, keepdims=True)
    var = jnp.mean((x2 - mu) ** 2, axis=-1, keepdims=True)
    if ln_bias:
        return (x2 - mu) * jax.lax.rsqrt(var + eps) * w + b
    return x2 * jax.lax.rsqrt(var + eps) * w




def _dwconv3x3(t, wdw, valid):
    """9-tap depthwise 3×3 on (hp, W, D) via shifts; `valid` masks rows that
    lie outside the image so the border matches lax zero padding."""
    t = jnp.where(valid, t, 0.0)
    hp, w, d = t.shape
    acc = jnp.zeros((hp, w, d), jnp.float32)
    for dy in (-1, 0, 1):
        ty = _shift_rows(t, dy)
        for dx in (-1, 0, 1):
            acc = acc + _shift_cols(ty, dx) * wdw[1 - dy, 1 - dx][None, None, :]
    return acc


def _attn_from_stats(gram, qn2, kn2, temperature, heads, use_softmax):
    """Host micro-step: (B, C, C) raw Gram + norms → masked attention."""
    b, c, _ = gram.shape
    ch = c // heads
    # F.normalize eps: x / max(|x|, 1e-12) == x * rsqrt(max(|x|², 1e-24))
    attn = gram * jax.lax.rsqrt(jnp.maximum(qn2, 1e-24))[:, :, None]
    attn = attn * jax.lax.rsqrt(jnp.maximum(kn2, 1e-24))[:, None, :]
    temp = jnp.repeat(temperature.reshape(heads), ch)  # (C,)
    attn = attn * temp[None, :, None]
    blk = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0) // ch == (
        jax.lax.broadcasted_iota(jnp.int32, (c, c), 1) // ch
    )
    if use_softmax:
        attn = jax.nn.softmax(jnp.where(blk[None], attn, -jnp.inf), axis=-1)
    else:
        attn = jnp.where(blk[None], jax.nn.relu(attn), 0.0)
    return attn.astype(jnp.float32)


def mdta_block_ref(x, n1w, n1b, wqkv, wdwq, temperature, wproj,
                   n2w, n2b, win_, wdwf, wout,
                   heads: int, use_softmax: bool, ln_bias: bool, eps: float):
    """jnp twin of the whole TransformerBlock on (B, H, W, C).

    1×1 projections are CONVS (not einsums) so differentiated traces that
    compile this twin keep conv producers in front of the grouped dwconvs
    (the v5e cliff — PARITY "NAFNet kernel A/B (round 2)")."""
    b, h, w, c = x.shape

    def conv1x1(t, wmat):
        ci, co = wmat.shape
        return jax.lax.conv_general_dilated(
            t, wmat.reshape(1, 1, ci, co), (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def dwconv(t, wdw):
        d = t.shape[-1]
        return jax.lax.conv_general_dilated(
            t, wdw.reshape(3, 3, 1, d), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=d)

    ln1 = _ln_channel(x.reshape(-1, c).astype(jnp.float32), n1w, n1b, eps, ln_bias)
    qkv = dwconv(conv1x1(ln1.reshape(b, h, w, c).astype(x.dtype), wqkv), wdwq)
    q, k, v = jnp.split(qkv.astype(jnp.float32), 3, axis=-1)
    q2, k2 = q.reshape(b, -1, c), k.reshape(b, -1, c)
    gram = jnp.einsum("bpc,bpd->bcd", q2, k2)
    qn2 = jnp.sum(q2 * q2, axis=1)
    kn2 = jnp.sum(k2 * k2, axis=1)
    attn = _attn_from_stats(gram, qn2, kn2, temperature, heads, use_softmax)
    out = jnp.einsum("bpd,bcd->bpc", v.reshape(b, -1, c), attn)
    y = x + conv1x1(out.reshape(b, h, w, c).astype(x.dtype), wproj)

    ln2 = _ln_channel(y.reshape(-1, c).astype(jnp.float32), n2w, n2b, eps, ln_bias)
    t2 = dwconv(conv1x1(ln2.reshape(b, h, w, c).astype(y.dtype), win_), wdwf)
    f2 = t2.shape[-1] // 2
    gated = _gelu_exact(t2[..., :f2].astype(jnp.float32)) * t2[..., f2:].astype(jnp.float32)
    return y + conv1x1(gated.astype(y.dtype), wout)


def _pad_cols(t):
    """Zero column each side.  The 1×1 convs are bias-free in every shipped
    config, so a zero input column yields a zero projected column — exactly
    the dwconv's zero padding; interior slab edges instead slice REAL
    neighbour columns from this padded full-width map."""
    hp, _, c = t.shape
    zero = jnp.zeros((hp, 1, c), t.dtype)
    return jnp.concatenate([zero, t, zero], axis=1)


def _p1_kernel(x_ref, halo_ref, n1w_ref, n1b_ref, wqkv_ref, wdwq_ref,
               v_ref, gram_ref, qn2_ref, kn2_ref, *,
               eps: float, ln_bias: bool, th: int, sw: int):
    f32 = jnp.float32
    it = pl.program_id(1)
    n_t = pl.num_programs(1)
    x = x_ref[0].astype(f32)  # (th, W, C)
    _, w, c = x.shape
    win = jnp.concatenate([halo_ref[0, 0, 0:1].astype(f32), x, halo_ref[0, 0, 1:2].astype(f32)], axis=0)
    hp = th + 2
    ln = _ln_channel(win.reshape(hp * w, c), n1w_ref[0].astype(f32), n1b_ref[0].astype(f32), eps, ln_bias)
    row = jax.lax.broadcasted_iota(jnp.int32, (hp, 1, 1), 0)
    valid = ~(((row == 0) & (it == 0)) | ((row == hp - 1) & (it == n_t - 1)))

    if sw == w:
        # full-width fast path — the A/B-measured winner body, with q/k/v as
        # THREE sequential C-wide dot+dwconv passes: the depthwise conv is
        # channel-independent, so chunking never materializes the 3C map —
        # peak fat drops ~3× and the measured th=16 deep-level tilings fit
        # VMEM with real headroom (the monolithic-3C variant OOMed the
        # compiler at 16.45M/16M on scheduling luck).  Width stays exactly W:
        # a +2-column padded variant measured 2.4× slower (sublane-alignment
        # relayouts — PARITY "MDTA big-shape A/B").
        def _proj_dw(lo, hi):
            t = jnp.dot(ln, wqkv_ref[:, lo:hi].astype(f32), preferred_element_type=f32)
            return _dwconv3x3(t.reshape(hp, w, hi - lo),
                              wdwq_ref[:, :, lo:hi].astype(f32), valid)[1 : th + 1]

        q = _proj_dw(0, c).reshape(th * w, c)
        k = _proj_dw(c, 2 * c).reshape(th * w, c)
        v_ref[0] = _proj_dw(2 * c, 3 * c).astype(v_ref.dtype)
        g = jax.lax.dot_general(q, k, (((0,), (0,)), ((), ())), preferred_element_type=f32)
        qs = jnp.sum(q * q, axis=0)
        ks = jnp.sum(k * k, axis=0)
    else:
        # column slabs (opt-in, DCPT_TPU_MDTA_SLABS): the fat 3C-wide qkv
        # map only ever exists one slab at a time
        lnp = _pad_cols(ln.reshape(hp, w, c))  # (hp, W+2, C) — C-wide, cheap
        g = jnp.zeros((c, c), f32)
        qs = jnp.zeros((c,), f32)
        ks = jnp.zeros((c,), f32)
        for s in range(w // sw):
            xs = lnp[:, s * sw : s * sw + sw + 2]  # static slice, 1-col halos
            t = jnp.dot(xs.reshape(hp * (sw + 2), c), wqkv_ref[:].astype(f32),
                        preferred_element_type=f32).reshape(hp, sw + 2, 3 * c)
            qkv = _dwconv3x3(t, wdwq_ref[:].astype(f32), valid)[1 : th + 1, 1 : sw + 1]
            q = qkv[:, :, :c].reshape(th * sw, c)
            k = qkv[:, :, c : 2 * c].reshape(th * sw, c)
            v_ref[0, :, s * sw : (s + 1) * sw, :] = qkv[:, :, 2 * c :].astype(v_ref.dtype)
            g = g + jax.lax.dot_general(q, k, (((0,), (0,)), ((), ())), preferred_element_type=f32)
            qs = qs + jnp.sum(q * q, axis=0)
            ks = ks + jnp.sum(k * k, axis=0)

    qs = jnp.broadcast_to(qs[None], (8, c))
    ks = jnp.broadcast_to(ks[None], (8, c))

    @pl.when(it == 0)
    def _init():
        gram_ref[0] = g
        qn2_ref[0] = qs
        kn2_ref[0] = ks

    @pl.when(it > 0)
    def _acc():
        gram_ref[0] += g
        qn2_ref[0] += qs
        kn2_ref[0] += ks


def _p2_kernel(x_ref, xh_ref, v_ref, vh_ref, attn_ref, wproj_ref,
               n2w_ref, n2b_ref, win_ref, wdwf_ref, wout_ref, z_ref, *,
               eps: float, ln_bias: bool, th: int, sw: int):
    f32 = jnp.float32
    it = pl.program_id(1)
    n_t = pl.num_programs(1)
    x = x_ref[0].astype(f32)
    _, w, c = x.shape
    hp = th + 2
    xwin = jnp.concatenate([xh_ref[0, 0, 0:1].astype(f32), x, xh_ref[0, 0, 1:2].astype(f32)], axis=0)
    vwin = jnp.concatenate(
        [vh_ref[0, 0, 0:1].astype(f32), v_ref[0].astype(f32), vh_ref[0, 0, 1:2].astype(f32)], axis=0)

    # attention application + projection for the whole window (halo rows of
    # y feed the GDFN dwconv) — all C-wide and MXU-dense, VMEM-cheap
    out = jax.lax.dot_general(vwin.reshape(hp * w, c), attn_ref[0].astype(f32),
                              (((1,), (1,)), ((), ())), preferred_element_type=f32)
    y = xwin.reshape(hp * w, c) + jnp.dot(out, wproj_ref[:].astype(f32), preferred_element_type=f32)

    ln2 = _ln_channel(y, n2w_ref[0].astype(f32), n2b_ref[0].astype(f32), eps, ln_bias)
    f2 = win_ref.shape[1] // 2
    row = jax.lax.broadcasted_iota(jnp.int32, (hp, 1, 1), 0)
    valid = ~(((row == 0) & (it == 0)) | ((row == hp - 1) & (it == n_t - 1)))
    if sw == w:
        # full-width fast path, GDFN gate halves as two sequential F-wide
        # passes (depthwise conv is channel-independent — see _p1_kernel)
        def _proj_dw(lo, hi):
            t = jnp.dot(ln2, win_ref[:, lo:hi].astype(f32), preferred_element_type=f32)
            return _dwconv3x3(t.reshape(hp, w, hi - lo),
                              wdwf_ref[:, :, lo:hi].astype(f32), valid)[1 : th + 1]

        ta = _proj_dw(0, f2).reshape(th * w, f2)
        tb = _proj_dw(f2, 2 * f2).reshape(th * w, f2)
        gated = _gelu_exact(ta) * tb
        out2 = jnp.dot(gated, wout_ref[:].astype(f32), preferred_element_type=f32)
        z = y.reshape(hp, w, c)[1 : th + 1].reshape(th * w, c) + out2
        z_ref[0] = z.reshape(th, w, c).astype(z_ref.dtype)
    else:
        # column slabs (opt-in): the fat 2F-wide GDFN map only ever exists
        # one slab at a time
        lnp = _pad_cols(ln2.reshape(hp, w, c))
        yin = y.reshape(hp, w, c)
        for s in range(w // sw):
            ys = lnp[:, s * sw : s * sw + sw + 2]
            t2 = jnp.dot(ys.reshape(hp * (sw + 2), c), win_ref[:].astype(f32),
                         preferred_element_type=f32).reshape(hp, sw + 2, 2 * f2)
            t2 = _dwconv3x3(t2, wdwf_ref[:].astype(f32), valid)[1 : th + 1, 1 : sw + 1]
            t2 = t2.reshape(th * sw, 2 * f2)
            gated = _gelu_exact(t2[:, :f2]) * t2[:, f2:]
            out2 = jnp.dot(gated, wout_ref[:].astype(f32), preferred_element_type=f32)
            z = yin[1 : th + 1, s * sw : (s + 1) * sw].reshape(th * sw, c) + out2
            z_ref[0, :, s * sw : (s + 1) * sw, :] = z.reshape(th, sw, c).astype(z_ref.dtype)


def pick_tiles(h: int, w: int, c: int, f2: int) -> tuple[int, int] | None:
    """(row tile, column slab) for the two-phase kernel.

    Default: the full-width rule below, restricted to the measured-winner
    region — matching shapes get the A/B-measured tilings, everything else
    returns None (XLA path).  With DCPT_TPU_MDTA_SLABS=1 the measured-loser
    big-shape region opens up: th=4 full width, then column slabs (C-wide
    arrays full-width resident, fat temporaries budgeted at slab width,
    row tile any divisor of h)."""
    lane = lambda d: -(-d // 128) * 128  # noqa: E731
    # Real v5e scoped-vmem limit is 16 MB.  The fat dot+dwconv maps are
    # channel-chunked in the kernels (q/k/v and the two GDFN halves each a
    # separate C- or F-wide pass — the dwconv shift pipeline holds ~4 live
    # copies of ONE chunk, never the 3C/2F map; the monolithic variant's
    # unbudgeted shift copies OOMed the compiler at 16.45M/16M on scheduling
    # luck).  5×lane(max(c,F)) covers the 4 shift copies + one retained
    # chunk; 10.5 MB budget keeps the worst observed estimate-error clear of
    # the cliff and reproduces the A/B-measured tilings (th=8,16,16,16 at
    # the 128px levels).
    budget = int(10.5 * 1024 * 1024)
    per_row = 4 * w * (6 * lane(c) + 5 * lane(max(c, f2)))
    # th ≥ 8 is the measured-WINNER region (the 2.1×/1.7× 128px-class
    # configs, ≤20% halo overhead).  th=4 full-width and the column slabs
    # below reach the big eval geometries (256/384px tiles, 488×328 whole
    # images) but MEASURED SLOWER than XLA there (PARITY "MDTA big-shape
    # A/B": 256px th=4 0.90×/0.76× fp32/bf16; 488×328 slabs 0.72×/0.52×;
    # 384px slabs 0.94×) — tiny row tiles pay 33–50% halo overhead and the
    # lane-padded C-wide residents dominate traffic, while XLA streams the
    # whole image with no halo recompute.  DCPT_TPU_MDTA_SLABS=1 opts the
    # losing region in for future tuning / re-measurement.
    opt_in = _os.environ.get("DCPT_TPU_MDTA_SLABS", "0") == "1"
    for th in (64, 32, 16, 8) + ((4,) if opt_in else ()):
        if h % th == 0 and (th + 2) * per_row <= budget:
            return th, w
    if not opt_in:
        return None
    budget = 10 * 1024 * 1024
    fat = 2 * max(2 * lane(2 * f2), lane(3 * c))
    ths = [t for t in (64, 32, 16, 8, 4, 2, 1) if h % t == 0]  # 1 divides all h
    sws = [s for s in (512, 256, 128, 64, 32) if s < w and w % s == 0] or [
        s for s in range(min(w - 1, 512), 15, -1) if w % s == 0]
    for th in ths:
        cwide = 4 * (th + 2) * (w + 2) * 8 * lane(c)
        if cwide >= budget:
            continue
        for sw in sws:
            if cwide + 4 * (th + 2) * (sw + 2) * fat <= budget:
                return th, sw
    return None


def _block_pallas(x, n1w, n1b, wqkv, wdwq, temperature, wproj,
                  n2w, n2b, win_, wdwf, wout,
                  heads, use_softmax, ln_bias, eps, th, interpret, sw=None,
                  with_res: bool = False):
    b, h, w, c = x.shape
    f2 = win_.shape[1] // 2
    n_t = h // th
    sw = w if sw is None else sw
    halo = _halo_pairs(x, th, n_t)

    xspec = pl.BlockSpec((1, th, w, c), lambda bb, tt: (bb, tt, 0, 0), memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec((1, 1, 2, w, c), lambda bb, tt: (bb, tt, 0, 0, 0), memory_space=pltpu.VMEM)
    cst = lambda shape: pl.BlockSpec(shape, lambda bb, tt: (0,) * len(shape), memory_space=pltpu.VMEM)  # noqa: E731
    acc = lambda shape: pl.BlockSpec(shape, lambda bb, tt: (bb,) + (0,) * (len(shape) - 1), memory_space=pltpu.VMEM)  # noqa: E731

    v, gram, qn2, kn2 = pl.pallas_call(
        functools.partial(_p1_kernel, eps=eps, ln_bias=ln_bias, th=th, sw=sw),
        grid=(b, n_t),
        in_specs=[xspec, hspec, cst((1, c)), cst((1, c)), cst((c, 3 * c)), cst((3, 3, 3 * c))],
        out_specs=[xspec, acc((1, c, c)), acc((1, 8, c)), acc((1, 8, c))],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
            jax.ShapeDtypeStruct((b, c, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, c), jnp.float32),
        ],
        interpret=interpret,
    )(x, halo, n1w[None], n1b[None], wqkv, wdwq)

    attn = _attn_from_stats(gram, qn2[:, 0], kn2[:, 0], temperature, heads, use_softmax)
    vhalo = _halo_pairs(v, th, n_t)

    z = pl.pallas_call(
        functools.partial(_p2_kernel, eps=eps, ln_bias=ln_bias, th=th, sw=sw),
        grid=(b, n_t),
        in_specs=[xspec, hspec, xspec, hspec, acc((1, c, c)), cst((c, c)),
                  cst((1, c)), cst((1, c)), cst((c, 2 * f2)), cst((3, 3, 2 * f2)), cst((f2, c))],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        interpret=interpret,
    )(x, halo, v, vhalo, attn, wproj, n2w[None], n2b[None], win_, wdwf, wout)
    if with_res:
        # attention residuals for the analytic backward (mdta_block_bwd.py):
        # post-dwconv v (already an HBM output of P1), the raw Gram + squared
        # norms (the L2-norm backward is host C×C math), and the attention
        # micro-matrix itself.
        return z, v, gram, qn2[:, 0], kn2[:, 0], attn
    return z


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15, 16, 17, 18))
def mdta_block_fused(x, n1w, n1b, wqkv, wdwq, temperature, wproj,
                     n2w, n2b, win_, wdwf, wout,
                     heads: int, use_softmax: bool, ln_bias: bool,
                     eps: float = 1e-6, th: int = 16, interpret: bool = False,
                     sw: int | None = None):
    """The whole TransformerBlock over (B, H, W, C); requires H % th == 0
    (and W % sw == 0 when a column slab is given)."""
    return _block_pallas(x, n1w, n1b, wqkv, wdwq, temperature, wproj,
                         n2w, n2b, win_, wdwf, wout,
                         heads, use_softmax, ln_bias, eps, th, interpret, sw)


def _analytic_bwd_enabled(dtype) -> bool:
    """DCPT_TPU_MDTA_BWD tri-state (mirrors DCPT_TPU_NAF_BWD, naf_block.py):
    "1" routes differentiated traces through the fused forward + the
    hand-derived two-pass Pallas backward (mdta_block_bwd.py) for both
    dtypes, "0" forces twin delegation, unset = measured-winner policy.
    Read at trace time so A/B harnesses can flip it."""
    mode = _os.environ.get("DCPT_TPU_MDTA_BWD", "auto")
    if mode == "1":
        return True
    if mode == "0":
        return False
    # auto: measured winner in BOTH precisions on the DCPT Restormer train
    # step (scripts/bench_mdta_bwd.py, v5e bs8 @128px, interleaved-min ×2,
    # 8 steps scanned per dispatch): fp32 373.4→325.5 ms (1.147×), mixed
    # 258.4→231.4 ms (1.117×).  Geometries the bwd tile picker rejects
    # still delegate per-block, so this is safe at any shape.
    return True


def _fwd(x, n1w, n1b, wqkv, wdwq, temperature, wproj, n2w, n2b, win_, wdwf, wout,
         heads, use_softmax, ln_bias, eps, th, interpret, sw):
    # Differentiated path, twin delegation (default): skip the kernel
    # ENTIRELY and hand XLA the jnp twin, so a train step compiles to exactly
    # the autodiff graph it would have without the kernel (running the kernel
    # forward + recomputing the twin in _bwd is the measured 1.86× NAF
    # regression — see naf_block.py).  Primal-only traces — inference —
    # never enter _fwd and keep the fused kernel.
    #
    # DCPT_TPU_MDTA_BWD=1 (or the measured auto policy): fused forward +
    # analytic Pallas backward — no twin in the graph at all (full-width
    # geometries the bwd tile picker accepts).
    if _analytic_bwd_enabled(x.dtype) and (sw is None or sw == x.shape[2]):
        from .mdta_block_bwd import pick_bwd_tile

        bth = pick_bwd_tile(x.shape[1], x.shape[2], x.shape[3], win_.shape[1] // 2)
        if bth is not None:
            z, v, gram, qn2, kn2, attn = _block_pallas(
                x, n1w, n1b, wqkv, wdwq, temperature, wproj,
                n2w, n2b, win_, wdwf, wout,
                heads, use_softmax, ln_bias, eps, th, interpret, sw, with_res=True)
            res = (x, n1w, n1b, wqkv, wdwq, temperature, wproj, n2w, n2b,
                   win_, wdwf, wout, v, gram, qn2, kn2, attn)
            return z, res
    out, vjp = jax.vjp(
        lambda *a: mdta_block_ref(*a, heads, use_softmax, ln_bias, eps),
        x, n1w, n1b, wqkv, wdwq, temperature, wproj, n2w, n2b, win_, wdwf, wout)
    return out, vjp


def _bwd(heads, use_softmax, ln_bias, eps, th, interpret, sw, res, g):
    if isinstance(res, tuple):
        from .mdta_block_bwd import mdta_block_bwd, pick_bwd_tile

        x, win_w = res[0], res[9]
        bth = pick_bwd_tile(x.shape[1], x.shape[2], x.shape[3], win_w.shape[1] // 2)
        return mdta_block_bwd(*res, g, heads, use_softmax, ln_bias, eps, bth, interpret)
    return res(g)


mdta_block_fused.defvjp(_fwd, _bwd)
