"""Whole-NAFBlock fusion — two Pallas kernels + one tiny host matmul.

The NAFNet bf16 roofline (PARITY.md) showed the flagship forward pinned at
~89% of HBM peak with the FLOP-dense c=512 stage already at 78% MXU: the
remaining wall-clock lives in the HIGH-RESOLUTION shallow stages, where XLA's
per-op execution traverses each (B, H, W, C)-scale map ~12×/block.  This
module fuses the entire NAFBlock (reference nafnet_arch.py:83-186) into:

  P1  per (batch, row-tile): LN1 → 1×1 expand → depthwise 3×3 → SimpleGate,
      emitting the gated map g ONCE plus per-tile channel sums for SCA;
  --  host: pooled mean → SCA 1×1 (a (B, C)·(C, C) matmul — micro);
  P2  per (batch, row-tile): g·att → 1×1 → β-residual → LN2 → 1×1 expand →
      SimpleGate → 1×1 → γ-residual, emitting the block output ONCE.

SCA's GLOBAL spatial mean is what forces the two-phase split — everything
else is row-local (the dwconv needs one halo row, supplied by pre-tiling the
input with overlapping rows; out-of-image halo rows are masked to zero
inside P1 so the dwconv border matches lax zero padding bit-exactly).

HBM traffic per block falls from ~12 map traversals to ~4 (read x twice,
write g, write z) — and with bf16 I/O (fp32 VMEM math, the round-3 kernel
recipe) the bytes halve again.  Backward recomputes via the jnp reference.

Two implementations, A/B'd on the real chip:

* v1 (``_block_pallas_v1``): pre-stacks overlapping row tiles on the host
  (a (B, n_t, th+2, W, C) copy — one extra read+write of the map) and
  spills the gated map g between P1 and P2.
* v2 (``_block_pallas_v2``, default): the halo is a tiny per-tile side
  input (2 rows/tile, gathered once on the host) so x is read at its
  natural (th, W, C) blocks, and P2 RECOMPUTES the prefix from x instead
  of reading a spilled g — P1 shrinks to a pure channel-sum reduction.
  Traffic ≈ 2 reads of x + 1 write of z (~3 traversals); the doubled
  prefix FLOPs are free at the shallow stages' 11% MFU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .naf_prefix import naf_prefix_ref


def _conv1x1(t, w, b):
    ci, co = w.shape
    return jax.lax.conv_general_dilated(
        t, w.reshape(1, 1, ci, co), (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b


def naf_block_ref(x, n1w, n1b, w1, b1, wdw, bdw, wsca, bsca, w3, b3, beta,
                  n2w, n2b, w4, b4, w5, b5, gamma, eps: float = 1e-6):
    """jnp twin of the full NAFBlock on (B, H, W, C); beta/gamma are (C,).

    Every 1×1 is a CONV, mirroring the module path exactly: differentiated
    traces compile this twin (custom-VJP _fwd delegation), and on v5e a
    dot/einsum producer in front of a grouped dwconv — including a block
    tail feeding the NEXT block's prefix in the chained train graph — falls
    off the ~10× compiler cliff (PARITY "NAFNet kernel A/B (round 2)")."""
    g = naf_prefix_ref(x, n1w, n1b, w1, b1, wdw, bdw, eps)
    pooled = jnp.mean(g, axis=(1, 2), keepdims=True)
    att = _conv1x1(pooled, wsca, bsca)
    u = _conv1x1(g * att, w3, b3)
    y = x + u * beta
    # fp32 LN statistics (== archs LayerNorm2d; this twin is the train graph)
    yf = y.astype(jnp.float32)
    mu = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.mean((yf - mu) ** 2, axis=-1, keepdims=True)
    ln2 = ((yf - mu) * jax.lax.rsqrt(var + eps)).astype(y.dtype) * n2w + n2b
    h = _conv1x1(ln2, w4, b4)
    h1, h2 = jnp.split(h, 2, axis=-1)
    out = _conv1x1(h1 * h2, w5, b5)
    return y + out * gamma


def _shift_rows(t, dy):
    h = t.shape[0]
    zero = jnp.zeros_like(t[:1])
    if dy == 1:
        return jnp.concatenate([zero, t[: h - 1]], axis=0)
    if dy == -1:
        return jnp.concatenate([t[1:], zero], axis=0)
    return t


def _shift_cols(t, dx):
    w = t.shape[1]
    zero = jnp.zeros_like(t[:, :1])
    if dx == 1:
        return jnp.concatenate([zero, t[:, : w - 1]], axis=1)
    if dx == -1:
        return jnp.concatenate([t[:, 1:], zero], axis=1)
    return t


def _p1_kernel(x_ref, lnw_ref, lnb_ref, w1_ref, b1_ref, wdw_ref, bdw_ref,
               g_ref, s_ref, *, eps: float, th: int):
    """v1 phase 1: the shared prefix on an overlapped (1, 1, th+2, W, C)
    input block, spilling the gated map (v2 instead recomputes it in P2)."""
    f32 = jnp.float32
    it = pl.program_id(1)
    n_t = pl.num_programs(1)
    g = _prefix_tile(x_ref[0, 0].astype(f32), lnw_ref[0].astype(f32), lnb_ref[0].astype(f32),
                     w1_ref[:].astype(f32), b1_ref[0].astype(f32),
                     wdw_ref[:].astype(f32), bdw_ref[0].astype(f32), eps, th, it, n_t)
    g_ref[0, 0] = g.astype(g_ref.dtype)
    # (8, d2) block: TPU tiling needs the 2nd-to-last block dim 8-divisible
    s_ref[0, 0] = jnp.broadcast_to(jnp.sum(g, axis=(0, 1))[None], (8, g.shape[-1]))


def _p2_kernel(g_ref, x_ref, att_ref, w3_ref, b3_ref, beta_ref,
               n2w_ref, n2b_ref, w4_ref, b4_ref, w5_ref, b5_ref, gamma_ref,
               z_ref, *, eps: float):
    f32 = jnp.float32
    _, _, th, w, d2 = g_ref.shape
    c = x_ref.shape[-1]
    ffn = w4_ref.shape[1]

    g = g_ref[0, 0].astype(f32).reshape(th * w, d2)
    a = g * att_ref[0, 0].astype(f32)
    u = jnp.dot(a, w3_ref[:].astype(f32), preferred_element_type=f32) + b3_ref[0].astype(f32)
    x = x_ref[0].astype(f32).reshape(th * w, c)
    y = x + u * beta_ref[0].astype(f32)

    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
    ln2 = (y - mu) * jax.lax.rsqrt(var + eps) * n2w_ref[0].astype(f32) + n2b_ref[0].astype(f32)
    h = jnp.dot(ln2, w4_ref[:].astype(f32), preferred_element_type=f32) + b4_ref[0].astype(f32)
    hg = h[:, : ffn // 2] * h[:, ffn // 2 :]
    out = jnp.dot(hg, w5_ref[:].astype(f32), preferred_element_type=f32) + b5_ref[0].astype(f32)
    z_ref[0, 0] = (y + out * gamma_ref[0].astype(f32)).reshape(th, w, c).astype(z_ref.dtype)


def pick_row_tile(h: int, w: int, c: int) -> int | None:
    """Largest row tile whose P1 live set (~6 (th+2, W, 2C) fp32 maps) fits
    ~12 MB of scoped VMEM; None if no divisor of H fits."""
    per_row = 4 * w * (2 * c) * 6
    budget = 12 * 1024 * 1024
    for th in (64, 32, 16, 8, 4):
        if h % th == 0 and (th + 2) * per_row <= budget:
            return th
    return None


def _block_pallas_v1(x, n1w, n1b, w1, b1, wdw, bdw, wsca, bsca, w3, b3, beta,
                     n2w, n2b, w4, b4, w5, b5, gamma, eps, th, interpret,
                     with_res: bool = False):
    b, h, w, c = x.shape
    dw = w1.shape[1]
    d2 = dw // 2
    ffn = w4.shape[1]
    n_t = h // th

    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    tiles = jnp.stack([xp[:, i * th : i * th + th + 2] for i in range(n_t)], 1)

    cst = lambda shape: pl.BlockSpec(shape, lambda bb, tt: (0,) * len(shape), memory_space=pltpu.VMEM)  # noqa: E731
    g, s = pl.pallas_call(
        functools.partial(_p1_kernel, eps=eps, th=th),
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec((1, 1, th + 2, w, c), lambda bb, tt: (bb, tt, 0, 0, 0), memory_space=pltpu.VMEM),
            cst((1, c)), cst((1, c)), cst((c, dw)), cst((1, dw)), cst((3, 3, dw)), cst((1, dw)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, th, w, d2), lambda bb, tt: (bb, tt, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, d2), lambda bb, tt: (bb, tt, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_t, th, w, d2), x.dtype),
            jax.ShapeDtypeStruct((b, n_t, 8, d2), jnp.float32),
        ],
        interpret=interpret,
    )(tiles, n1w[None], n1b[None], w1, b1[None], wdw, bdw[None])

    pooled = jnp.sum(s[:, :, 0], axis=1) / jnp.float32(h * w)  # (B, D2) fp32
    att = pooled @ wsca.astype(jnp.float32) + bsca.astype(jnp.float32)  # (B, D2)
    # 8-row broadcast: TPU tiling needs the 2nd-to-last block dim 8-divisible
    att = jnp.broadcast_to(att[:, None, :], (b, 8, d2))

    z = pl.pallas_call(
        functools.partial(_p2_kernel, eps=eps),
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec((1, 1, th, w, d2), lambda bb, tt: (bb, tt, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w, c), lambda bb, tt: (bb, tt, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, d2), lambda bb, tt: (bb, 0, 0), memory_space=pltpu.VMEM),
            cst((d2, c)), cst((1, c)), cst((1, c)),
            cst((1, c)), cst((1, c)), cst((c, ffn)), cst((1, ffn)),
            cst((ffn // 2, c)), cst((1, c)), cst((1, c)),
        ],
        out_specs=pl.BlockSpec((1, 1, th, w, c), lambda bb, tt: (bb, tt, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_t, th, w, c), x.dtype),
        interpret=interpret,
    )(g, x, att, w3, b3[None], beta[None], n2w[None], n2b[None], w4, b4[None], w5, b5[None], gamma[None])
    z = z.reshape(b, h, w, c)
    if with_res:
        return z, pooled, att[:, 0]  # SCA residuals for the analytic backward
    return z


# ---------------------------------------------------------------------------
# v2: halo-pairs side input + recompute-prefix P2 (module docstring)
# ---------------------------------------------------------------------------


def _prefix_tile(win, lnw, lnb, w1, b1, wdw, bdw, eps, th, it, n_t):
    """Prefix (LN → 1×1 expand → dwconv 3×3 → SimpleGate) on one fp32 row
    window (th+2, W, C) → gated (th, W, C); out-of-image halo rows of the
    expanded map are zeroed so the dwconv border matches lax zero padding."""
    hp, w, c = win.shape
    dw = w1.shape[1]
    x2 = win.reshape(hp * w, c)
    mu = jnp.mean(x2, axis=-1, keepdims=True)
    var = jnp.mean((x2 - mu) ** 2, axis=-1, keepdims=True)
    ln = (x2 - mu) * jax.lax.rsqrt(var + eps) * lnw + lnb
    t = (jnp.dot(ln, w1, preferred_element_type=jnp.float32) + b1).reshape(hp, w, dw)
    row = jax.lax.broadcasted_iota(jnp.int32, (hp, 1, 1), 0)
    valid = ~(((row == 0) & (it == 0)) | ((row == hp - 1) & (it == n_t - 1)))
    t = jnp.where(valid, t, 0.0)
    acc = jnp.broadcast_to(bdw[None, None, :], (hp, w, dw))
    for dy in (-1, 0, 1):
        ty = _shift_rows(t, dy)
        for dx in (-1, 0, 1):
            acc = acc + _shift_cols(ty, dx) * wdw[1 - dy, 1 - dx][None, None, :]
    inner = acc[1 : th + 1]
    return inner[:, :, : dw // 2] * inner[:, :, dw // 2 :]


def _win(x_ref, halo_ref):
    f32 = jnp.float32
    x = x_ref[0].astype(f32)  # (th, W, C)
    top = halo_ref[0, 0, 0:1].astype(f32)
    bot = halo_ref[0, 0, 1:2].astype(f32)
    return x, jnp.concatenate([top, x, bot], axis=0)


def _p1v2_kernel(x_ref, halo_ref, lnw_ref, lnb_ref, w1_ref, b1_ref, wdw_ref,
                 bdw_ref, s_ref, *, eps: float, th: int):
    f32 = jnp.float32
    it = pl.program_id(1)
    n_t = pl.num_programs(1)
    _, win = _win(x_ref, halo_ref)
    g = _prefix_tile(win, lnw_ref[0].astype(f32), lnb_ref[0].astype(f32),
                     w1_ref[:].astype(f32), b1_ref[0].astype(f32),
                     wdw_ref[:].astype(f32), bdw_ref[0].astype(f32), eps, th, it, n_t)
    # (8, d2) block: TPU tiling needs the 2nd-to-last block dim 8-divisible
    s_ref[0, 0] = jnp.broadcast_to(jnp.sum(g, axis=(0, 1))[None], (8, g.shape[-1]))


def _p2v2_kernel(x_ref, halo_ref, att_ref, lnw_ref, lnb_ref, w1_ref, b1_ref,
                 wdw_ref, bdw_ref, w3_ref, b3_ref, beta_ref,
                 n2w_ref, n2b_ref, w4_ref, b4_ref, w5_ref, b5_ref, gamma_ref,
                 z_ref, *, eps: float, th: int):
    f32 = jnp.float32
    it = pl.program_id(1)
    n_t = pl.num_programs(1)
    x, win = _win(x_ref, halo_ref)
    _, w, c = x.shape
    ffn = w4_ref.shape[1]
    g = _prefix_tile(win, lnw_ref[0].astype(f32), lnb_ref[0].astype(f32),
                     w1_ref[:].astype(f32), b1_ref[0].astype(f32),
                     wdw_ref[:].astype(f32), bdw_ref[0].astype(f32), eps, th, it, n_t)
    d2 = g.shape[-1]
    a = g.reshape(th * w, d2) * att_ref[0, 0].astype(f32)
    u = jnp.dot(a, w3_ref[:].astype(f32), preferred_element_type=f32) + b3_ref[0].astype(f32)
    y = x.reshape(th * w, c) + u * beta_ref[0].astype(f32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
    ln2 = (y - mu) * jax.lax.rsqrt(var + eps) * n2w_ref[0].astype(f32) + n2b_ref[0].astype(f32)
    h = jnp.dot(ln2, w4_ref[:].astype(f32), preferred_element_type=f32) + b4_ref[0].astype(f32)
    hg = h[:, : ffn // 2] * h[:, ffn // 2 :]
    out = jnp.dot(hg, w5_ref[:].astype(f32), preferred_element_type=f32) + b5_ref[0].astype(f32)
    z_ref[0] = (y + out * gamma_ref[0].astype(f32)).reshape(th, w, c).astype(z_ref.dtype)


def _halo_pairs(x, th, n_t):
    """Per-tile (top, bottom) halo rows: a (B, n_t, 2, W, C) gather — 2/th of
    the map — replacing v1's full (th+2)-row overlap copy."""
    b, h, w, c = x.shape
    zero = jnp.zeros((b, 1, w, c), x.dtype)
    top = jnp.concatenate([zero, x[:, th - 1 :: th][:, : n_t - 1]], axis=1)
    bot = jnp.concatenate([x[:, th :: th][:, : n_t - 1], zero], axis=1)
    return jnp.stack([top, bot], axis=2)


def _block_pallas_v2(x, n1w, n1b, w1, b1, wdw, bdw, wsca, bsca, w3, b3, beta,
                     n2w, n2b, w4, b4, w5, b5, gamma, eps, th, interpret):
    b, h, w, c = x.shape
    dw = w1.shape[1]
    d2 = dw // 2
    ffn = w4.shape[1]
    n_t = h // th
    halo = _halo_pairs(x, th, n_t)

    xspec = pl.BlockSpec((1, th, w, c), lambda bb, tt: (bb, tt, 0, 0), memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec((1, 1, 2, w, c), lambda bb, tt: (bb, tt, 0, 0, 0), memory_space=pltpu.VMEM)
    cst = lambda shape: pl.BlockSpec(shape, lambda bb, tt: (0,) * len(shape), memory_space=pltpu.VMEM)  # noqa: E731
    pref_specs = [cst((1, c)), cst((1, c)), cst((c, dw)), cst((1, dw)), cst((3, 3, dw)), cst((1, dw))]
    pref_args = (n1w[None], n1b[None], w1, b1[None], wdw, bdw[None])

    s = pl.pallas_call(
        functools.partial(_p1v2_kernel, eps=eps, th=th),
        grid=(b, n_t),
        in_specs=[xspec, hspec] + pref_specs,
        out_specs=pl.BlockSpec((1, 1, 8, d2), lambda bb, tt: (bb, tt, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_t, 8, d2), jnp.float32),
        interpret=interpret,
    )(x, halo, *pref_args)

    pooled = jnp.sum(s[:, :, 0], axis=1) / jnp.float32(h * w)  # (B, D2) fp32
    att = pooled @ wsca.astype(jnp.float32) + bsca.astype(jnp.float32)
    # 8-row broadcast: TPU tiling needs the 2nd-to-last block dim 8-divisible
    att = jnp.broadcast_to(att[:, None, :], (b, 8, d2))

    z = pl.pallas_call(
        functools.partial(_p2v2_kernel, eps=eps, th=th),
        grid=(b, n_t),
        in_specs=[xspec, hspec, pl.BlockSpec((1, 8, d2), lambda bb, tt: (bb, 0, 0), memory_space=pltpu.VMEM)]
        + pref_specs
        + [cst((d2, c)), cst((1, c)), cst((1, c)),
           cst((1, c)), cst((1, c)), cst((c, ffn)), cst((1, ffn)),
           cst((ffn // 2, c)), cst((1, c)), cst((1, c))],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        interpret=interpret,
    )(x, halo, att, *pref_args,
      w3, b3[None], beta[None], n2w[None], n2b[None], w4, b4[None], w5, b5[None], gamma[None])
    return z


def _block_pallas(x, n1w, n1b, w1, b1, wdw, bdw, wsca, bsca, w3, b3, beta,
                  n2w, n2b, w4, b4, w5, b5, gamma, eps, th, interpret):
    impl = _block_pallas_v1 if _VARIANT == "v1" else _block_pallas_v2
    return impl(x, n1w, n1b, w1, b1, wdw, bdw, wsca, bsca, w3, b3, beta,
                n2w, n2b, w4, b4, w5, b5, gamma, eps, th, interpret)


# Measured on-chip (min-of-interleaved ×3, fp32 bs16 all-stage): v1 18.04 vs
# v2 17.61 MPix/s — the overlap-copy+spill variant edges the recompute one
# (the dwconv recompute costs serial VPU time the saved bytes don't buy
# back), so v1 ships; v2 stays selectable for A/B.
_VARIANT = "v1"


@functools.partial(jax.custom_vjp, nondiff_argnums=(19, 20, 21))
def naf_block_fused(x, n1w, n1b, w1, b1, wdw, bdw, wsca, bsca, w3, b3, beta,
                    n2w, n2b, w4, b4, w5, b5, gamma,
                    eps: float = 1e-6, th: int = 16, interpret: bool = False):
    """The whole NAFBlock over (B, H, W, C); requires H % th == 0."""
    return _block_pallas(x, n1w, n1b, w1, b1, wdw, bdw, wsca, bsca, w3, b3, beta,
                         n2w, n2b, w4, b4, w5, b5, gamma, eps, th, interpret)


def _analytic_bwd_enabled(dtype) -> bool:
    """DCPT_TPU_NAF_BWD tri-state: unset/auto routes fp32 differentiated
    traces through the fused forward + the hand-derived Pallas backward
    (naf_block_bwd.py) — the measured 1.102× train-step winner (PARITY
    "Analytic Pallas NAFBlock backward") — while bf16 keeps the twin
    delegation (measured tie, 0.997×).  "1" forces the analytic path for
    both dtypes, "0" forces twin delegation (A/B levers).  Read at trace
    time so harnesses can flip it."""
    import os

    mode = os.environ.get("DCPT_TPU_NAF_BWD", "auto")
    if mode == "1":
        return True
    if mode == "0":
        return False
    return dtype == jnp.float32


def _fwd(x, n1w, n1b, w1, b1, wdw, bdw, wsca, bsca, w3, b3, beta,
         n2w, n2b, w4, b4, w5, b5, gamma, eps, th, interpret):
    # Differentiated path, twin delegation (default): skip the kernel
    # ENTIRELY and hand XLA the jnp twin, so a train step compiles to exactly
    # the autodiff graph it would have without the kernel.  (Running the
    # kernel forward + recomputing the twin in _bwd measured 1.86× slower
    # end-to-end on the DCPT train step — PARITY "NAFNet kernel A/B (round
    # 3)".)  Primal-only traces — inference — never enter _fwd and keep the
    # fused kernel.
    #
    # DCPT_TPU_NAF_BWD auto (round-4 winner): fp32 traces get the fused
    # forward + analytic Pallas backward — no twin in the graph at all
    # (where the bwd tile picker accepts the geometry); bf16 stays on the
    # twin (measured tie).
    if _analytic_bwd_enabled(x.dtype):
        from .naf_block_bwd import pick_bwd_tile

        bh, bw, c = x.shape[1], x.shape[2], x.shape[3]
        bth = pick_bwd_tile(bh, bw, c)
        if bth is not None:
            z, pooled, att = _block_pallas_v1(
                x, n1w, n1b, w1, b1, wdw, bdw, wsca, bsca, w3, b3, beta,
                n2w, n2b, w4, b4, w5, b5, gamma, eps, th, interpret, with_res=True)
            res = (x, n1w, n1b, w1, b1, wdw, bdw, wsca, bsca, w3, b3, beta,
                   n2w, n2b, w4, b4, w5, b5, gamma, pooled, att)
            return z, res
    out, vjp = jax.vjp(
        lambda *a: naf_block_ref(*a, eps),
        x, n1w, n1b, w1, b1, wdw, bdw, wsca, bsca, w3, b3, beta,
        n2w, n2b, w4, b4, w5, b5, gamma)
    return out, vjp


def _bwd(eps, th, interpret, res, gr):
    if isinstance(res, tuple):
        from .naf_block_bwd import naf_block_bwd, pick_bwd_tile

        *primals, pooled, att = res
        x = primals[0]
        bth = pick_bwd_tile(x.shape[1], x.shape[2], x.shape[3])  # static: shapes
        return naf_block_bwd(*primals, pooled, att, gr, eps, bth, interpret)
    return res(gr)


naf_block_fused.defvjp(_fwd, _bwd)
