"""Fused window self-attention for SwinIR — qkv → scores → softmax → PV → proj
in one kernel per window tile.

SURVEY §7 "hard parts" flags SwinIR as small-matmul-bound: each 8×8 window is a
64-token attention whose six XLA ops (qkv matmul, reshape, scores, softmax, PV,
proj) each round-trip HBM.  This kernel keeps a tile of windows resident in
VMEM with the weights grid-resident, emitting only the final output.

Lane-alignment design (v2): the shipped SwinIR has ``embed_dim=180`` with six
30-dim heads — neither the channel axis nor the head stride is a multiple of
the 128-lane VPU width, so the v1 layout (one fused ``(C, 3C)`` qkv weight +
per-head lane *slices* at offsets 30·h) forced Mosaic lane shuffles on every
head.  v2 avoids unaligned lane movement entirely:

* q, k, v come from three separate ``(C, C)`` projections (the fused weight is
  split once at trace time — free, outside the kernel);
* each head's scores are computed by *masking* q and v over the (padded) lane
  axis with an iota predicate and contracting over the FULL channel axis —
  ``(q ⊙ m_h) @ k^T == q_h @ k_h^T`` exactly, because the zeroed lanes
  annihilate k's other heads.  Outputs accumulate in place (the masks
  partition the lanes), so the per-head concat is free too.

Heads are unrolled (static, small); the per-tile batch runs as batched
``dot_general`` on the MXU.  Backward recomputes via the jnp reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .erf_gelu import gelu_exact


def window_attention_ref(x, wqkv, bqkv, wproj, bproj, num_heads: int, ln: tuple | None = None):
    """jnp reference: x (NW, N, C) windows; ``ln`` = optional (weight, bias,
    eps) pre-LayerNorm folded in (per-token, so it commutes with the window
    partition)."""
    nw, n, c = x.shape
    hd = c // num_heads
    scale = hd**-0.5
    if ln is not None:
        # statistics in fp32 under mixed precision (== archs TorchLayerNorm;
        # this twin IS the bf16 train-step graph via the custom-VJP delegation)
        ln_w, ln_b, eps = ln
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        x = ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * ln_w + ln_b
    qkv = x @ wqkv + bqkv  # (nw, n, 3c)
    qkv = qkv.reshape(nw, n, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = jax.nn.softmax(jnp.einsum("whnd,whmd->whnm", q * scale, k), axis=-1)
    out = jnp.einsum("whnm,whmd->whnd", attn, v).transpose(0, 2, 1, 3).reshape(nw, n, c)
    return out @ wproj + bproj


def _kernel(
    x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref, wproj_ref, bproj_ref, lnw_ref, lnb_ref, out_ref,
    *, num_heads: int, ln_eps: float | None,
):
    t, n, c = x_ref.shape
    hd = c // num_heads
    scale = hd**-0.5
    # bf16 inputs: upcast at the VMEM load so every intermediate stays fp32 —
    # HBM traffic is bf16 (the bandwidth win) while the in-register math never
    # touches bf16 layouts (round-2's bf16 kernel kept bf16 intermediates and
    # lost 3× to Mosaic bf16↔fp32 relayouts of the masked-head blocks)
    x = x_ref[:].astype(jnp.float32).reshape(t * n, c)
    if ln_eps is not None:
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        x = (x - mu) * jax.lax.rsqrt(var + ln_eps) * lnw_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    q = (jnp.dot(x, wq_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32) + bq_ref[0].astype(jnp.float32)) * scale
    k = jnp.dot(x, wk_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32) + bk_ref[0].astype(jnp.float32)
    v = jnp.dot(x, wv_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32) + bv_ref[0].astype(jnp.float32)
    q = q.reshape(t, n, c)
    k = k.reshape(t, n, c)
    v = v.reshape(t, n, c)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c), 2)
    acc = jnp.zeros((t, n, c), jnp.float32)
    for h in range(num_heads):
        mask = ((lane >= h * hd) & (lane < (h + 1) * hd)).astype(jnp.float32)
        scores = jax.lax.dot_general(
            q * mask, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        attn = jax.nn.softmax(scores, axis=-1)
        acc = acc + jax.lax.dot_general(
            attn, v * mask, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    out = jnp.dot(acc.reshape(t * n, c), wproj_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)
    out_ref[:] = (out + bproj_ref[0].astype(jnp.float32)).reshape(t, n, c).astype(out_ref.dtype)


def _pick_tile(nw: int, n: int, c: int) -> int:
    # ~9 live (t, n, c)-sized fp32 buffers (x, q, k, v, acc, per-head masked
    # temps, scores) must fit the ~16 MB scoped-VMEM stack; keep them ≤ 10 MB.
    c_pad = -(-c // 128) * 128
    budget = 10 * 1024 * 1024 // 9
    for t in (64, 32, 16, 8, 4, 2, 1):
        if nw % t == 0 and t * n * c_pad * 4 <= budget:
            return t
    return 1


def _wa_pallas(x, wqkv, bqkv, wproj, bproj, num_heads, interpret, ln=None):
    nw, n, c = x.shape
    t = _pick_tile(nw, n, c)
    wq, wk, wv = wqkv[:, :c], wqkv[:, c : 2 * c], wqkv[:, 2 * c :]
    bq, bk, bv = bqkv[:c][None], bqkv[c : 2 * c][None], bqkv[2 * c :][None]
    if ln is None:
        ln_w, ln_b, ln_eps = jnp.ones((c,), x.dtype), jnp.zeros((c,), x.dtype), None
    else:
        ln_w, ln_b, ln_eps = ln
    wspec = pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, ln_eps=ln_eps),
        grid=(nw // t,),
        in_specs=[
            pl.BlockSpec((t, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            wspec, wspec, wspec, bspec, bspec, bspec, wspec, bspec, bspec, bspec,
        ],
        out_specs=pl.BlockSpec((t, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw, n, c), x.dtype),
        interpret=interpret,
    )(x, wq, wk, wv, bq, bk, bv, wproj, bproj[None], ln_w[None], ln_b[None])


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_window_attention(x, wqkv, bqkv, wproj, bproj, num_heads: int, interpret: bool = False):
    """Fused W-MSA over (NW, N, C) windows (no rel-pos bias, per the modified
    reference SwinIR).  Requires only ``C % num_heads == 0`` — lane alignment
    is handled inside (see module docstring)."""
    return _wa_pallas(x, wqkv, bqkv, wproj, bproj, num_heads, interpret)


def _fwd(x, wqkv, bqkv, wproj, bproj, num_heads, interpret):
    # Differentiated path: hand XLA the jnp twin outright — kernel forward +
    # twin recompute in _bwd measured 1.86× slower on a real train step
    # (PARITY "NAFNet kernel A/B (round 3)"); inference never enters _fwd.
    out, vjp = jax.vjp(lambda *a: window_attention_ref(*a, num_heads), x, wqkv, bqkv, wproj, bproj)
    return out, vjp


def _bwd(num_heads, interpret, vjp, g):
    return vjp(g)


fused_window_attention.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_window_attention_ln(x, ln_w, ln_b, wqkv, bqkv, wproj, bproj, num_heads: int,
                              ln_eps: float = 1e-5, interpret: bool = False):
    """As :func:`fused_window_attention` with the pre-attention LayerNorm
    (torch semantics, per-token) folded into the same VMEM pass — saves one
    full feature-map read+write per SwinTransformerBlock."""
    return _wa_pallas(x, wqkv, bqkv, wproj, bproj, num_heads, interpret, ln=(ln_w, ln_b, ln_eps))


def _fwd_ln(x, ln_w, ln_b, wqkv, bqkv, wproj, bproj, num_heads, ln_eps, interpret):
    out, vjp = jax.vjp(
        lambda x, lw, lb, wqkv, bqkv, wproj, bproj: window_attention_ref(
            x, wqkv, bqkv, wproj, bproj, num_heads, ln=(lw, lb, ln_eps)
        ),
        x, ln_w, ln_b, wqkv, bqkv, wproj, bproj,
    )
    return out, vjp


def _bwd_ln(num_heads, ln_eps, interpret, vjp, g):
    return vjp(g)


fused_window_attention_ln.defvjp(_fwd_ln, _bwd_ln)


# ---------------------------------------------------------------------------
# v3: whole-SwinTransformerBlock kernel — x + attn(LN1(x)) + MLP(LN2(·)) in
# one VMEM pass per window tile.
#
# Every op between window partition and reverse is per-token (LNs, residual
# adds, MLP) or window-local (attention), and rolls/partitions are pure
# permutations, so the block's BOTH residual branches can run in window
# coordinates: the kernel reads each x tile once and writes the final block
# output once, where the attention-only kernel still materialised the
# attention output, the residual sum and the MLP intermediates in HBM.
# bf16 I/O upcasts at the load like the v2 kernel.
# ---------------------------------------------------------------------------


def swin_block_ref(x, ln1_w, ln1_b, wqkv, bqkv, wproj, bproj, ln2_w, ln2_b,
                   wfc1, bfc1, wfc2, bfc2, num_heads: int, eps: float = 1e-5):
    """jnp twin over (NW, N, C) windows of the ROLLED raw feature map."""
    def ln(t, w, b):
        # fp32 statistics (== archs TorchLayerNorm; this twin IS the bf16
        # train-step graph via the custom-VJP delegation)
        tf = t.astype(jnp.float32)
        mu = jnp.mean(tf, axis=-1, keepdims=True)
        var = jnp.mean((tf - mu) ** 2, axis=-1, keepdims=True)
        return ((tf - mu) * jax.lax.rsqrt(var + eps)).astype(t.dtype) * w + b

    attn = window_attention_ref(ln(x, ln1_w, ln1_b), wqkv, bqkv, wproj, bproj, num_heads)
    y = x + attn
    h = jax.nn.gelu(ln(y, ln2_w, ln2_b) @ wfc1 + bfc1, approximate=False)
    return y + h @ wfc2 + bfc2


def _block_kernel(
    x_ref, l1w_ref, l1b_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
    wproj_ref, bproj_ref, l2w_ref, l2b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
    out_ref, *, num_heads: int, eps: float,
):
    t, n, c = x_ref.shape
    hd = c // num_heads
    scale = hd**-0.5
    f32 = jnp.float32
    x = x_ref[:].astype(f32).reshape(t * n, c)

    def ln(tns, w_ref, b_ref):
        mu = jnp.mean(tns, axis=-1, keepdims=True)
        var = jnp.mean((tns - mu) ** 2, axis=-1, keepdims=True)
        return (tns - mu) * jax.lax.rsqrt(var + eps) * w_ref[0].astype(f32) + b_ref[0].astype(f32)

    xn = ln(x, l1w_ref, l1b_ref)
    q = (jnp.dot(xn, wq_ref[:].astype(f32), preferred_element_type=f32) + bq_ref[0].astype(f32)) * scale
    k = jnp.dot(xn, wk_ref[:].astype(f32), preferred_element_type=f32) + bk_ref[0].astype(f32)
    v = jnp.dot(xn, wv_ref[:].astype(f32), preferred_element_type=f32) + bv_ref[0].astype(f32)
    q = q.reshape(t, n, c)
    k = k.reshape(t, n, c)
    v = v.reshape(t, n, c)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c), 2)
    acc = jnp.zeros((t, n, c), f32)
    for h in range(num_heads):
        mask = ((lane >= h * hd) & (lane < (h + 1) * hd)).astype(f32)
        scores = jax.lax.dot_general(
            q * mask, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))), preferred_element_type=f32)
        attn = jax.nn.softmax(scores, axis=-1)
        acc = acc + jax.lax.dot_general(
            attn, v * mask, dimension_numbers=(((2,), (1,)), ((0,), (0,))), preferred_element_type=f32)

    y = x + jnp.dot(acc.reshape(t * n, c), wproj_ref[:].astype(f32), preferred_element_type=f32) \
        + bproj_ref[0].astype(f32)
    yn = ln(y, l2w_ref, l2b_ref)
    hmid = jnp.dot(yn, wfc1_ref[:].astype(f32), preferred_element_type=f32) + bfc1_ref[0].astype(f32)
    hmid = gelu_exact(hmid)  # exact-erf GELU, Pallas-lowerable (erf_gelu.py)
    z = y + jnp.dot(hmid, wfc2_ref[:].astype(f32), preferred_element_type=f32) + bfc2_ref[0].astype(f32)
    out_ref[:] = z.reshape(t, n, c).astype(out_ref.dtype)


def _pick_tile_block(nw: int, n: int, c: int, hidden: int) -> int:
    # live fp32 buffers per instance: x/xn/q/k/v/acc/y/yn/z (≈9 × (t,n,c_pad))
    # + the MLP hidden (t, n, hid_pad); weights are grid-resident
    c_pad = -(-c // 128) * 128
    hid_pad = -(-hidden // 128) * 128
    per_row = 4 * n * (9 * c_pad + hid_pad)
    budget = 10 * 1024 * 1024
    for t in (64, 32, 16, 8, 4, 2, 1):
        if nw % t == 0 and t * per_row <= budget:
            return t
    return 1


def _swin_block_pallas(x, ln1_w, ln1_b, wqkv, bqkv, wproj, bproj, ln2_w, ln2_b,
                       wfc1, bfc1, wfc2, bfc2, num_heads, eps, interpret):
    nw, n, c = x.shape
    hidden = wfc1.shape[1]
    t = _pick_tile_block(nw, n, c, hidden)
    wq, wk, wv = wqkv[:, :c], wqkv[:, c : 2 * c], wqkv[:, 2 * c :]
    bq, bk, bv = bqkv[:c][None], bqkv[c : 2 * c][None], bqkv[2 * c :][None]
    cspec = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_block_kernel, num_heads=num_heads, eps=eps),
        grid=(nw // t,),
        in_specs=[
            pl.BlockSpec((t, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            cspec((1, c)), cspec((1, c)),                       # ln1
            cspec((c, c)), cspec((c, c)), cspec((c, c)),        # wq wk wv
            cspec((1, c)), cspec((1, c)), cspec((1, c)),        # bq bk bv
            cspec((c, c)), cspec((1, c)),                       # proj
            cspec((1, c)), cspec((1, c)),                       # ln2
            cspec((c, hidden)), cspec((1, hidden)),             # fc1
            cspec((hidden, c)), cspec((1, c)),                  # fc2
        ],
        out_specs=pl.BlockSpec((t, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw, n, c), x.dtype),
        interpret=interpret,
    )(x, ln1_w[None], ln1_b[None], wq, wk, wv, bq, bk, bv, wproj, bproj[None],
      ln2_w[None], ln2_b[None], wfc1, bfc1[None], wfc2, bfc2[None])


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15))
def fused_swin_block(x, ln1_w, ln1_b, wqkv, bqkv, wproj, bproj, ln2_w, ln2_b,
                     wfc1, bfc1, wfc2, bfc2, num_heads: int, eps: float = 1e-5,
                     interpret: bool = False):
    """Whole Swin block over (NW, N, C) windows of the rolled RAW map."""
    return _swin_block_pallas(x, ln1_w, ln1_b, wqkv, bqkv, wproj, bproj, ln2_w,
                              ln2_b, wfc1, bfc1, wfc2, bfc2, num_heads, eps, interpret)


def _swin_analytic_bwd_enabled(dtype) -> bool:
    """DCPT_TPU_SWIN_BWD tri-state (mirrors DCPT_TPU_NAF_BWD/MDTA_BWD):
    "1" routes differentiated traces through the fused forward + the analytic
    single-pass Pallas backward (swin_block_bwd.py) for both dtypes, "0"
    forces twin delegation, unset = measured-winner policy.  Read at trace
    time so A/B harnesses can flip it."""
    import os

    mode = os.environ.get("DCPT_TPU_SWIN_BWD", "auto")
    if mode == "1":
        return True
    if mode == "0":
        return False
    # auto: measured winner in BOTH precisions on the DCPT SwinIR train step
    # (scripts/bench_swin_bwd.py, v5e bs8 @128px SwinIR-180 6×6, 4 steps
    # scanned per dispatch, interleaved-min ×2): mixed twin 1004.8 ms →
    # analytic 552.0 ms (1.82×); fp32 twin REPRODUCIBLY fails remote
    # compile (tpu_compile_helper exit 1, twice ~55 min apart — the pure-XLA
    # autodiff graph of 36 blocks is too much for the toolchain) while the
    # analytic program compiles and runs at 704 ms, so in fp32 this is the
    # only path that works at all.  Geometries pick_bwd_tile rejects still
    # delegate per-block to the twin.
    return True


def _fwd_block(x, ln1_w, ln1_b, wqkv, bqkv, wproj, bproj, ln2_w, ln2_b,
               wfc1, bfc1, wfc2, bfc2, num_heads, eps, interpret):
    # Differentiated path, twin delegation by default (see naf_block.py);
    # DCPT_TPU_SWIN_BWD=1 (or the measured auto policy) keeps the fused
    # forward and runs the analytic backward — no twin in the graph.
    if _swin_analytic_bwd_enabled(x.dtype):
        from .swin_block_bwd import pick_bwd_tile

        nw, n, c = x.shape
        tb = pick_bwd_tile(nw, n, c, wfc1.shape[1], num_heads)
        if tb is not None:
            z = _swin_block_pallas(x, ln1_w, ln1_b, wqkv, bqkv, wproj, bproj,
                                   ln2_w, ln2_b, wfc1, bfc1, wfc2, bfc2,
                                   num_heads, eps, interpret)
            return z, (x, ln1_w, ln1_b, wqkv, bqkv, wproj, bproj, ln2_w, ln2_b,
                       wfc1, bfc1, wfc2, bfc2)
    out, vjp = jax.vjp(
        lambda *a: swin_block_ref(*a, num_heads, eps),
        x, ln1_w, ln1_b, wqkv, bqkv, wproj, bproj, ln2_w, ln2_b, wfc1, bfc1, wfc2, bfc2)
    return out, vjp


def _bwd_block(num_heads, eps, interpret, res, g):
    if isinstance(res, tuple):
        from .swin_block_bwd import pick_bwd_tile, swin_block_bwd

        x, wfc1 = res[0], res[9]
        tb = pick_bwd_tile(x.shape[0], x.shape[1], x.shape[2], wfc1.shape[1], num_heads)
        return swin_block_bwd(*res, g, num_heads, eps, tb, interpret)
    return res(g)


fused_swin_block.defvjp(_fwd_block, _bwd_block)
