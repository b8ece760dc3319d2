"""SwinIR — windowed-attention restoration transformer, TPU-native.

Numerically matches the reference (``basicsr/archs/swinir_arch.py``), which is a
*modified* SwinIR: relative-position bias and the shifted-window attention mask
are removed (swinir_arch.py:111-139,163-183,281-317 — all commented out), and
the six RSTBs are split into ``encode_layers`` (ModuleList) + ``decode_layers{i}``
attributes to expose hookable names (swinir_arch.py:912-963).

TPU-first design notes:
* tokens stay NHWC maps; window partition is pure reshape/transpose and the
  cyclic shift is ``jnp.roll`` — XLA fuses these into the attention matmuls
  (the reference's fused CUDA ``window_process`` op reduces to index math here);
* per-window attention is batched (B·nW, N, heads) matmuls on the MXU;
* GELU is exact-erf (torch default).

Reconstruction variants: ``pixelshuffle`` / ``pixelshuffledirect`` /
``nearest+conv`` / plain denoise-residual (swinir_arch.py:1069-1107).
"""

from __future__ import annotations

import math
import re as _re
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import ARCH_REGISTRY
from .arch_util import pixel_shuffle, trunc_normal_init


class TorchLayerNorm(nn.Module):
    """torch nn.LayerNorm semantics: biased variance, eps=1e-5, weight+bias."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        # statistics in fp32 under mixed precision (see arch_util.LayerNorm2d)
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * weight + bias


def _dense(features: int, bias: bool = True, name: str | None = None) -> nn.Dense:
    return nn.Dense(features, use_bias=bias, kernel_init=trunc_normal_init(0.02), name=name)


def _conv3(features: int, name: str) -> nn.Conv:
    return nn.Conv(features, (3, 3), padding=((1, 1), (1, 1)), name=name)


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """(B, H, W, C) → (B·nW, ws·ws, C) (reference: swinir_arch.py:43-57)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(windows: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    """Inverse of :func:`window_partition` (reference: swinir_arch.py:60-76)."""
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


import os as _os

# bf16 routing through the fused kernels (they upcast to fp32 in VMEM, so
# only the HBM traffic is bf16).  Measured WINNER on v5e (bs4@128px,
# min-of-interleaved): attn kernel 0.855 vs XLA-bf16 0.817 MPix/s, and with
# the v3 block kernel 1.430 — so bf16 routing defaults ON
# (scripts/bench_swin_bf16.py; DCPT_TPU_SWIN_BF16=0 opts out).
_SWIN_BF16_KERNEL = _os.environ.get("DCPT_TPU_SWIN_BF16", "1") == "1"
# v3 whole-block kernel (attention + both residuals + MLP in one VMEM pass,
# ops/window_attention.fused_swin_block).  Measured WINNER in both
# precisions (bs4@128px: fp32 1.077 vs 0.666 attn-kernel = 1.62×; bf16 1.430
# vs 0.817 XLA = 1.75×) — defaults ON (DCPT_TPU_SWIN_BLOCK=0 opts out).
_SWIN_BLOCK_KERNEL = _os.environ.get("DCPT_TPU_SWIN_BLOCK", "1") == "1"


def _swin_fused_gate(pallas_on: bool, qkv_bias: bool, qk_scale, c: int, heads: int, dtype) -> bool:
    """Measured on v5e, the fused kernel wins 1.32-1.78x end-to-end in fp32
    — a measured WINNER, so it is on by default on TPU
    (``pallas_winner_enabled``; ``DCPT_TPU_PALLAS=0`` is the kill-switch),
    the analog of the reference's instructed ``BASICSR_JIT=True`` fast path
    (reference README.md:79).  bf16 routing is gated by ``_SWIN_BF16_KERNEL``
    (the round-2 all-bf16 kernel lost 3x to Mosaic relayouts; the round-3
    kernel keeps fp32 register math with bf16 HBM I/O — see PARITY.md)."""
    dtype_ok = dtype == jnp.float32 or (_SWIN_BF16_KERNEL and dtype == jnp.bfloat16)
    return pallas_on and qkv_bias and qk_scale is None and c % heads == 0 and dtype_ok


class _DenseParams(nn.Module):
    din: int
    dout: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", _dense(self.dout).kernel_init, (self.din, self.dout))
        b = self.param("bias", nn.initializers.zeros, (self.dout,))
        return k, b


class _LnParams(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return w, b


class _AttnParams(nn.Module):
    """Param-tree twin of WindowAttention for the whole-block kernel path."""

    c: int

    @nn.compact
    def __call__(self):
        wqkv, bqkv = _DenseParams(self.c, 3 * self.c, name="qkv")()
        wproj, bproj = _DenseParams(self.c, self.c, name="proj")()
        return wqkv, bqkv, wproj, bproj


class _MlpParams(nn.Module):
    """Param-tree twin of SwinMlp for the whole-block kernel path."""

    c: int
    hidden: int

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseParams(self.c, self.hidden, name="fc1")()
        w2, b2 = _DenseParams(self.hidden, self.c, name="fc2")()
        return w1, b1, w2, b2


class WindowAttention(nn.Module):
    """W-MSA without relative position bias (as modified, swinir_arch.py:79-195)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    qk_scale: float | None = None

    @nn.compact
    def __call__(self, x: jax.Array, pre_norm: tuple | None = None) -> jax.Array:
        b_, n, c = x.shape
        heads = self.num_heads
        hd = c // heads
        scale = self.qk_scale or hd**-0.5

        from ..ops import pallas_winner_enabled

        if _swin_fused_gate(pallas_winner_enabled(), self.qkv_bias, self.qk_scale, c, heads, x.dtype):
            # fused (LN+)qkv→softmax→PV→proj kernel (SURVEY §7: SwinIR is
            # small-matmul-bound; one VMEM pass per window tile)
            from ..ops.window_attention import fused_window_attention, fused_window_attention_ln

            wqkv, bqkv = _DenseParams(c, 3 * c, name="qkv")()
            wproj, bproj = _DenseParams(c, c, name="proj")()
            if pre_norm is not None:
                ln_w, ln_b, ln_eps = pre_norm
                return fused_window_attention_ln(x, ln_w, ln_b, wqkv, bqkv, wproj, bproj, heads, ln_eps)
            return fused_window_attention(x, wqkv, bqkv, wproj, bproj, heads)
        assert pre_norm is None  # only the fused path accepts a folded LN

        qkv = _dense(c * 3, self.qkv_bias, "qkv")(x)
        qkv = qkv.reshape(b_, n, 3, heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return _dense(c, True, "proj")(out)


class SwinMlp(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = _dense(self.hidden, True, "fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        return _dense(self.dim, True, "fc2")(x)


def _cp_zero_outer(x: jax.Array, cp: tuple) -> jax.Array:
    """Zero the OUT-OF-IMAGE halo rows on the two end shards.

    The full-image forward zero-pads every 3×3 conv at the global top/bottom
    border; under H-sharding the end shards' outer halos would otherwise feed
    reflect/stale values into those convs.  Re-zeroing before each conv makes
    the sharded convs' border semantics IDENTICAL to the oracle (cheap: one
    iota mask).  Interior shards' halos are real neighbour rows — untouched.
    """
    axis, n, halo = cp
    idx = jax.lax.axis_index(axis)
    ell = x.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (1, ell, 1, 1), 1)
    keep = ((idx != 0) | (row >= halo)) & ((idx != n - 1) | (row < ell - halo))
    return jnp.where(keep, x, jnp.zeros((), x.dtype))


def _cp_roll_h(x: jax.Array, shift: int, axis_name: str, n: int, halo: int) -> jax.Array:
    """EXACT global cyclic roll of the H axis for an H-sharded padded slice.

    Under ``spatial_sharded_apply`` each shard holds global rows
    ``[k·Hn − halo, (k+1)·Hn + halo)``.  A local ``jnp.roll`` reproduces the
    global roll for every interior row EXCEPT the rows whose source wraps
    around the image (the reference SwinIR removed the shifted-window
    attention mask, so its cyclic shift genuinely attends across the
    top↔bottom seam — swinir_arch.py:281-317).  Those rows live on the
    opposite END shard's interior and are fetched with one ``ppermute`` of
    ``|shift|`` rows — making the sharded roll exact, independent of the halo
    machinery's outer-border fill.  Requires ``halo ≥ |shift|``.
    """
    ss = abs(shift)
    hn = x.shape[1] - 2 * halo  # interior rows per shard
    assert halo >= ss, f"cp halo {halo} must cover the window shift {ss}"
    y = jnp.roll(x, shift, axis=1)
    idx = jax.lax.axis_index(axis_name)
    if shift > 0:
        # shard 0's interior rows [halo, halo+ss) are global rows [0, ss) —
        # their roll(+ss) source is the image's bottom rows, owned by the
        # LAST shard's interior tail
        moved = jax.lax.ppermute(x[:, hn + halo - ss : hn + halo], axis_name, [(n - 1, 0)])
        patched = jnp.where(idx == 0, moved, y[:, halo : halo + ss])
        y = jax.lax.dynamic_update_slice_in_dim(y, patched, halo, axis=1)
    else:
        # last shard's interior tail is the image's bottom rows — their
        # roll(−ss) source is the image's top rows, owned by shard 0
        moved = jax.lax.ppermute(x[:, halo : halo + ss], axis_name, [(0, n - 1)])
        patched = jnp.where(idx == n - 1, moved, y[:, halo + hn - ss : halo + hn])
        y = jax.lax.dynamic_update_slice_in_dim(y, patched, halo + hn - ss, axis=1)
    return y


class SwinTransformerBlock(nn.Module):
    """One (S)W-MSA + MLP block over an NHWC map (swinir_arch.py:210-372)."""

    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    # context parallelism: (mesh axis, n shards, halo rows) — H rolls become
    # exact global rolls via _cp_roll_h; everything else in the block is
    # window-local/per-token and needs no collective
    cp: tuple | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        ws, ss = self.window_size, self.shift_size

        from ..ops import pallas_winner_enabled

        if _SWIN_BLOCK_KERNEL and _swin_fused_gate(
            pallas_winner_enabled(), self.qkv_bias, self.qk_scale, c, self.num_heads, x.dtype
        ):
            # v3: the WHOLE block in one kernel — rolls/partition are pure
            # permutations and every op in the block is per-token or
            # window-local, so the shortcut and MLP ride along in window
            # coordinates (one HBM read + one write per block)
            from ..ops.window_attention import fused_swin_block

            ln1_w, ln1_b = _LnParams(c, name="norm1")()
            wqkv, bqkv, wproj, bproj = _AttnParams(c, name="attn")()
            ln2_w, ln2_b = _LnParams(c, name="norm2")()
            wfc1, bfc1, wfc2, bfc2 = _MlpParams(c, int(c * self.mlp_ratio), name="mlp")()

            if ss > 0:
                x = jnp.roll(x, shift=-ss, axis=2)
                if self.cp is not None:
                    axis, n_sh, halo = self.cp
                    x = _cp_roll_h(x, -ss, axis, n_sh, halo)
                else:
                    x = jnp.roll(x, shift=-ss, axis=1)
            zw = fused_swin_block(
                window_partition(x, ws), ln1_w, ln1_b, wqkv, bqkv, wproj, bproj,
                ln2_w, ln2_b, wfc1, bfc1, wfc2, bfc2, self.num_heads,
            )
            z = window_reverse(zw, ws, h, w)
            if ss > 0:
                z = jnp.roll(z, shift=ss, axis=2)
                if self.cp is not None:
                    axis, n_sh, halo = self.cp
                    z = _cp_roll_h(z, ss, axis, n_sh, halo)
                else:
                    z = jnp.roll(z, shift=ss, axis=1)
            return z

        shortcut = x
        # NOTE: the fused shift+partition kernels (ops/window_process.py, the
        # reference's window_process op twin) measured slightly slower than
        # XLA's roll+reshape fusion end-to-end on v5e, so the hot path keeps
        # the XLA composition; the fused *attention* kernel below is gated.
        pre_norm = None
        if _swin_fused_gate(pallas_winner_enabled(), self.qkv_bias, self.qk_scale, c, self.num_heads, x.dtype):
            # fold norm1 into the attention kernel (LN is per-token, so it
            # commutes with roll + window partition); params via holder so the
            # tree matches the module path exactly
            ln_w, ln_b = _LnParams(c, name="norm1")()
            pre_norm = (ln_w, ln_b, 1e-5)
        else:
            x = TorchLayerNorm(c, name="norm1")(x)
        if ss > 0:
            x = jnp.roll(x, shift=-ss, axis=2)
            if self.cp is not None:
                axis, n, halo = self.cp
                x = _cp_roll_h(x, -ss, axis, n, halo)
            else:
                x = jnp.roll(x, shift=-ss, axis=1)
        xw = window_partition(x, ws)
        xw = WindowAttention(c, self.num_heads, self.qkv_bias, self.qk_scale, name="attn")(xw, pre_norm)
        x = window_reverse(xw, ws, h, w)
        if ss > 0:
            x = jnp.roll(x, shift=ss, axis=2)
            if self.cp is not None:
                axis, n, halo = self.cp
                x = _cp_roll_h(x, ss, axis, n, halo)
            else:
                x = jnp.roll(x, shift=ss, axis=1)

        x = shortcut + x
        x = x + SwinMlp(c, int(c * self.mlp_ratio), name="mlp")(TorchLayerNorm(c, name="norm2")(x))
        return x


class RSTB(nn.Module):
    """Residual Swin Transformer Block (swinir_arch.py:545-650): a BasicLayer
    of depth blocks + 3×3 conv, residual around the whole group."""

    dim: int
    input_resolution: tuple[int, int]
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    resi_connection: str = "1conv"
    remat: bool = False
    cp: tuple | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # the reference shrinks the window when the *configured* resolution is
        # small (swinir_arch.py:252-255): static config, not runtime shape
        ws = self.window_size
        res = min(self.input_resolution)
        if res <= ws:
            ws = res
        shortcut = x
        Block = nn.remat(SwinTransformerBlock) if self.remat else SwinTransformerBlock
        for i in range(self.depth):
            ss = 0 if (i % 2 == 0 or res <= self.window_size) else ws // 2
            x = Block(
                self.dim, self.num_heads, ws, ss, self.mlp_ratio, self.qkv_bias, self.qk_scale,
                cp=self.cp, name=f"residual_group_blocks_{i}",
            )(x)
        if self.cp is not None:
            # oracle conv border semantics (zero-pad at the global edges)
            x = _cp_zero_outer(x, self.cp)
            shortcut = _cp_zero_outer(shortcut, self.cp)
        if self.resi_connection == "1conv":
            x = _conv3(self.dim, "conv")(x)
        else:  # 3conv bottleneck
            x = _conv3(self.dim // 4, "conv_0")(x)
            x = nn.leaky_relu(x, 0.2)
            x = nn.Conv(self.dim // 4, (1, 1), name="conv_2")(x)
            x = nn.leaky_relu(x, 0.2)
            if self.cp is not None:
                x = _cp_zero_outer(x, self.cp)
            x = _conv3(self.dim, "conv_4")(x)
        return x + shortcut


@ARCH_REGISTRY.register()
class SwinIR(nn.Module):
    """SwinIR (reference: swinir_arch.py:796-1121)."""

    img_size: int = 128
    patch_size: int = 1
    in_chans: int = 3
    embed_dim: int = 180
    depths: Sequence[int] = (6, 6, 6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6, 6, 6)
    window_size: int = 8
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    ape: bool = False
    patch_norm: bool = True
    upscale: int = 1
    img_range: float = 1.0
    upsampler: str = ""
    resi_connection: str = "1conv"
    # gradient checkpointing: rematerialize each SwinTransformerBlock in the
    # backward pass (param-free option — checkpoints stay interchangeable)
    remat: bool = False
    # context-parallel inference (SURVEY §5.7 extension; same yml surface as
    # NAFNet/Restormer/PromptIR): shard H over cp_axis via
    # parallel.spatial.spatial_sharded_apply with halo=cp_halo.  SwinIR has no
    # global statistics — the sole cross-shard semantics are the shifted
    # windows' CYCLIC rolls (the reference attends across the top↔bottom
    # seam; mask removed, swinir_arch.py:281-317), reproduced exactly with a
    # ppermute wrap exchange (_cp_roll_h).  cp_halo must be a multiple of
    # window_size so the shard-local window grid aligns with the global one,
    # and each shard's interior height (H / cp_shards) must divide by
    # window_size too.  Param-free: checkpoints stay interchangeable.
    cp_axis: str | None = None
    cp_halo: int = 0
    cp_shards: int = 0

    def _cp(self) -> tuple | None:
        if self.cp_axis is None:
            return None
        assert self.cp_halo % self.window_size == 0 and self.cp_halo > 0, (
            "cp_halo must be a positive multiple of window_size (window-grid alignment)")
        assert self.cp_shards > 1, "cp_shards (static mesh-axis size) required with cp_axis"
        return (self.cp_axis, self.cp_shards, self.cp_halo)

    @nn.compact
    def __call__(self, x: jax.Array, skip_tail: bool = False, deterministic: bool = True):
        h_in, w_in = x.shape[1], x.shape[2]
        taps: dict[str, jax.Array] = {}
        embed_dim = self.embed_dim
        num_feat = 64
        num_layers = len(self.depths)
        img_size = (self.img_size, self.img_size) if isinstance(self.img_size, int) else tuple(self.img_size)
        patches_resolution = (img_size[0] // self.patch_size, img_size[1] // self.patch_size)

        cp = self._cp()
        if cp is not None:
            assert self.upscale == 1, "SwinIR cp supports upscale == 1 heads (the shipped 5D config)"

        if self.in_chans == 3:
            mean = jnp.asarray([0.4488, 0.4371, 0.4040], dtype=x.dtype)
        else:
            mean = jnp.zeros((1,), dtype=x.dtype)
        x = (x - mean) * self.img_range
        if cp is not None:
            # out-of-image halo rows become exactly 0 post-normalization, so
            # conv_first's border matches the oracle's zero padding
            x = _cp_zero_outer(x, cp)

        def forward_features(feat):
            f = feat
            if self.patch_norm:
                f = TorchLayerNorm(embed_dim, name="patch_embed_norm")(f)
            if self.ape:
                ape = self.param(
                    "absolute_pos_embed",
                    trunc_normal_init(0.02),
                    (1, patches_resolution[0] * patches_resolution[1], embed_dim),
                )
                f = f + ape.reshape(1, patches_resolution[0], patches_resolution[1], embed_dim)
            for i in range(num_layers // 2):
                f = RSTB(
                    embed_dim, patches_resolution, self.depths[i], self.num_heads[i],
                    self.window_size, self.mlp_ratio, self.qkv_bias, self.qk_scale,
                    self.resi_connection, remat=self.remat, cp=cp, name=f"encode_layers_{i}",
                )(f)
                taps[f"encode_layers.{i}"] = f
            for i in range(num_layers // 2):
                f = RSTB(
                    embed_dim, patches_resolution, self.depths[i + num_layers // 2],
                    self.num_heads[i + num_layers // 2], self.window_size, self.mlp_ratio,
                    self.qkv_bias, self.qk_scale, self.resi_connection, remat=self.remat,
                    cp=cp, name=f"decode_layers_{i}",
                )(f)
                taps[f"decode_layers{i}.residual_group"] = f
            return TorchLayerNorm(embed_dim, name="norm")(f)

        def _z(t):
            return _cp_zero_outer(t, cp) if cp is not None else t

        if self.upsampler == "pixelshuffle":
            x = _conv3(embed_dim, "conv_first")(x)
            x = _conv3(embed_dim, "conv_after_body")(_z(forward_features(x))) + x
            if skip_tail:
                return None, taps
            x = nn.leaky_relu(_conv3(num_feat, "conv_before_upsample_0")(_z(x)), 0.01)
            for i in range(int(math.log2(self.upscale))):
                x = _conv3(4 * num_feat, f"upsample_conv{i}")(x)
                x = pixel_shuffle(x, 2)
            x = _conv3(self.in_chans, "conv_last")(_z(x))
        elif self.upsampler == "pixelshuffledirect":
            x = _conv3(embed_dim, "conv_first")(x)
            x = _conv3(embed_dim, "conv_after_body")(_z(forward_features(x))) + x
            if skip_tail:
                return None, taps
            x = _conv3((self.upscale**2) * self.in_chans, "upsample_conv0")(_z(x))
            x = pixel_shuffle(x, self.upscale)
        elif self.upsampler == "nearest+conv":
            x = _conv3(embed_dim, "conv_first")(x)
            x = _conv3(embed_dim, "conv_after_body")(_z(forward_features(x))) + x
            if skip_tail:
                return None, taps
            x = nn.leaky_relu(_conv3(num_feat, "conv_before_upsample_0")(x), 0.01)
            b, hh, ww, cc = x.shape
            x = jax.image.resize(x, (b, hh * 2, ww * 2, cc), method="nearest")
            x = nn.leaky_relu(_conv3(num_feat, "conv_up1")(x), 0.2)
            if self.upscale == 4:
                b, hh, ww, cc = x.shape
                x = jax.image.resize(x, (b, hh * 2, ww * 2, cc), method="nearest")
                x = nn.leaky_relu(_conv3(num_feat, "conv_up2")(x), 0.2)
            x = _conv3(self.in_chans, "conv_last")(nn.leaky_relu(_conv3(num_feat, "conv_hr")(x), 0.2))
        else:
            # denoise / JPEG-CAR residual head (swinir_arch.py:1099-1105)
            x_first = _conv3(embed_dim, "conv_first")(x)
            res = _conv3(embed_dim, "conv_after_body")(_z(forward_features(x_first))) + x_first
            if skip_tail:
                return None, taps
            x = x + _conv3(self.in_chans, "conv_last")(_z(res))
            x = x / self.img_range + mean

        return x[:, : h_in * self.upscale, : w_in * self.upscale, :], taps


_SWINIR_RENAMES = [
    (_re.compile(r"^encode_layers\.(\d+)\."), r"encode_layers_\1."),
    (_re.compile(r"^decode_layers(\d+)\."), r"decode_layers_\1."),
    (_re.compile(r"\.residual_group\.blocks\.(\d+)\."), r".residual_group_blocks_\1."),
    (_re.compile(r"\.conv\.(\d+)\."), r".conv_\1."),  # 3conv bottleneck
    (_re.compile(r"^patch_embed\.norm\."), r"patch_embed_norm."),
    (_re.compile(r"^conv_before_upsample\.0\."), r"conv_before_upsample_0."),
    (_re.compile(r"^upsample\.(\d+)\."), None),  # handled below (index//2 → convN)
]


def torch_key_map(key: str) -> str:
    m = _re.match(r"^upsample\.(\d+)\.(.+)$", key)
    if m:
        return f"upsample_conv{int(m.group(1)) // 2}.{m.group(2)}"
    for pat, repl in _SWINIR_RENAMES:
        if repl is not None:
            key = pat.sub(repl, key)
    return key


SwinIR.torch_key_map = staticmethod(torch_key_map)
