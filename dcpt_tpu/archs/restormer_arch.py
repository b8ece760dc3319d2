"""Restormer — channel-attention (MDTA) restoration transformer, TPU-native.

Numerically matches the reference (``basicsr/archs/restormer_arch.py``) in NHWC.
Key reference-specific semantics preserved:

* **ReLU instead of softmax** in the transposed attention — this repo's variant
  (restormer_arch.py:134-137) replaces the softmax with ReLU; the ``_origin``
  class shares the same block so it inherits ReLU too.
* BiasFree vs WithBias LayerNorm over per-pixel channel vectors; BiasFree does
  NOT subtract the mean in the output, but its variance IS mean-centred
  (restormer_arch.py:26-41).
* Exact-erf GELU in the gated-dconv FFN (torch ``F.gelu`` default).
* Downsample = 3×3 conv (C→C/2) + pixel-unshuffle(2); Upsample = 3×3 conv
  (C→2C) + pixel-shuffle(2).

MDTA maps beautifully onto the MXU: per-head C×C Grams of L2-normalised q, k —
large batched matmuls, linear in pixel count.

``__call__`` returns ``(out, taps)``; taps are keyed by the reference's module
names (``encoder_level1`` …) so DCPT hook-name filtering works unchanged.
"""

from __future__ import annotations

import os as _os
import re as _re
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import ARCH_REGISTRY
from .arch_util import pixel_shuffle, pixel_unshuffle, trunc_normal_init

# whole-TransformerBlock two-phase kernel (ops/mdta_block.py) — the Restormer
# roofline's "whole-block VMEM residency" lever: LN→qkv→dwconv + Gram
# accumulation in pass 1, attention application + projection + whole GDFN in
# pass 2, with the C×C attention micro-matrix built between passes on the
# host graph.  DCPT_TPU_MDTA_BLOCK=0 kill-switch, =1 forces it everywhere
# (A/B), unset = per-dtype measured-winner policy (_mdta_block_on).
_MDTA_BLOCK_ENV = _os.environ.get("DCPT_TPU_MDTA_BLOCK", "auto")
_MDTA_BLOCK_KERNEL = _MDTA_BLOCK_ENV != "0"


def _mdta_block_on(dtype) -> bool:
    """Per-dtype default for the whole-block kernel: ON for both precisions.

    Measured winner on v5e (scripts/bench_mdta_block.py, min-of-interleaved
    ×2 runs, 128px bs8): Restormer 2.00× fp32 / 1.59× bf16, PromptIR 2.02×
    fp32 / 1.60× bf16 over the XLA path — PARITY.md "MDTA whole-block
    kernel A/B (round 3)".  Big/odd shapes where the winner tiling can't
    fit VMEM fall back to XLA inside pick_tiles (measured faster there)."""
    if _MDTA_BLOCK_ENV == "1":
        return True
    return dtype in (jnp.float32, jnp.bfloat16)


def _conv(features: int, k: int, bias: bool, name: str, groups: int = 1) -> nn.Conv:
    return nn.Conv(
        features,
        (k, k),
        padding=((k // 2, k // 2), (k // 2, k // 2)),
        feature_group_count=groups,
        use_bias=bias,
        kernel_init=trunc_normal_init(0.02),
        bias_init=nn.initializers.zeros,
        name=name,
    )


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel axis of NHWC maps (restormer_arch.py:26-72)."""

    dim: int
    bias: bool = False  # False = BiasFree, True = WithBias

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        # statistics in fp32 under mixed precision (see arch_util.LayerNorm2d)
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        if self.bias:
            bias = self.param("bias", nn.initializers.zeros, (self.dim,))
            return ((xf - mu) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype) * weight + bias
        # BiasFree: centred variance but un-centred output
        return (xf * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype) * weight


class MDTA(nn.Module):
    """Multi-Dconv-Head Transposed Attention over channels (restormer_arch.py:103-145).

    ``pre_norm`` = (ln_w, ln_b, eps, biasfree): when given (pallas fast path),
    the incoming x is RAW and the LN + qkv 1×1 run as one fused kernel.
    """

    dim: int
    num_heads: int
    bias: bool = False
    use_softmax: bool = False  # the reference variant uses ReLU
    # context parallelism: (mesh axis name, halo rows at THIS level's resolution).
    # When set (requires running under shard_map with H sharded over that axis,
    # see parallel/spatial.py), the pixel-axis sums behind the channel Gram and
    # the q/k L2 norms become psums restricted to non-halo rows — making the
    # attention GLOBALLY exact despite the spatial sharding.  Adds no params.
    cp: tuple | None = None

    @nn.compact
    def __call__(self, x: jax.Array, pre_norm=None) -> jax.Array:
        b, h, w, c = x.shape
        heads = self.num_heads
        ch = c // heads

        if pre_norm is not None and not self.bias:
            from .arch_util import _ConvParamHolder, trunc_normal_init
            from ..ops.ln_proj import fused_ln_proj

            ln_w, ln_b, eps, biasfree = pre_norm
            wqkv, _ = _ConvParamHolder(c, c * 3, use_bias=False, kernel_init=trunc_normal_init(0.02), name="qkv")()
            qkv = fused_ln_proj(x, ln_w, ln_b, wqkv.reshape(c, c * 3), eps, biasfree)
        else:
            qkv = _conv(c * 3, 1, self.bias, "qkv")(x)
        qkv = _conv(c * 3, 3, self.bias, "qkv_dwconv", groups=c * 3)(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_first(t):  # (b, hw, heads, ch) → (b, heads, ch, hw)
            return t.reshape(b, h * w, heads, ch).transpose(0, 2, 3, 1)

        q, k, v = heads_first(q), heads_first(k), heads_first(v)
        temperature = self.param("temperature", nn.initializers.ones, (heads, 1, 1))

        # NOTE: the fused MDTA kernel (ops/mdta.py) wins 24× in isolation but
        # loses end-to-end to XLA's whole-model fusion on v5e (PARITY.md), so
        # the attention math stays on the XLA path; the LN+qkv prefix fusion
        # (pre_norm above) is the measured win.
        if self.cp is not None:
            # Context-parallel: Gram and norms are pixel sums, so sharding L
            # costs one O(C²) psum (parallel/spatial.py:spatial_mdta).  Halo
            # rows are excluded so overlap pixels aren't double-counted; the
            # result equals the full-image attention exactly.
            axis, halo = self.cp
            interior = slice(halo * w, (h - halo) * w) if halo > 0 else slice(None)
            qi, ki = q[..., interior], k[..., interior]
            gram = jax.lax.psum(jnp.einsum("bhcp,bhdp->bhcd", qi, ki), axis)
            qn2 = jax.lax.psum(jnp.sum(qi * qi, axis=-1, keepdims=True), axis)
            kn2 = jax.lax.psum(jnp.sum(ki * ki, axis=-1, keepdims=True), axis)
            # rsqrt(max(n², 1e-24)) == 1/max(‖·‖, 1e-12): same eps semantics
            attn = gram * jax.lax.rsqrt(jnp.maximum(qn2, 1e-24))
            attn = attn * jnp.swapaxes(jax.lax.rsqrt(jnp.maximum(kn2, 1e-24)), -1, -2) * temperature
        else:
            # L2-normalise along the pixel axis (torch F.normalize eps=1e-12)
            qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
            kn = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
            attn = jnp.einsum("bhcp,bhdp->bhcd", qn, kn) * temperature
        attn = jax.nn.softmax(attn, axis=-1) if self.use_softmax else jax.nn.relu(attn)
        out = jnp.einsum("bhcd,bhdp->bhcp", attn, v)

        out = out.transpose(0, 3, 1, 2).reshape(b, h, w, c)
        return _conv(c, 1, self.bias, "project_out")(out)


class GDFN(nn.Module):
    """Gated-Dconv feed-forward network (restormer_arch.py:75-100).

    ``pre_norm`` fuses the preceding LN into the project_in matmul (see MDTA).
    """

    dim: int
    ffn_expansion_factor: float = 2.66
    bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, pre_norm=None) -> jax.Array:
        hidden = int(self.dim * self.ffn_expansion_factor)
        if pre_norm is not None:
            from .arch_util import _ConvParamHolder, trunc_normal_init
            from ..ops.ln_proj import fused_ln_proj

            ln_w, ln_b, eps, biasfree = pre_norm
            w_in, _ = _ConvParamHolder(self.dim, hidden * 2, use_bias=False, kernel_init=trunc_normal_init(0.02), name="project_in")()
            x = fused_ln_proj(x, ln_w, ln_b, w_in.reshape(self.dim, hidden * 2), eps, biasfree)
        else:
            x = _conv(hidden * 2, 1, False, "project_in")(x)
        x = _conv(hidden * 2, 3, False, "dwconv", groups=hidden * 2)(x)
        x1, x2 = jnp.split(x, 2, axis=-1)
        x = jax.nn.gelu(x1, approximate=False) * x2
        return _conv(self.dim, 1, False, "project_out")(x)


class _MDTAParamHolder(nn.Module):
    """MDTA's param tree (bias-free) without the compute — the whole-block
    kernel path shares the exact checkpoint layout of the module path."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self):
        from .arch_util import _ConvParamHolder

        c, ti = self.dim, trunc_normal_init(0.02)
        wqkv, _ = _ConvParamHolder(c, 3 * c, use_bias=False, kernel_init=ti, name="qkv")()
        wdwq, _ = _ConvParamHolder(1, 3 * c, use_bias=False, kernel_init=ti, kernel_size=3, name="qkv_dwconv")()
        temperature = self.param("temperature", nn.initializers.ones, (self.heads, 1, 1))
        wproj, _ = _ConvParamHolder(c, c, use_bias=False, kernel_init=ti, name="project_out")()
        return wqkv, wdwq, temperature, wproj


class _GDFNParamHolder(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        from .arch_util import _ConvParamHolder

        ti = trunc_normal_init(0.02)
        win_, _ = _ConvParamHolder(self.dim, 2 * self.hidden, use_bias=False, kernel_init=ti, name="project_in")()
        wdwf, _ = _ConvParamHolder(1, 2 * self.hidden, use_bias=False, kernel_init=ti, kernel_size=3, name="dwconv")()
        wout, _ = _ConvParamHolder(self.hidden, self.dim, use_bias=False, kernel_init=ti, name="project_out")()
        return win_, wdwf, wout


def _fused_transformer_block(x, dim, heads, hidden, ln_bias, use_softmax, eps):
    """Whole-block Pallas fast path (must be called from a compact ``__call__``
    so the holders nest under the calling block); returns None to fall through
    to the module path."""
    from ..ops.mdta_block import mdta_block_fused, pick_tiles
    from .arch_util import _NormParamHolder

    _, h, w, c = x.shape
    tiles = pick_tiles(h, w, c, hidden)
    if tiles is None:
        return None
    th, sw = tiles
    n1w, n1b = _NormParamHolder(c, use_bias=ln_bias, name="norm1")()
    wqkv, wdwq, temperature, wproj = _MDTAParamHolder(c, heads, name="attn")()
    n2w, n2b = _NormParamHolder(c, use_bias=ln_bias, name="norm2")()
    win_, wdwf, wout = _GDFNParamHolder(c, hidden, name="ffn")()
    return mdta_block_fused(
        x, n1w, n1b, wqkv.reshape(c, 3 * c), wdwq.reshape(3, 3, 3 * c),
        temperature, wproj.reshape(c, c), n2w, n2b,
        win_.reshape(c, 2 * hidden), wdwf.reshape(3, 3, 2 * hidden),
        wout.reshape(hidden, c), heads, use_softmax, ln_bias, eps, th,
        False, sw,
    )


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int
    ffn_expansion_factor: float = 2.66
    bias: bool = False
    layernorm_bias: bool = False
    use_softmax: bool = False
    cp: tuple | None = None  # see MDTA.cp

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..ops import pallas_winner_enabled

        if (_MDTA_BLOCK_KERNEL and _mdta_block_on(x.dtype) and pallas_winner_enabled()
                and not self.bias and self.cp is None):
            out = _fused_transformer_block(
                x, self.dim, self.num_heads, int(self.dim * self.ffn_expansion_factor),
                self.layernorm_bias, self.use_softmax, 1e-6)
            if out is not None:
                return out
        # NOTE: the hot path stays on XLA — deliberately.  Profiled on v5e
        # (128px bs1, full ablation, PARITY.md "Restormer roofline"): the
        # LayerNorms, dwconvs and head transposes are each ~free (XLA fuses
        # them), per-op Pallas fusion LOSES (fused MDTA 7.4→22.9 ms; fused
        # LN+proj 36→46 ms: lane-unaligned dims 48/96/192/384 pad badly and
        # break XLA's surrounding fusions), and matmul-precision levers are
        # within noise.  The model is HBM-bandwidth-bound across many small
        # well-fused ops; the remaining ~2× headroom needs whole-block VMEM
        # residency, which the 48-ch level-1 maps (16.8 MB lane-padded fp32)
        # don't permit single-pass.  bf16 end-to-end gives the honest 1.43×.
        c = self.dim
        x = x + MDTA(c, self.num_heads, self.bias, self.use_softmax, cp=self.cp, name="attn")(
            ChannelLayerNorm(c, self.layernorm_bias, name="norm1")(x)
        )
        x = x + GDFN(c, self.ffn_expansion_factor, self.bias, name="ffn")(
            ChannelLayerNorm(c, self.layernorm_bias, name="norm2")(x)
        )
        return x


class _RestormerBody(nn.Module):
    """Shared 4-level U-Net body; subclasses fix defaults + key maps."""

    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_refinement_blocks: int = 4
    heads: Sequence[int] = (1, 2, 4, 8)
    ffn_expansion_factor: float = 2.66
    bias: bool = False
    LayerNorm_type: str = "BiasFree"
    dual_pixel_task: bool = False
    scale: int = 1
    window_size: int = 8
    use_softmax: bool = False
    # Context-parallel inference (SURVEY §5.7 extension): set cp_axis to a mesh
    # axis name and run the apply under parallel.spatial.spatial_sharded_apply
    # with halo=cp_halo (input-resolution rows, divisible by 8 so it survives
    # the 3 downsample levels).  Convs stay halo-local (exact when cp_halo ≥
    # receptive field, the test_tile contract), while every MDTA computes its
    # GLOBAL pixel statistics exactly via psum.  Adds no params, so checkpoints
    # load interchangeably with the plain model.
    cp_axis: str | None = None
    cp_halo: int = 0
    # gradient checkpointing: rematerialize each TransformerBlock in the
    # backward pass (param-free option — checkpoints stay interchangeable)
    remat: bool = False

    # tap-key style: 'prefix.body' for the SequentialTransformerBlock variant
    # (its count('.')==1 hookable module is the inner Sequential), 'prefix.{i}'
    # per block for the plain-Sequential _origin variant (whose blocks are the
    # count('.')==1 modules — DCDistModel hard-codes those indices,
    # …distillation_model.py:88-93).
    tap_style: str = "body"

    def _blocks(self, x, dim, head, n, prefix, taps, factor: int = 1):
        ln_bias = self.LayerNorm_type != "BiasFree"
        cp = None
        if self.cp_axis is not None:
            assert self.cp_halo % 8 == 0, "cp_halo must be divisible by 8 (3 downsample levels)"
            cp = (self.cp_axis, self.cp_halo // factor)
        Block = nn.remat(TransformerBlock) if self.remat else TransformerBlock
        for i in range(n):
            x = Block(
                dim, head, self.ffn_expansion_factor, self.bias, ln_bias, self.use_softmax, cp=cp, name=f"{prefix}_{i}"
            )(x)
            if self.tap_style == "blocks":
                taps[f"{prefix}.{i}"] = x
        if self.tap_style == "body":
            taps[f"{prefix}.body"] = x
        return x

    @nn.compact
    def __call__(self, inp_img: jax.Array, skip_tail: bool = False, deterministic: bool = True):
        dim = self.dim
        taps: dict[str, jax.Array] = {}

        inp_enc1 = _conv(dim, 3, False, "patch_embed")(inp_img)
        out_enc1 = self._blocks(inp_enc1, dim, self.heads[0], self.num_blocks[0], "encoder_level1", taps, factor=1)

        x = _conv(dim // 2, 3, False, "down1_2")(out_enc1)
        x = pixel_unshuffle(x, 2)
        out_enc2 = self._blocks(x, dim * 2, self.heads[1], self.num_blocks[1], "encoder_level2", taps, factor=2)

        x = _conv(dim, 3, False, "down2_3")(out_enc2)
        x = pixel_unshuffle(x, 2)
        out_enc3 = self._blocks(x, dim * 4, self.heads[2], self.num_blocks[2], "encoder_level3", taps, factor=4)

        x = _conv(dim * 2, 3, False, "down3_4")(out_enc3)
        x = pixel_unshuffle(x, 2)
        latent = self._blocks(x, dim * 8, self.heads[3], self.num_blocks[3], "latent", taps, factor=8)

        x = _conv(dim * 16, 3, False, "up4_3")(latent)
        x = pixel_shuffle(x, 2)
        x = jnp.concatenate([x, out_enc3], axis=-1)
        x = _conv(dim * 4, 1, self.bias, "reduce_chan_level3")(x)
        out_dec3 = self._blocks(x, dim * 4, self.heads[2], self.num_blocks[2], "decoder_level3", taps, factor=4)

        x = _conv(dim * 8, 3, False, "up3_2")(out_dec3)
        x = pixel_shuffle(x, 2)
        x = jnp.concatenate([x, out_enc2], axis=-1)
        x = _conv(dim * 2, 1, self.bias, "reduce_chan_level2")(x)
        out_dec2 = self._blocks(x, dim * 2, self.heads[1], self.num_blocks[1], "decoder_level2", taps, factor=2)

        x = _conv(dim * 4, 3, False, "up2_1")(out_dec2)
        x = pixel_shuffle(x, 2)
        x = jnp.concatenate([x, out_enc1], axis=-1)
        out_dec1 = self._blocks(x, dim * 2, self.heads[0], self.num_blocks[0], "decoder_level1", taps, factor=1)

        if skip_tail:
            return None, taps

        out = self._blocks(out_dec1, dim * 2, self.heads[0], self.num_refinement_blocks, "refinement", taps, factor=1)

        if self.scale == 1:
            if self.dual_pixel_task:
                out = out + _conv(dim * 2, 1, self.bias, "skip_conv")(inp_enc1)
                out = _conv(self.out_channels, 3, self.bias, "output")(out)
            else:
                out = _conv(self.out_channels, 3, self.bias, "output")(out) + inp_img
        else:
            # SR heads (restormer_arch.py:344-367,415-420): 2^scale conv heads
            # whose outputs interleave into a pixel-shuffle upsample
            outs = [
                _conv(self.out_channels, 3, self.bias, f"output_{i}")(out) + inp_img for i in range(2**self.scale)
            ]
            out = pixel_shuffle(jnp.concatenate(outs, axis=-1), self.scale)
        return out, taps


_COMMON_RENAMES = [
    (_re.compile(r"\.(norm1|norm2)\.body\."), r".\1."),
    (_re.compile(r"^(down\d_\d|up\d_\d)\.body\.0\."), r"\1."),
    (_re.compile(r"^patch_embed\.proj\."), r"patch_embed."),
    (_re.compile(r"^output\.(\d+)\."), r"output_\1."),
]
_SEQ_BODY = _re.compile(r"^(encoder_level\d|latent|decoder_level\d|refinement)\.body\.(\d+)\.")
_SEQ_PLAIN = _re.compile(r"^(encoder_level\d|latent|decoder_level\d|refinement)\.(\d+)\.")


def _map_key(key: str, seq_pat) -> str:
    key = seq_pat.sub(r"\1_\2.", key)
    for pat, repl in _COMMON_RENAMES:
        key = pat.sub(repl, key)
    return key


@ARCH_REGISTRY.register()
class Restormer(_RestormerBody):
    """This repo's DCPT variant: ReLU attention, BiasFree LN default, hookable
    ``SequentialTransformerBlock`` levels (restormer_arch.py:235-422)."""

    @staticmethod
    def torch_key_map(key: str) -> str:
        return _map_key(key, _SEQ_BODY)


@ARCH_REGISTRY.register()
class Restormer_origin(_RestormerBody):
    """Upstream-layout Restormer (restormer_arch.py:426-518): WithBias LN
    default, plain Sequential levels, no SR heads (it shares this repo's
    ReLU-attention block)."""

    LayerNorm_type: str = "WithBias"
    tap_style: str = "blocks"

    @staticmethod
    def torch_key_map(key: str) -> str:
        return _map_key(key, _SEQ_PLAIN)
