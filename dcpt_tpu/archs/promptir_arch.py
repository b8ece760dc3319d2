"""PromptIR — Restormer-style U-Net + learnable prompt banks at 3 decoder levels.

Numerically matches the reference (``basicsr/archs/promptir_arch.py``) in NHWC.
Reference-specific semantics preserved:

* **softmax** channel attention (unlike this repo's Restormer variant which uses
  ReLU, PromptIR keeps softmax — promptir_arch.py:140);
* LayerNorm eps **1e-5** (vs Restormer's 1e-6, promptir_arch.py:41,60),
  WithBias default;
* PromptGenBlock (promptir_arch.py:238-261): GAP embedding → linear → softmax
  weights over a learnable bank (1, len, dim, size, size), bilinear resize to
  the feature size, 3×3 conv.  Prompt dims are fixed (64/128/320 at sizes
  64/32/16) as in the reference;
* ``noise_level1`` uses ``heads[2]`` (a reference quirk, promptir_arch.py:479);
* the feature-only pass (``hook=True``) returns right after
  ``reduce_noise_level1`` — before ``up2_1``/``decoder_level1``/``refinement``
  (promptir_arch.py:463-506) — reproduced by ``skip_tail=True``.
"""

from __future__ import annotations

import re as _re
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import ARCH_REGISTRY
from .arch_util import pixel_shuffle, pixel_unshuffle, resize_bilinear
from .restormer_arch import GDFN, MDTA, _conv


class ChannelLayerNorm5(nn.Module):
    """Channel LayerNorm with eps=1e-5 (promptir_arch.py:26-72)."""

    dim: int
    bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        # statistics in fp32 under mixed precision (see arch_util.LayerNorm2d)
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        if self.bias:
            bias = self.param("bias", nn.initializers.zeros, (self.dim,))
            return ((xf - mu) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype) * weight + bias
        return (xf * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype) * weight


class PromptTransformerBlock(nn.Module):
    dim: int
    num_heads: int
    ffn_expansion_factor: float = 2.66
    bias: bool = False
    layernorm_bias: bool = True
    cp: tuple | None = None  # (mesh axis, halo rows at this level) — see restormer MDTA.cp

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..ops import pallas_winner_enabled
        from .restormer_arch import _MDTA_BLOCK_KERNEL, _fused_transformer_block, _mdta_block_on

        if (_MDTA_BLOCK_KERNEL and _mdta_block_on(x.dtype) and pallas_winner_enabled()
                and not self.bias and self.cp is None):
            out = _fused_transformer_block(
                x, self.dim, self.num_heads, int(self.dim * self.ffn_expansion_factor),
                self.layernorm_bias, True, 1e-5)
            if out is not None:
                return out
        x = x + MDTA(self.dim, self.num_heads, self.bias, use_softmax=True, cp=self.cp, name="attn")(
            ChannelLayerNorm5(self.dim, self.layernorm_bias, name="norm1")(x)
        )
        x = x + GDFN(self.dim, self.ffn_expansion_factor, self.bias, name="ffn")(
            ChannelLayerNorm5(self.dim, self.layernorm_bias, name="norm2")(x)
        )
        return x


class PromptGenBlock(nn.Module):
    """Prompt bank weighted by a GAP-softmax embedding (promptir_arch.py:238-261).

    ``cp`` = (mesh axis, halo rows at this level, n_shards): under H-sharded
    ``spatial_sharded_apply`` the block stays GLOBALLY exact — the GAP becomes
    an interior-masked ``psum`` mean, and the prompt is bilinearly resized to
    the GLOBAL height and row-gathered at this shard's (reflect-extended)
    global coordinates, so every shard sees exactly its slice of the
    full-image prompt.  Adds no params.
    """

    prompt_dim: int = 128
    prompt_len: int = 5
    prompt_size: int = 96
    cp: tuple | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        # bank kept in the torch layout (1, len, dim, size, size) so checkpoints map as-is
        bank = self.param(
            "prompt_param",
            nn.initializers.uniform(scale=1.0),
            (1, self.prompt_len, self.prompt_dim, self.prompt_size, self.prompt_size),
        )
        if self.cp is not None:
            axis, halo, n = self.cp
            interior = x[:, halo : h - halo] if halo > 0 else x
            emb = jax.lax.psum(jnp.sum(interior, axis=(1, 2)), axis) / (
                (h - 2 * halo) * n * w
            )  # exact global mean
        else:
            emb = jnp.mean(x, axis=(1, 2))  # (b, c)
        weights = jax.nn.softmax(nn.Dense(self.prompt_len, name="linear_layer")(emb), axis=1)
        prompt = jnp.einsum("bl,ldhw->bdhw", weights, bank[0])
        if self.cp is not None:
            axis, halo, n = self.cp
            h_int = h - 2 * halo
            h_glob = h_int * n
            prompt = resize_bilinear(prompt.transpose(0, 2, 3, 1), (h_glob, w))
            start = jax.lax.axis_index(axis) * h_int - halo
            rows = start + jnp.arange(h)
            # reflect (jnp.pad 'reflect' semantics) to match the halo machinery
            rows = jnp.where(rows < 0, -rows, rows)
            rows = jnp.where(rows >= h_glob, 2 * h_glob - 2 - rows, rows)
            prompt = jnp.take(prompt, rows, axis=1)
        else:
            prompt = resize_bilinear(prompt.transpose(0, 2, 3, 1), (h, w))
        return _conv(self.prompt_dim, 3, False, "conv3x3")(prompt)


@ARCH_REGISTRY.register()
class PromptIR(nn.Module):
    """PromptIR (reference: promptir_arch.py:267-506).

    Channel bookkeeping is computed from the live tensor shapes, so it
    generalises beyond the reference's hard-coded dim=48 constants while being
    exactly equal to them at dim=48.
    """

    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_refinement_blocks: int = 4
    heads: Sequence[int] = (1, 2, 4, 8)
    ffn_expansion_factor: float = 2.66
    bias: bool = False
    LayerNorm_type: str = "WithBias"
    decoder: bool = True
    window_size: int = 8
    # gradient checkpointing: rematerialize each TransformerBlock in the
    # backward pass (param-free option — checkpoints stay interchangeable)
    remat: bool = False
    # Context-parallel inference under parallel.spatial.spatial_sharded_apply
    # (same contract as Restormer's cp_axis/cp_halo, which shares this MDTA):
    # attention stats AND the prompt banks stay globally exact while H is
    # sharded.  cp_shards (the static axis size) is needed because the prompt
    # must be resized to the GLOBAL height.  Adds no params.
    cp_axis: str | None = None
    cp_halo: int = 0
    cp_shards: int = 0

    def _cp(self, factor: int):
        if self.cp_axis is None:
            return None
        assert self.cp_halo % 8 == 0, "cp_halo must be divisible by 8 (3 downsample levels)"
        assert self.cp_shards > 1, "cp_shards (static mesh-axis size) required with cp_axis"
        return (self.cp_axis, self.cp_halo // factor, self.cp_shards)

    def _blocks(self, x, head, n, prefix, taps, factor: int = 1):
        # per-block tap keys: PromptIR levels are plain nn.Sequential in the
        # reference, so its count('.')==1 hookable modules are the individual
        # TransformerBlocks ('encoder_level1.0', …)
        ln_bias = self.LayerNorm_type != "BiasFree"
        cp = self._cp(factor)
        cp = None if cp is None else cp[:2]  # MDTA takes (axis, halo)
        Block = nn.remat(PromptTransformerBlock) if self.remat else PromptTransformerBlock
        for i in range(n):
            x = Block(
                x.shape[-1], head, self.ffn_expansion_factor, self.bias, ln_bias, cp=cp, name=f"{prefix}_{i}"
            )(x)
            taps[f"{prefix}.{i}"] = x
        return x

    @nn.compact
    def __call__(self, inp_img: jax.Array, skip_tail: bool = False, deterministic: bool = True):
        dim = self.dim
        ln_bias = self.LayerNorm_type != "BiasFree"
        taps: dict[str, jax.Array] = {}

        def prompt_fuse(x, level, prompt_dim, prompt_size, factor):
            """cat(prompt) → noise_level{level} transformer → 1×1 reduce."""
            cp = self._cp(factor)
            p = PromptGenBlock(prompt_dim, 5, prompt_size, cp=cp, name=f"prompt{level}")(x)
            x = jnp.concatenate([x, p], axis=-1)
            x = PromptTransformerBlock(
                x.shape[-1], self.heads[2], self.ffn_expansion_factor, self.bias, ln_bias,
                cp=None if cp is None else cp[:2], name=f"noise_level{level}",
            )(x)
            reduce_to = dim * 4 if level in (2, 3) else dim * 2  # promptir_arch quirk: level2 reduces to dim*4
            x = _conv(reduce_to, 1, self.bias, f"reduce_noise_level{level}")(x)
            return x

        inp_enc1 = _conv(dim, 3, False, "patch_embed")(inp_img)
        out_enc1 = self._blocks(inp_enc1, self.heads[0], self.num_blocks[0], "encoder_level1", taps, factor=1)

        x = _conv(dim // 2, 3, False, "down1_2")(out_enc1)
        out_enc2 = self._blocks(pixel_unshuffle(x, 2), self.heads[1], self.num_blocks[1], "encoder_level2", taps, factor=2)

        x = _conv(dim, 3, False, "down2_3")(out_enc2)
        out_enc3 = self._blocks(pixel_unshuffle(x, 2), self.heads[2], self.num_blocks[2], "encoder_level3", taps, factor=4)

        x = _conv(dim * 2, 3, False, "down3_4")(out_enc3)
        latent = self._blocks(pixel_unshuffle(x, 2), self.heads[3], self.num_blocks[3], "latent", taps, factor=8)

        if self.decoder:
            latent = prompt_fuse(latent, 3, 320, 16, factor=8)

        x = _conv(latent.shape[-1] * 2, 3, False, "up4_3")(latent)
        x = pixel_shuffle(x, 2)
        x = jnp.concatenate([x, out_enc3], axis=-1)
        x = _conv(dim * 4, 1, self.bias, "reduce_chan_level3")(x)
        out_dec3 = self._blocks(x, self.heads[2], self.num_blocks[2], "decoder_level3", taps, factor=4)

        if self.decoder:
            out_dec3 = prompt_fuse(out_dec3, 2, 128, 32, factor=4)

        x = _conv(out_dec3.shape[-1] * 2, 3, False, "up3_2")(out_dec3)
        x = pixel_shuffle(x, 2)
        x = jnp.concatenate([x, out_enc2], axis=-1)
        x = _conv(dim * 2, 1, self.bias, "reduce_chan_level2")(x)
        out_dec2 = self._blocks(x, self.heads[1], self.num_blocks[1], "decoder_level2", taps, factor=2)

        if self.decoder:
            out_dec2 = prompt_fuse(out_dec2, 1, 64, 64, factor=2)

        if skip_tail:
            return None, taps

        x = _conv(out_dec2.shape[-1] * 2, 3, False, "up2_1")(out_dec2)
        x = pixel_shuffle(x, 2)
        x = jnp.concatenate([x, out_enc1], axis=-1)
        out_dec1 = self._blocks(x, self.heads[0], self.num_blocks[0], "decoder_level1", taps, factor=1)

        out = self._blocks(out_dec1, self.heads[0], self.num_refinement_blocks, "refinement", taps, factor=1)
        out = _conv(self.out_channels, 3, self.bias, "output")(out) + inp_img
        return out, taps


_PROMPTIR_RENAMES = [
    (_re.compile(r"^(encoder_level\d|latent|decoder_level\d|refinement)\.(\d+)\."), r"\1_\2."),
    (_re.compile(r"\.(norm1|norm2)\.body\."), r".\1."),
    (_re.compile(r"^(down\d_\d|up\d_\d)\.body\.0\."), r"\1."),
    (_re.compile(r"^patch_embed\.proj\."), r"patch_embed."),
]


def torch_key_map(key: str) -> str:
    for pat, repl in _PROMPTIR_RENAMES:
        key = pat.sub(repl, key)
    return key


PromptIR.torch_key_map = staticmethod(torch_key_map)
