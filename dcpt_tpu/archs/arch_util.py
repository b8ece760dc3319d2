"""Shared arch building blocks, TPU-native (NHWC, flax.linen).

Covers the reference's ``basicsr/archs/arch_util.py`` surface: init helpers,
pixel (un)shuffle, residual blocks, upsample heads, and the TLSC test-time
local-statistics pooling (arch_util.py:313-455) re-expressed functionally —
instead of mutating modules (``replace_layers``), archs take a static
``local_stats``/``train_size`` config and the pooling switches implementation.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


# ---------------------------------------------------------------------------
# Initialisers matching torch defaults (so training-from-scratch matches the
# reference's init distribution: kaiming_uniform(a=√5) + fan-in uniform bias).
# ---------------------------------------------------------------------------

def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch Conv2d default: kaiming_uniform(a=√5) → U(-√(1/fan_in), +√(1/fan_in))."""
    fan_in = shape[0] * shape[1] * shape[2]  # kh * kw * in_per_group
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    fan_in = shape[0]
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    bound = math.sqrt(1.0 / fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def conv2d(features: int, kernel_size: int = 3, stride: int = 1, groups: int = 1, bias: bool = True, name: str | None = None, in_features: int | None = None, padding: int | None = None) -> nn.Conv:
    """An nn.Conv with torch-default init and torch-style explicit padding.

    torch Conv2d pads symmetrically with ``padding`` zeros (callers in the
    reference pass k//2 for odd kernels and 0 for strided even-kernel downs);
    flax "SAME" differs for even kernels, so we always pass explicit padding.
    """
    pad = kernel_size // 2 if padding is None else padding
    fan_in = (in_features if in_features is not None else features) // groups * kernel_size * kernel_size
    return nn.Conv(
        features=features,
        kernel_size=(kernel_size, kernel_size),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        feature_group_count=groups,
        use_bias=bias,
        kernel_init=torch_conv_kernel_init,
        bias_init=torch_bias_init(fan_in),
        name=name,
    )


# ---------------------------------------------------------------------------
# Pixel shuffle (NHWC, torch-compatible channel ordering)
# ---------------------------------------------------------------------------

def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """NHWC pixel shuffle matching torch.nn.PixelShuffle channel order.

    torch: out[b, c, h*r+i, w*r+j] = in[b, c*r² + i*r + j, h, w].
    """
    b, h, w, c = x.shape
    c_out = c // (r * r)
    x = x.reshape(b, h, w, c_out, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b h i w j c
    return x.reshape(b, h * r, w * r, c_out)


def pixel_unshuffle(x: jax.Array, r: int) -> jax.Array:
    """Inverse of :func:`pixel_shuffle` (reference: arch_util.py:201-230)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b h w c i j
    return x.reshape(b, h // r, w // r, c * r * r)


# ---------------------------------------------------------------------------
# LayerNorm2d — channel-wise LN over the feature dim of NHWC maps.
# Biased variance, like the reference (nafnet_arch.py:25-64).
# ---------------------------------------------------------------------------

class LayerNorm2d(nn.Module):
    channels: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        weight = self.param("weight", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        from ..ops import pallas_enabled

        # c ≥ 512 only: measured per-stage on v5e at bs16 (PARITY.md "NAFNet
        # kernel A/B") the kernel wins 21% at c=512 but loses at c ≤ 256
        # (c=64's 2× lane padding costs 22%) — XLA's fusion is better there
        if pallas_enabled() and self.channels % 128 == 0 and self.channels >= 512:
            from ..ops import layer_norm_2d

            return layer_norm_2d(x, weight, bias, self.eps)
        # normalization statistics in fp32 even under bf16 mixed precision
        # (the classic bf16 LN failure mode: 8-bit mantissa cancels in
        # mean/variance); output returns to the compute dtype, so no fp32
        # creep into downstream matmuls
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        y = ((xf - mu) * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)
        return y * weight + bias


class _ConvParamHolder(nn.Module):
    """Declares conv params (kernel HWIO [+ bias]) without running the conv —
    lets fused Pallas paths share the exact param tree of an ``nn.Conv``.
    ``in_features`` is the per-group input width (== in channels for ungrouped
    convs, 1 for depthwise)."""

    in_features: int
    features: int
    use_bias: bool = True
    kernel_init: object = None  # default: torch conv init
    kernel_size: int = 1

    @nn.compact
    def __call__(self):
        kinit = self.kernel_init if self.kernel_init is not None else torch_conv_kernel_init
        k = self.kernel_size
        kernel = self.param("kernel", kinit, (k, k, self.in_features, self.features))
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(self.in_features * k * k), (self.features,))
            return kernel, bias
        return kernel, None


class _NormParamHolder(nn.Module):
    """LayerNorm's (weight[, bias]) params without the compute."""

    channels: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        weight = self.param("weight", nn.initializers.ones, (self.channels,))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.channels,))
            return weight, bias
        return weight, jnp.zeros((self.channels,), weight.dtype)


# ---------------------------------------------------------------------------
# TLSC local pooling (test-time local statistics conversion)
# ---------------------------------------------------------------------------

def local_avg_pool(x: jax.Array, kernel_size: tuple[int, int]) -> jax.Array:
    """Sliding-window mean with replicate-padded output, NHWC.

    Functional equivalent of the reference's TLSC ``AvgPool2d`` exact path
    (arch_util.py:377-397): integral image over zero-padded cumsum, window
    (k1, k2), then centre the (h-k1+1, w-k2+1) map back to (h, w) with
    replicate padding.  Falls back to global mean when the window covers the
    whole map.
    """
    _, h, w, _ = x.shape
    k1 = min(h, kernel_size[0])
    k2 = min(w, kernel_size[1])
    if k1 >= h and k2 >= w:
        return jnp.mean(x, axis=(1, 2), keepdims=True)

    s = jnp.cumsum(jnp.cumsum(x, axis=2), axis=1)
    s = jnp.pad(s, ((0, 0), (1, 0), (1, 0), (0, 0)))
    out = (s[:, :-k1, :-k2] + s[:, k1:, k2:] - s[:, :-k1, k2:] - s[:, k1:, :-k2]) / (k1 * k2)

    _h, _w = out.shape[1:3]
    pad_t, pad_b = (h - _h) // 2, (h - _h + 1) // 2
    pad_l, pad_r = (w - _w) // 2, (w - _w + 1) // 2
    return jnp.pad(out, ((0, 0), (pad_t, pad_b), (pad_l, pad_r), (0, 0)), mode="edge")


def tlsc_kernel_size(x_shape: Sequence[int], base_size: tuple[int, int], train_size: tuple[int, int]) -> tuple[int, int]:
    """Reference AvgPool2d kernel-size rule (arch_util.py:340-346): scale the
    base window by the ratio of actual input to train-time input size."""
    h, w = x_shape[1], x_shape[2]
    return (h * base_size[0] // train_size[0], w * base_size[1] // train_size[1])


# ---------------------------------------------------------------------------
# Classic SR helpers (used by RCAN / SwinIR heads)
# ---------------------------------------------------------------------------

class ResidualBlockNoBN(nn.Module):
    """Conv-ReLU-Conv residual block (reference: arch_util.py:61-86)."""

    num_feat: int = 64
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        identity = x
        out = conv2d(self.num_feat, 3, name="conv1", in_features=self.num_feat)(x)
        out = nn.relu(out)
        out = conv2d(self.num_feat, 3, name="conv2", in_features=self.num_feat)(out)
        return identity + out * self.res_scale


class Upsample(nn.Module):
    """Pixel-shuffle upsampler for 2^n and 3 scales (reference: arch_util.py:88-109)."""

    scale: int
    num_feat: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if (self.scale & (self.scale - 1)) == 0:  # 2^n
            for i in range(int(math.log2(self.scale))):
                x = conv2d(4 * self.num_feat, 3, name=f"conv{i}", in_features=self.num_feat)(x)
                x = pixel_shuffle(x, 2)
        elif self.scale == 3:
            x = conv2d(9 * self.num_feat, 3, name="conv0", in_features=self.num_feat)(x)
            x = pixel_shuffle(x, 3)
        else:
            raise ValueError(f"scale {self.scale} is not supported. Supported scales: 2^n and 3.")
        return x


def resize_bilinear(x: jax.Array, out_hw: tuple[int, int], align_corners: bool = False) -> jax.Array:
    """Bilinear NHWC resize matching torch F.interpolate semantics."""
    if align_corners:
        # jax.image has no align_corners mode; implement via explicit gather
        b, h, w, c = x.shape
        oh, ow = out_hw
        ys = jnp.linspace(0.0, h - 1.0, oh)
        xs = jnp.linspace(0.0, w - 1.0, ow)
        y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
        x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
        y1 = jnp.clip(y0 + 1, 0, h - 1)
        x1 = jnp.clip(x0 + 1, 0, w - 1)
        wy = (ys - y0).reshape(1, oh, 1, 1)
        wx = (xs - x0).reshape(1, 1, ow, 1)
        g = lambda yi, xi: x[:, yi][:, :, xi]
        top = g(y0, x0) * (1 - wx) + g(y0, x1) * wx
        bot = g(y1, x0) * (1 - wx) + g(y1, x1) * wx
        return top * (1 - wy) + bot * wy
    # antialias=False matches torch F.interpolate(mode="bilinear"), which never
    # low-pass filters on downscale
    return jax.image.resize(
        x, (x.shape[0], out_hw[0], out_hw[1], x.shape[3]), method="bilinear", antialias=False
    )


def flow_warp(x: jax.Array, flow: jax.Array, padding_mode: str = "zeros") -> jax.Array:
    """Warp an NHWC image by optical flow (reference: arch_util.py:112-160).

    flow: (N, H, W, 2) with (dx, dy) displacements in pixels.  Bilinear
    sampling with zero (or edge) padding — a gather-based grid_sample.
    """
    n, h, w, c = x.shape
    grid_y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    grid_x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    vx = grid_x[None] + flow[..., 0]
    vy = grid_y[None] + flow[..., 1]

    x0 = jnp.floor(vx)
    y0 = jnp.floor(vy)
    wx = vx - x0
    wy = vy - y0

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = jax.vmap(lambda img, ys, xs: img[ys, xs])(x, yc, xc)
        if padding_mode == "zeros":
            inside = ((yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1))[..., None]
            vals = jnp.where(inside, vals, 0.0)
        return vals

    top = gather(y0, x0) * (1 - wx)[..., None] + gather(y0, x0 + 1) * wx[..., None]
    bot = gather(y0 + 1, x0) * (1 - wx)[..., None] + gather(y0 + 1, x0 + 1) * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


class LocalInstanceNorm2d(nn.Module):
    """Instance norm with TLSC local statistics (reference: arch_util.py:401-433)."""

    num_features: int
    eps: float = 1e-5
    affine: bool = False
    kernel_size: tuple[int, int] | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.kernel_size is None:
            mean_x = jnp.mean(x, axis=(1, 2), keepdims=True)
            mean_xx = jnp.mean(x * x, axis=(1, 2), keepdims=True)
        else:
            mean_x = local_avg_pool(x, self.kernel_size)
            mean_xx = local_avg_pool(x * x, self.kernel_size)
        var = mean_xx - mean_x * mean_x
        out = (x - mean_x) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            weight = self.param("weight", nn.initializers.ones, (self.num_features,))
            bias = self.param("bias", nn.initializers.zeros, (self.num_features,))
            out = out * weight + bias
        return out


def trunc_normal_init(std: float = 0.02):
    """Truncated-normal init à la timm's trunc_normal_ (reference: arch_util.py:259-310)."""
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)
