"""InceptionV3 feature extractor for FID — flax, NHWC.

The reference's ``basicsr/metrics/fid.py:7`` imports ``basicsr.archs.inception``
which is MISSING from the snapshot (documented quirk); upstream BasicSR's copy
is the pytorch-fid ``InceptionV3`` — torchvision's inception_v3 trunk with the
FID-specific block variants (average-pool branches exclude padding, and the
second InceptionE uses a max-pool branch) matching the
``pt_inception-2015-12-05`` weight file.  This is that architecture in flax:

* NHWC, inference-only (the FID extractor is never trained);
* BatchNorm is FOLDED into per-channel scale/shift at weight-conversion time
  (``scripts/convert_inception_weights.py``) — one multiply-add instead of a
  normalization, XLA fuses it into the conv;
* returns the 2048-d pool3 features (pytorch-fid ``output_blocks=[3]``, the
  reference's ``load_patched_inception_v3`` call at fid.py:11-18);
* ``resize_input`` bilinearly resizes to 299×299 (align_corners=False ⇒
  ``jax.image.resize`` bilinear without antialiasing), ``normalize_input``
  maps [0,1] → [-1,1] — reference defaults resize=True, normalize=False.

Module names mirror the torch checkpoint keys so conversion is mechanical.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.registry import ARCH_REGISTRY


class BasicConv2d(nn.Module):
    """conv(no bias) + folded-BN scale/shift + ReLU (torchvision BasicConv2d)."""

    out: int
    kernel: Sequence[int]
    stride: Sequence[int] = (1, 1)
    padding: Sequence[int] = (0, 0)

    @nn.compact
    def __call__(self, x):
        pad = [(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])]
        x = nn.Conv(self.out, tuple(self.kernel), tuple(self.stride), padding=pad, use_bias=False, name="conv")(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.out,))
        shift = self.param("bn_shift", nn.initializers.zeros, (self.out,))
        return nn.relu(x * scale + shift)


def _avg_pool_3x3_exclude_pad(x):
    """3×3 stride-1 average pool, zero-padded but excluding pad positions from
    the divisor (torch ``count_include_pad=False`` — the FID block variant)."""
    window = (1, 3, 3, 1)
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, (1, 1, 1, 1), "SAME")
    count = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, (1, 1, 1, 1), "SAME")
    return summed / count


def _max_pool(x, size, stride, padding="VALID"):
    return nn.max_pool(x, (size, size), (stride, stride), padding)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(bd)
        bp = _avg_pool_3x3_exclude_pad(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, bd, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_exclude_pad(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=(2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"  # "avg" (FID E_1) or "max" (FID E_2)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate(
            [
                BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
                BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
            ],
            axis=-1,
        )
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate(
            [
                BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
                BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
            ],
            axis=-1,
        )
        if self.pool_mode == "max":
            bp = nn.max_pool(x, (3, 3), (1, 1), "SAME")
        else:
            bp = _avg_pool_3x3_exclude_pad(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


@ARCH_REGISTRY.register()
class InceptionV3Features(nn.Module):
    """pool3 (2048-d) feature trunk for FID (pytorch-fid output_blocks=[3])."""

    resize_input: bool = True
    normalize_input: bool = False

    @nn.compact
    def __call__(self, x):
        if self.resize_input and x.shape[1:3] != (299, 299):
            x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[3]), method="bilinear", antialias=False)
        if self.normalize_input:
            x = 2 * x - 1
        x = BasicConv2d(32, (3, 3), stride=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool → (B, 2048)
