"""RCAN — Residual Channel Attention Network, TPU-native NHWC.

Numerically matches the reference (``basicsr/archs/rcan_arch.py``): RCAB =
conv-ReLU-conv + squeeze-excite channel attention; groups of RCABs with a conv
and residual; global residual; pixel-shuffle upsample head; DIV2K mean shift.
"""

from __future__ import annotations

import math
import re as _re
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import ARCH_REGISTRY
from .arch_util import conv2d


class ChannelAttention(nn.Module):
    """Global-pool squeeze-excite (reference: rcan_arch.py:9-29)."""

    num_feat: int
    squeeze_factor: int = 16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = conv2d(self.num_feat // self.squeeze_factor, 1, name="attention_1", in_features=self.num_feat)(y)
        y = nn.relu(y)
        y = conv2d(self.num_feat, 1, name="attention_3", in_features=self.num_feat // self.squeeze_factor)(y)
        return x * nn.sigmoid(y)


class RCAB(nn.Module):
    num_feat: int
    squeeze_factor: int = 16
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        res = conv2d(self.num_feat, 3, name="rcab_0", in_features=self.num_feat)(x)
        res = nn.relu(res)
        res = conv2d(self.num_feat, 3, name="rcab_2", in_features=self.num_feat)(res)
        res = ChannelAttention(self.num_feat, self.squeeze_factor, name="rcab_3")(res)
        return x + res * self.res_scale


class ResidualGroup(nn.Module):
    num_feat: int
    num_block: int
    squeeze_factor: int = 16
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        res = x
        for i in range(self.num_block):
            res = RCAB(self.num_feat, self.squeeze_factor, self.res_scale, name=f"residual_group_{i}")(res)
        res = conv2d(self.num_feat, 3, name="conv", in_features=self.num_feat)(res)
        return x + res


@ARCH_REGISTRY.register()
class RCAN(nn.Module):
    """RCAN (reference: rcan_arch.py:86-151)."""

    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_group: int = 10
    num_block: int = 16
    squeeze_factor: int = 16
    upscale: int = 4
    res_scale: float = 1.0
    img_range: float = 255.0
    rgb_mean: Sequence[float] = (0.4488, 0.4371, 0.4040)

    @nn.compact
    def __call__(self, x: jax.Array, skip_tail: bool = False, deterministic: bool = True):
        taps: dict[str, jax.Array] = {}
        mean = jnp.asarray(self.rgb_mean, dtype=x.dtype)
        x = (x - mean) * self.img_range

        x = conv2d(self.num_feat, 3, name="conv_first", in_features=self.num_in_ch)(x)
        res = x
        for g in range(self.num_group):
            res = ResidualGroup(self.num_feat, self.num_block, self.squeeze_factor, self.res_scale, name=f"body_{g}")(res)
            taps[f"body.{g}"] = res
        res = conv2d(self.num_feat, 3, name="conv_after_body", in_features=self.num_feat)(res)
        res = res + x

        if skip_tail:
            return None, taps

        up = res
        if (self.upscale & (self.upscale - 1)) == 0:
            for i in range(int(math.log2(self.upscale))):
                up = conv2d(4 * self.num_feat, 3, name=f"upsample_conv{i}", in_features=self.num_feat)(up)
                from .arch_util import pixel_shuffle

                up = pixel_shuffle(up, 2)
        elif self.upscale == 3:
            up = conv2d(9 * self.num_feat, 3, name="upsample_conv0", in_features=self.num_feat)(up)
            from .arch_util import pixel_shuffle

            up = pixel_shuffle(up, 3)
        out = conv2d(self.num_out_ch, 3, name="conv_last", in_features=self.num_feat)(up)
        return out / self.img_range + mean, taps


_RCAN_RENAMES = [
    (_re.compile(r"^body\.(\d+)\."), r"body_\1."),
    (_re.compile(r"\.residual_group\.(\d+)\."), r".residual_group_\1."),
    (_re.compile(r"\.rcab\.(\d+)\."), r".rcab_\1."),
    (_re.compile(r"\.attention\.(\d+)\."), r".attention_\1."),
]


def torch_key_map(key: str) -> str:
    m = _re.match(r"^upsample\.(\d+)\.(.+)$", key)
    if m:
        return f"upsample_conv{int(m.group(1)) // 2}.{m.group(2)}"
    for pat, repl in _RCAN_RENAMES:
        key = pat.sub(repl, key)
    return key


RCAN.torch_key_map = staticmethod(torch_key_map)
