"""Degradation-classifier decoders, TPU-native NHWC.

The DCPT probe (``basicsr/archs/degrad_classify_arch.py:481-641``): a
Detectron2-style bottleneck ResNet whose stages fuse hooked encoder features
from the restoration net through softmax mixing weights, ending in GAP + fc
logits over degradation classes.

* ``PromptIR_DC`` — with a 7×7/2 conv stem on the LQ image;
* ``PromptIR_NoImg_DC`` — no image stem, classifies from features alone
  (optionally reshaping (B, N, C) token features into maps and nearest-
  downsampling level i by 1/2^i, degrad_classify_arch.py:624-636).

Features are NHWC maps here (our archs return taps in NHWC); token inputs are
accepted for the ``downsample`` path.
"""

from __future__ import annotations

import math
import re as _re
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import ARCH_REGISTRY
from .arch_util import LayerNorm2d


def _msra_conv(features: int, k: int, stride: int = 1, bias: bool = False, name: str | None = None) -> nn.Conv:
    """Conv with Caffe2 MSRA fill (kaiming normal, fan_out, relu)."""
    return nn.Conv(
        features,
        (k, k),
        strides=(stride, stride),
        padding=((k // 2, k // 2), (k // 2, k // 2)),
        use_bias=bias,
        kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
        name=name,
    )


class BottleneckBlock(nn.Module):
    """1×1 → 3×3 → 1×1 bottleneck with LN after each conv (degrad_classify_arch.py:132-243)."""

    in_channels: int
    out_channels: int
    bottleneck_channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out = _msra_conv(self.bottleneck_channels, 1, name="conv1")(x)
        out = LayerNorm2d(self.bottleneck_channels, name="conv1_norm")(out)
        out = nn.relu(out)
        out = _msra_conv(self.bottleneck_channels, 3, stride=self.stride, name="conv2")(out)
        out = LayerNorm2d(self.bottleneck_channels, name="conv2_norm")(out)
        out = nn.relu(out)
        out = _msra_conv(self.out_channels, 1, name="conv3")(out)
        out = LayerNorm2d(self.out_channels, name="conv3_norm")(out)

        if self.in_channels != self.out_channels:
            shortcut = _msra_conv(self.out_channels, 1, stride=self.stride, name="shortcut")(x)
            shortcut = LayerNorm2d(self.out_channels, name="shortcut_norm")(shortcut)
        else:
            shortcut = x
        return nn.relu(out + shortcut)


class _DCBase(nn.Module):
    feature_dims: Sequence[int] = (64, 128, 256, 512)
    num_res_blocks: int = 2
    num_classes: int = 3

    def _stage(self, x, dim, prefix):
        for b in range(self.num_res_blocks):
            x = BottleneckBlock(dim, dim, int(dim * 2), name=f"{prefix}_{b}")(x)
        return x

    def _down(self, x, l):
        out_dim = self.feature_dims[l + 1] if l < len(self.feature_dims) - 1 else self.feature_dims[l]
        x = _msra_conv(out_dim, 1, name=f"downsample_layers_{l}")(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return nn.relu(x)


@ARCH_REGISTRY.register()
class PromptIR_DC(_DCBase):
    """Classifier probe with LQ-image conv stem (degrad_classify_arch.py:481-555)."""

    @nn.compact
    def __call__(self, lq: jax.Array, features: Sequence[jax.Array], deterministic: bool = True) -> jax.Array:
        lq_feats = nn.Conv(
            self.feature_dims[0], (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), name="conv_embed_0"
        )(lq)
        lq_feats = LayerNorm2d(self.feature_dims[0], name="conv_embed_1")(lq_feats)

        mixing = self.param("mixing_weights", nn.initializers.ones, (len(self.feature_dims),))
        mixing = jax.nn.softmax(mixing)
        for i, feature in enumerate(features):
            lq_feats = self._stage(lq_feats + mixing[i] * feature, self.feature_dims[i], f"bottleneck_layers_{i}")
            lq_feats = self._down(lq_feats, i)
        lq_feats = self._stage(lq_feats, self.feature_dims[-1], "last_stage")
        pooled = jnp.mean(lq_feats, axis=(1, 2))
        return nn.Dense(self.num_classes, name="fc")(pooled)


@ARCH_REGISTRY.register()
class PromptIR_NoImg_DC(_DCBase):
    """Classifier probe from features alone (degrad_classify_arch.py:559-641)."""

    downsample: bool = False

    @nn.compact
    def __call__(self, lq: jax.Array, features: Sequence[jax.Array], deterministic: bool = True) -> jax.Array:
        features = list(features)
        if self.downsample:
            # (B, N, C) token features → square NHWC maps, level i shrunk 1/2^i
            for i, f in enumerate(features):
                if f.ndim == 3:
                    b, n, c = f.shape
                    s = int(math.sqrt(n))
                    features[i] = f.reshape(b, s, s, c)
            for i in range(1, len(features)):
                f = features[i]
                b, h, w, c = f.shape
                scale = 2**i
                features[i] = jax.image.resize(f, (b, h // scale, w // scale, c), method="nearest")

        mixing = self.param("mixing_weights", nn.initializers.ones, (len(self.feature_dims),))
        mixing = jax.nn.softmax(mixing)
        lq_feats = 0.0
        for i, feature in enumerate(features):
            lq_feats = self._stage(lq_feats + mixing[i] * feature, self.feature_dims[i], f"bottleneck_layers_{i}")
            lq_feats = self._down(lq_feats, i)
        lq_feats = self._stage(lq_feats, self.feature_dims[-1], "last_stage")
        pooled = jnp.mean(lq_feats, axis=(1, 2))
        return nn.Dense(self.num_classes, name="fc")(pooled)


_DC_RENAMES = [
    (_re.compile(r"^conv_embed\.(\d+)\."), r"conv_embed_\1."),
    (_re.compile(r"^bottleneck_layers\.(\d+)\.(\d+)\."), r"bottleneck_layers_\1_\2."),
    (_re.compile(r"^last_stage\.(\d+)\."), r"last_stage_\1."),
    (_re.compile(r"^downsample_layers\.(\d+)\.0\."), r"downsample_layers_\1."),
    (_re.compile(r"\.(conv1|conv2|conv3|shortcut)\.norm\."), r".\1_norm."),
]


def torch_key_map(key: str) -> str:
    for pat, repl in _DC_RENAMES:
        key = pat.sub(repl, key)
    return key


PromptIR_DC.torch_key_map = staticmethod(torch_key_map)
PromptIR_NoImg_DC.torch_key_map = staticmethod(torch_key_map)
