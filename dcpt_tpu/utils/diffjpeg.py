"""Differentiable JPEG encode/decode in jnp (NHWC, batched, jittable).

Port of the reference's ``basicsr/utils/diffjpeg.py`` (itself from
mlomnitz/DiffJPEG): RGB→YCbCr with JPEG constants, 2×2 chroma mean-pool,
8×8 block DCT, (differentiable-)rounded quantization with the standard
luma/chroma tables, then the inverse chain.  Matches the reference module
numerically (tables stored transposed exactly as there, diffjpeg.py:15-34).
"""

from __future__ import annotations

import itertools

import numpy as np

import jax
import jax.numpy as jnp

Y_TABLE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float32,
).T

C_TABLE = np.full((8, 8), 99, dtype=np.float32)
C_TABLE[:4, :4] = np.array(
    [[17, 18, 24, 47], [18, 21, 26, 66], [24, 26, 56, 99], [47, 66, 99, 99]], dtype=np.float32
).T

_DCT = np.zeros((8, 8, 8, 8), dtype=np.float32)
for _x, _y, _u, _v in itertools.product(range(8), repeat=4):
    _DCT[_x, _y, _u, _v] = np.cos((2 * _x + 1) * _u * np.pi / 16) * np.cos((2 * _y + 1) * _v * np.pi / 16)
_ALPHA = np.array([1.0 / np.sqrt(2)] + [1] * 7, dtype=np.float32)
_DCT_SCALE = np.outer(_ALPHA, _ALPHA) * 0.25
_IDCT = _DCT.transpose(2, 3, 0, 1)

_RGB2YCBCR = np.array(
    [[0.299, 0.587, 0.114], [-0.168736, -0.331264, 0.5], [0.5, -0.418688, -0.081312]], dtype=np.float32
).T
_YCBCR2RGB = np.array([[1.0, 0.0, 1.402], [1, -0.344136, -0.714136], [1, 1.772, 0]], dtype=np.float32).T


def diff_round(x):
    """round(x) + (x − round(x))³ — smooth gradient (diffjpeg.py:37-39)."""
    r = jnp.round(x)
    return r + (x - r) ** 3


def quality_to_factor(quality):
    """JPEG quality → quantization factor (diffjpeg.py:42-56)."""
    quality = jnp.asarray(quality, jnp.float32)
    q = jnp.where(quality < 50, 5000.0 / quality, 200.0 - quality * 2)
    return q / 100.0


def _blocks(x: jax.Array) -> jax.Array:
    """(B, H, W) → (B, H·W/64, 8, 8)."""
    b, h, w = x.shape
    x = x.reshape(b, h // 8, 8, w // 8, 8)
    return x.transpose(0, 1, 3, 2, 4).reshape(b, -1, 8, 8)


def _merge(x: jax.Array, h: int, w: int) -> jax.Array:
    b = x.shape[0]
    x = x.reshape(b, h // 8, w // 8, 8, 8)
    return x.transpose(0, 1, 3, 2, 4).reshape(b, h, w)


def _dct8x8(x: jax.Array) -> jax.Array:
    return jnp.asarray(_DCT_SCALE) * jnp.tensordot(x - 128.0, jnp.asarray(_DCT), axes=2)


def _idct8x8(x: jax.Array) -> jax.Array:
    x = x * jnp.asarray(np.outer(_ALPHA, _ALPHA))
    return 0.25 * jnp.tensordot(x, jnp.asarray(_IDCT), axes=2) + 128.0


class DiffJPEG:
    """Batched differentiable JPEG over NHWC RGB float [0, 1] (diffjpeg.py:476-547)."""

    def __init__(self, differentiable: bool = True):
        self.rounding = diff_round if differentiable else jnp.round

    def __call__(self, x: jax.Array, quality) -> jax.Array:
        factor = quality_to_factor(quality)
        if factor.ndim == 0:
            factor = factor[None]
        b, h, w, c = x.shape
        factor = jnp.broadcast_to(factor, (b,)).reshape(b, 1, 1, 1)

        if c == 1:
            x = jnp.tile(x, (1, 1, 1, 3))
        h_pad = (16 - h % 16) % 16
        w_pad = (16 - w % 16) % 16
        x = jnp.pad(x, ((0, 0), (0, h_pad), (0, w_pad), (0, 0)))
        hh, ww = h + h_pad, w + w_pad

        # compress
        ycbcr = x * 255.0 @ jnp.asarray(_RGB2YCBCR) + jnp.asarray([0.0, 128.0, 128.0])
        y = ycbcr[..., 0]
        cb = ycbcr[..., 1].reshape(b, hh // 2, 2, ww // 2, 2).mean(axis=(2, 4))
        cr = ycbcr[..., 2].reshape(b, hh // 2, 2, ww // 2, 2).mean(axis=(2, 4))

        comps = {}
        for name, comp, table in (("y", y, Y_TABLE), ("cb", cb, C_TABLE), ("cr", cr, C_TABLE)):
            q = self.rounding(_dct8x8(_blocks(comp)) / (jnp.asarray(table) * factor))
            comps[name] = q

        # decompress
        out = {}
        for name, comp, table in (("y", comps["y"], Y_TABLE), ("cb", comps["cb"], C_TABLE), ("cr", comps["cr"], C_TABLE)):
            deq = comp * (jnp.asarray(table) * factor)
            size = (hh, ww) if name == "y" else (hh // 2, ww // 2)
            out[name] = _merge(_idct8x8(deq), *size)

        def upsample(t, k=2):
            bb, h2, w2 = t.shape
            return jnp.tile(t[:, :, :, None], (1, 1, k, k)).reshape(bb, h2 * k, w2 * k)

        ycbcr = jnp.stack([out["y"], upsample(out["cb"]), upsample(out["cr"])], axis=-1)
        rgb = (ycbcr + jnp.asarray([0.0, -128.0, -128.0])) @ jnp.asarray(_YCBCR2RGB)
        rgb = jnp.clip(rgb, 0.0, 255.0) / 255.0
        rgb = rgb[:, :h, :w, :]
        if c == 1:
            rgb = jnp.mean(rgb, axis=-1, keepdims=True)
        return rgb
