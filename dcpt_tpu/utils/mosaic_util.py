"""Bayer CFA mosaic synthesis + demosaicking (reference: basicsr/utils/mosaic_util.py).

``mosaic_CFA_Bayer`` is the host-side (numpy, uint8) synthesis used by the
mosaic dataset; ``dm_bilinear`` is an on-device jnp bilinear demosaic, the
TPU-native port of the reference's torch ``dm`` (mosaic_util.py:13-35).
"""

from __future__ import annotations

import numpy as np


def masks_CFA_Bayer(shape) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """RGGB Bayer masks (reference: mosaic_util.py:124-129)."""
    pattern = "RGGB"
    channels = {channel: np.zeros(shape) for channel in "RGB"}
    for channel, (y, x) in zip(pattern, [(0, 0), (0, 1), (1, 0), (1, 1)]):
        channels[channel][y::2, x::2] = 1
    return tuple(channels[c].astype(bool) for c in "RGB")


def mosaic_CFA_Bayer(rgb: np.ndarray):
    """RGB uint8 HWC → (CFA, CFA4, mosaic, mask) (reference: mosaic_util.py:132-147)."""
    r_m, g_m, b_m = masks_CFA_Bayer(rgb.shape[0:2])
    mask = np.concatenate((r_m[..., None], g_m[..., None], b_m[..., None]), axis=-1)
    mosaic = np.multiply(mask, rgb)
    cfa = mosaic.sum(2).astype(np.uint8)

    cfa4 = np.zeros((rgb.shape[0] // 2, rgb.shape[1] // 2, 4), dtype=np.uint8)
    cfa4[:, :, 0] = cfa[0::2, 0::2]
    cfa4[:, :, 1] = cfa[0::2, 1::2]
    cfa4[:, :, 2] = cfa[1::2, 0::2]
    cfa4[:, :, 3] = cfa[1::2, 1::2]
    return cfa, cfa4, mosaic, mask


def dm_bilinear(cfa, mask):
    """Bilinear demosaic of an NHWC 1-channel CFA given the NHWC 3-channel mask.

    jnp port of the reference's torch ``dm`` (mosaic_util.py:13-35): G through a
    4-neighbour kernel/4, R/B through the 3×3 bilinear kernel/4.
    """
    import jax
    import jax.numpy as jnp

    kernel_g = jnp.asarray([[0.0, 1.0, 0.0], [1.0, 4.0, 1.0], [0.0, 1.0, 0.0]]) / 4.0
    kernel_rb = jnp.asarray([[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]]) / 4.0

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x,
            k[:, :, None, None],
            window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    r = conv(cfa * mask[..., 0:1], kernel_rb)
    g = conv(cfa * mask[..., 1:2], kernel_g)
    b = conv(cfa * mask[..., 2:3], kernel_rb)
    return jnp.concatenate([r, g, b], axis=-1)
