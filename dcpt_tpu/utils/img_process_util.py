"""filter2D + unsharp-mask sharpening (reference: basicsr/utils/img_process_util.py).

``filter2D`` is the jnp/NHWC twin of the reference's torch version (per-batch
kernels via grouped conv, reflect padding); ``usm_sharp`` is the host numpy/cv2
variant; ``USMSharp`` is the on-device module form.
"""

from __future__ import annotations

import cv2
import numpy as np

import jax
import jax.numpy as jnp


def filter2D(img: jax.Array, kernel: jax.Array) -> jax.Array:
    """Depthwise 2-D filtering over NHWC with reflect padding.

    kernel: (1, k, k) shared across the batch, or (b, k, k) per-sample.
    """
    k = kernel.shape[-1]
    if k % 2 != 1:
        raise ValueError("Wrong kernel size")
    b, h, w, c = img.shape
    pad = k // 2
    img_p = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")

    if kernel.shape[0] == 1:
        kern = jnp.tile(kernel[0][:, :, None, None], (1, 1, 1, c))
        return jax.lax.conv_general_dilated(
            img_p, kern, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c
        )
    # per-sample kernels: fold batch into channels and group-conv
    img_p = img_p.transpose(1, 2, 0, 3).reshape(1, h + 2 * pad, w + 2 * pad, b * c)
    kern = jnp.repeat(kernel, c, axis=0).transpose(1, 2, 0)[:, :, None, :]  # (k,k,1,b*c)
    out = jax.lax.conv_general_dilated(
        img_p, kern, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=b * c
    )
    return out.reshape(h, w, b, c).transpose(2, 0, 1, 3)


def usm_sharp(img: np.ndarray, weight: float = 0.5, radius: int = 50, threshold: int = 10) -> np.ndarray:
    """Host USM sharpening on HWC float [0,1] (reference: img_process_util.py:34-60)."""
    if radius % 2 == 0:
        radius += 1
    blur = cv2.GaussianBlur(img, (radius, radius), 0)
    residual = img - blur
    mask = (np.abs(residual) * 255 > threshold).astype("float32")
    soft_mask = cv2.GaussianBlur(mask, (radius, radius), 0)
    sharp = np.clip(img + weight * residual, 0, 1)
    return soft_mask * sharp + (1 - soft_mask) * img


class USMSharp:
    """On-device USM sharpener over NHWC batches (reference: img_process_util.py:63-82)."""

    def __init__(self, radius: int = 50, sigma: float = 0):
        if radius % 2 == 0:
            radius += 1
        self.radius = radius
        kernel = cv2.getGaussianKernel(radius, sigma)
        self.kernel = jnp.asarray(np.dot(kernel, kernel.transpose()), dtype=jnp.float32)[None]

    def __call__(self, img: jax.Array, weight: float = 0.5, threshold: int = 10) -> jax.Array:
        blur = filter2D(img, self.kernel)
        residual = img - blur
        mask = (jnp.abs(residual) * 255 > threshold).astype(img.dtype)
        soft_mask = filter2D(mask, self.kernel)
        sharp = jnp.clip(img + weight * residual, 0, 1)
        return soft_mask * sharp + (1 - soft_mask) * img
