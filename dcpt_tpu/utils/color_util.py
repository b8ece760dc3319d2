"""Colorspace conversions, MATLAB-faithful (ITU-R BT.601 studio-swing YCbCr).

Reference semantics: ``basicsr/utils/color_util.py:5-254``.  Both numpy (host,
bit-parity with the reference / MATLAB) and jnp (on-device) variants are provided.
Inputs are float32 in [0, 1] or uint8 in [0, 255]; float outputs keep the input
range convention of MATLAB's rgb2ycbcr (Y in [16, 235] for [0,255] inputs).
"""

from __future__ import annotations

import numpy as np

# MATLAB rgb2ycbcr matrix (rows produce Y, Cb, Cr from R, G, B), plus offsets.
_RGB2YCBCR_MAT = np.array(
    [
        [65.481, -37.797, 112.0],
        [128.553, -74.203, -93.786],
        [24.966, 112.0, -18.214],
    ]
)
_YCBCR_OFFSET = np.array([16, 128, 128])


def _convert_input_type_range(img: np.ndarray) -> tuple[np.ndarray, str]:
    img_type = img.dtype
    img = img.astype(np.float32)
    if img_type == np.float32:
        pass
    elif img_type == np.uint8:
        img /= 255.0
    else:
        raise TypeError(f"The img type should be np.float32 or np.uint8, but got {img_type}")
    return img, str(img_type)


def _convert_output_type_range(img: np.ndarray, dst_type: str) -> np.ndarray:
    if dst_type == "uint8":
        return img.round().astype(np.uint8)
    return (img / 255.0).astype(np.float32)


def rgb2ycbcr(img: np.ndarray, y_only: bool = False) -> np.ndarray:
    """RGB → YCbCr, MATLAB-equivalent (reference: color_util.py:5-41)."""
    img, img_type = _convert_input_type_range(img)
    if y_only:
        out = np.dot(img, _RGB2YCBCR_MAT[:, 0]) + 16.0
    else:
        out = np.matmul(img, _RGB2YCBCR_MAT) + _YCBCR_OFFSET
    return _convert_output_type_range(out, img_type)


def bgr2ycbcr(img: np.ndarray, y_only: bool = False) -> np.ndarray:
    """BGR → YCbCr, MATLAB-equivalent (reference: color_util.py:44-80)."""
    img, img_type = _convert_input_type_range(img)
    if y_only:
        out = np.dot(img, _RGB2YCBCR_MAT[::-1, 0]) + 16.0
    else:
        out = np.matmul(img, _RGB2YCBCR_MAT[::-1]) + _YCBCR_OFFSET
    return _convert_output_type_range(out, img_type)


def ycbcr2rgb(img: np.ndarray) -> np.ndarray:
    """YCbCr → RGB, MATLAB-equivalent (reference: color_util.py:83-118)."""
    img, img_type = _convert_input_type_range(img)
    img = img * 255.0
    inv = np.linalg.inv(_RGB2YCBCR_MAT / 255.0)
    out = np.matmul(img - _YCBCR_OFFSET, inv)
    return _convert_output_type_range(out, img_type)


def ycbcr2bgr(img: np.ndarray) -> np.ndarray:
    """YCbCr → BGR, MATLAB-equivalent (reference: color_util.py:122-157)."""
    return ycbcr2rgb(img)[..., ::-1].copy()


def rgb2ycbcr_jnp(img, y_only: bool = False):
    """On-device RGB → YCbCr for NHWC float tensors in [0, 1].

    Output is normalised back to [0, 1] like the reference's ``rgb2ycbcr_pt``
    (color_util.py:222-254).
    """
    import jax.numpy as jnp

    if y_only:
        weight = jnp.asarray(_RGB2YCBCR_MAT[:, 0], dtype=img.dtype)
        out = img @ weight + 16.0
        out = out[..., None]
    else:
        weight = jnp.asarray(_RGB2YCBCR_MAT, dtype=img.dtype)
        bias = jnp.asarray(_YCBCR_OFFSET, dtype=img.dtype)
        out = img @ weight + bias
    return out / 255.0
