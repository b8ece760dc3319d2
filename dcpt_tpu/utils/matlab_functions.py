"""MATLAB-faithful bicubic ``imresize`` (vectorized numpy).

Implements the exact MATLAB algorithm (cubic kernel with a=-0.5, antialiasing by
kernel dilation when downscaling, symmetric boundary handling) so that metrics
like NIQE that depend on MATLAB semantics reproduce the reference
(``basicsr/utils/matlab_functions.py:7-186``) bit-for-bit.
"""

from __future__ import annotations

import numpy as np


def cubic(x: np.ndarray) -> np.ndarray:
    """The MATLAB bicubic kernel (a = -0.5)."""
    absx = np.abs(x)
    absx2 = absx**2
    absx3 = absx**3
    f1 = (1.5 * absx3 - 2.5 * absx2 + 1) * (absx <= 1)
    f2 = (-0.5 * absx3 + 2.5 * absx2 - 4 * absx + 2) * ((absx > 1) & (absx <= 2))
    return f1 + f2


def calculate_weights_indices(in_length: int, out_length: int, scale: float, kernel_width: float, antialiasing: bool):
    """Per-output-pixel contribution weights and source indices (MATLAB ``contributions``)."""
    if (scale < 1) and antialiasing:
        # widen the kernel when downscaling to act as a low-pass filter
        kernel_width = kernel_width / scale

    x = np.arange(1, out_length + 1, dtype=np.float64)
    # output-space coordinate mapped back into input space (MATLAB convention)
    u = x / scale + 0.5 * (1 - 1 / scale)
    left = np.floor(u - kernel_width / 2)
    p = int(np.ceil(kernel_width)) + 2

    indices = left[:, None] + np.arange(p)[None, :]  # (out_length, p), 1-based
    dist = u[:, None] - indices
    if (scale < 1) and antialiasing:
        weights = scale * cubic(dist * scale)
    else:
        weights = cubic(dist)
    weights = weights / np.sum(weights, axis=1, keepdims=True)

    # symmetric (mirror) boundary handling via the aux-index trick
    aux = np.concatenate((np.arange(1, in_length + 1), np.arange(in_length, 0, -1)))
    indices = aux[np.mod(indices.astype(np.int64) - 1, aux.size)]

    # trim all-zero leading/trailing weight columns
    if not np.any(weights[:, 0]):
        indices = indices[:, 1:]
        weights = weights[:, 1:]
    if weights.shape[1] > 1 and not np.any(weights[:, -1]):
        indices = indices[:, :-1]
        weights = weights[:, :-1]
    return weights, indices.astype(np.int64) - 1  # 0-based


def imresize(img: np.ndarray, scale: float, antialiasing: bool = True) -> np.ndarray:
    """Resize HW or HWC float images exactly like MATLAB ``imresize(..., 'bicubic')``."""
    squeeze = False
    if img.ndim == 2:
        img = img[:, :, None]
        squeeze = True
    in_h, in_w, c = img.shape
    out_h, out_w = int(np.ceil(in_h * scale)), int(np.ceil(in_w * scale))
    kernel_width = 4.0

    weights_h, indices_h = calculate_weights_indices(in_h, out_h, scale, kernel_width, antialiasing)
    weights_w, indices_w = calculate_weights_indices(in_w, out_w, scale, kernel_width, antialiasing)

    img = img.astype(np.float64)
    # resize along H: gather (out_h, p, w, c) then weight-sum over p
    out = np.einsum("op,opwc->owc", weights_h, img[indices_h, :, :])
    # resize along W
    out = np.einsum("op,hopc->hoc", weights_w, out[:, indices_w, :])
    if squeeze:
        out = out[:, :, 0]
    return out
