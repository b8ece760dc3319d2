"""Image I/O and host↔device conversion.

Reference semantics: ``basicsr/utils/img_util.py:11-200``, re-oriented for TPU:
device arrays are **NHWC float32 in [0, 1]** (TPU-native layout); host images are
HWC numpy BGR uint8/float32 exactly as cv2 produces them.  The BGR→RGB flip and
the layout normalisation happen in ``img2tensor`` / ``tensor2img`` only.
"""

from __future__ import annotations

import os

import cv2
import numpy as np


def imfrombytes(content: bytes, flag: str = "color", depth: int = 8, float32: bool = False) -> np.ndarray:
    """Decode an image byte buffer (reference: img_util.py:126-153).

    ``flag``: color | grayscale | unchanged; grayscale gains a channel axis.
    ``depth``: 8 or 16 — byte-buffer dtype for decode.
    """
    dtype = np.uint16 if depth == 16 else np.uint8
    img_np = np.frombuffer(content, dtype)
    imread_flags = {
        "color": cv2.IMREAD_COLOR,
        "grayscale": cv2.IMREAD_GRAYSCALE,
        "unchanged": cv2.IMREAD_UNCHANGED,
    }
    img = cv2.imdecode(img_np, imread_flags[flag])
    if flag == "grayscale":
        img = img[..., np.newaxis]
    if float32:
        if img.dtype == np.uint8 and img.ndim == 3:
            from ..native import u8_to_f32

            img = u8_to_f32(img, swap_rb=False)  # keep BGR; one fused native pass
        else:
            img = img.astype(np.float32) / 255.0
    return img


def img2tensor(imgs, bgr2rgb: bool = True, float32: bool = True):
    """HWC BGR numpy image(s) → HWC RGB float arrays ready for ``jnp.asarray``.

    The reference (img_util.py:11-37) returns CHW torch tensors; the TPU-native
    layout is HWC, so we keep HWC and only handle colour order + dtype here.
    """

    def _totensor(img):
        if img.ndim == 2:
            img = img[..., None]
        if img.shape[2] == 3 and bgr2rgb:
            if img.dtype == np.float64:
                img = img.astype(np.float32)
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if float32:
            img = img.astype(np.float32)
        return np.ascontiguousarray(img)

    if isinstance(imgs, list):
        return [_totensor(img) for img in imgs]
    return _totensor(imgs)


def tensor2img(tensor, rgb2bgr: bool = True, out_type=np.uint8, min_max: tuple = (0, 1)):
    """Device array(s) → HWC BGR uint8/uint16/float numpy image(s).

    Accepts NHWC / HWC / HW arrays (jnp or np); squeezes a singleton batch.
    Matches the reference conversion contract (img_util.py:40-106): clamp to
    ``min_max``, rescale to [0, 1], round at the target bit depth.
    """

    def _toimg(t):
        img_np = np.asarray(t, dtype=np.float32)
        if img_np.ndim == 4:
            if img_np.shape[0] != 1:
                raise ValueError(f"Only singleton batches convert to one image, got {img_np.shape}")
            img_np = img_np[0]
        if img_np.ndim == 2:
            img_np = img_np[..., None]
        # fused native fast path for the common save case
        if out_type == np.uint8 and rgb2bgr and min_max == (0, 1) and img_np.shape[2] == 3:
            from ..native import f32_to_u8_bgr

            return f32_to_u8_bgr(np.ascontiguousarray(img_np))
        img_np = np.clip(img_np, min_max[0], min_max[1])
        img_np = (img_np - min_max[0]) / (min_max[1] - min_max[0])
        if img_np.shape[2] == 3 and rgb2bgr:
            img_np = cv2.cvtColor(img_np, cv2.COLOR_RGB2BGR)
        elif img_np.shape[2] == 1:
            img_np = img_np[:, :, 0]
        if out_type == np.uint8:
            img_np = (img_np * 255.0).round()
        elif out_type == np.uint16:
            img_np = (img_np * 65535.0).round()
        return img_np.astype(out_type)

    if isinstance(tensor, (list, tuple)):
        return [_toimg(t) for t in tensor]
    return _toimg(tensor)


def tensor2img_fast(tensor, rgb2bgr: bool = True, min_max: tuple = (0, 1)):
    """Single-image fast path: (1, H, W, C) device array → HWC BGR uint8.

    Reference: img_util.py:109-123.  Matches its semantics exactly,
    including the deliberate difference from ``tensor2img``: the uint8 cast
    TRUNCATES (torch ``.type(torch.uint8)``) instead of rounding — that is
    what makes it "fast", and outputs can differ by 1 LSB from tensor2img.
    """
    img_np = np.asarray(tensor, dtype=np.float32)
    if img_np.ndim == 4:
        if img_np.shape[0] != 1:
            raise ValueError(f"tensor2img_fast supports (1, h, w, c) only, got {img_np.shape}")
        img_np = img_np[0]
    img_np = np.clip(img_np, min_max[0], min_max[1])
    img_np = (img_np - min_max[0]) / (min_max[1] - min_max[0]) * 255
    img_np = img_np.astype(np.uint8)  # truncating cast, as the reference
    if rgb2bgr:
        img_np = cv2.cvtColor(img_np, cv2.COLOR_RGB2BGR)
    return img_np


def imwrite(img: np.ndarray, file_path: str, params=None, auto_mkdir: bool = True) -> None:
    """cv2.imwrite with parent-dir creation (reference: img_util.py:156-179)."""
    if auto_mkdir:
        dir_name = os.path.abspath(os.path.dirname(file_path))
        os.makedirs(dir_name, exist_ok=True)
    ok = cv2.imwrite(file_path, img, params or [])
    if not ok:
        raise IOError(f"Failed to write image to {file_path}")


def crop_border(imgs, crop_border: int):
    """Crop ``crop_border`` pixels from each image edge (reference: img_util.py:182-200)."""
    if crop_border == 0:
        return imgs
    if isinstance(imgs, list):
        return [v[crop_border:-crop_border, crop_border:-crop_border, ...] for v in imgs]
    return imgs[crop_border:-crop_border, crop_border:-crop_border, ...]
