"""Crop / augment primitives (reference: basicsr/data/transforms.py), numpy HWC."""

from __future__ import annotations

import random

import cv2
import numpy as np


def mod_crop(img: np.ndarray, scale: int) -> np.ndarray:
    """Crop H, W down to multiples of scale (reference: transforms.py:7-24)."""
    img = img.copy()
    if img.ndim in (2, 3):
        h, w = img.shape[0], img.shape[1]
        img = img[: h - h % scale, : w - w % scale, ...]
    else:
        raise ValueError(f"Wrong img ndim: {img.ndim}.")
    return img


def center_crop(img: np.ndarray, size: int) -> np.ndarray:
    """Centered size×size crop (reference: transforms.py:27-45)."""
    img = img.copy()
    if img.ndim in (2, 3):
        h, w = img.shape[0], img.shape[1]
        img = img[(h - size) // 2 : (h + size) // 2, (w - size) // 2 : (w + size) // 2, ...]
    else:
        raise ValueError(f"Wrong img ndim: {img.ndim}.")
    return img


def paired_random_crop(img_gts, img_lqs, gt_patch_size: int, scale: int, gt_path=None):
    """Scale-aware paired random crop, list-capable (reference: transforms.py:48-129)."""
    if not isinstance(img_gts, list):
        img_gts = [img_gts]
    if not isinstance(img_lqs, list):
        img_lqs = [img_lqs]

    h_lq, w_lq = img_lqs[0].shape[0:2]
    h_gt, w_gt = img_gts[0].shape[0:2]
    lq_patch_size = gt_patch_size // scale

    if h_gt != h_lq * scale or w_gt != w_lq * scale:
        raise ValueError(
            f"Scale mismatches. GT ({h_gt}, {w_gt}) is not {scale}x multiplication of LQ ({h_lq}, {w_lq})."
        )
    if h_lq < lq_patch_size or w_lq < lq_patch_size:
        raise ValueError(
            f"LQ ({h_lq}, {w_lq}) is smaller than patch size ({lq_patch_size}, {lq_patch_size}). Please remove {gt_path}."
        )

    top = random.randint(0, h_lq - lq_patch_size)
    left = random.randint(0, w_lq - lq_patch_size)

    img_lqs = [v[top : top + lq_patch_size, left : left + lq_patch_size, ...] for v in img_lqs]
    top_gt, left_gt = int(top * scale), int(left * scale)
    img_gts = [v[top_gt : top_gt + gt_patch_size, left_gt : left_gt + gt_patch_size, ...] for v in img_gts]

    if len(img_gts) == 1:
        img_gts = img_gts[0]
    if len(img_lqs) == 1:
        img_lqs = img_lqs[0]
    return img_gts, img_lqs


def augment(imgs, hflip: bool = True, rotation: bool = True, flows=None, return_status: bool = False):
    """hflip OR vflip, plus transpose "rotation" — the reference's exact scheme
    (transforms.py:132-195): one flip draw in {h, v, none} and one transpose
    draw, shared across all images in the list.
    """
    flip_ran = random.randint(0, 2)
    rot_ran = random.randint(0, 3)

    def _augment(img):
        if flip_ran == 0:  # horizontal
            img = img[:, ::-1, ...].copy()
        if flip_ran == 1:  # vertical
            img = img[::-1, :, ...].copy()
        if rot_ran != 0:
            img = img.transpose(1, 0, 2).copy() if img.ndim == 3 else img.transpose(1, 0).copy()
        return img

    def _augment_flow(flow):
        if flip_ran == 0:
            flow = flow[:, ::-1, :].copy()
            flow[:, :, 0] *= -1
        if flip_ran == 1:
            flow = flow[::-1, :, :].copy()
            flow[:, :, 1] *= -1
        if rot_ran != 0:
            flow = flow.transpose(1, 0, 2)
            flow = flow[:, :, [1, 0]]
        return flow

    if not isinstance(imgs, list):
        imgs = [imgs]
    imgs = [_augment(img) for img in imgs]
    if len(imgs) == 1:
        imgs = imgs[0]

    if flows is not None:
        if not isinstance(flows, list):
            flows = [flows]
        flows = [_augment_flow(flow) for flow in flows]
        if len(flows) == 1:
            flows = flows[0]
        return imgs, flows
    if return_status:
        return imgs, (flip_ran == 0, flip_ran == 1, rot_ran != 0)
    return imgs


def img_rotate(img: np.ndarray, angle: float, center=None, scale: float = 1.0) -> np.ndarray:
    """cv2 warp-affine rotation (reference: transforms.py:198-216)."""
    h, w = img.shape[:2]
    if center is None:
        center = (w // 2, h // 2)
    matrix = cv2.getRotationMatrix2D(center, angle, scale)
    return cv2.warpAffine(img, matrix, (w, h))
