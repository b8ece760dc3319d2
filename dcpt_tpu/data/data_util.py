"""Path builders + misc data helpers (reference: basicsr/data/data_util.py).

Video-SR legacy helpers (frame-index utilities, duf_downsample) are not ported
— they are unused by this framework's task set (SURVEY §7 "not ported").
"""

from __future__ import annotations

import os
from os import path as osp

import numpy as np


def prctile_norm(x: np.ndarray, min_prc: float = 0, max_prc: float = 100) -> np.ndarray:
    """Percentile normalisation to [0, 1] (reference: data_util.py:13-19)."""
    y = (x - np.percentile(x, min_prc)) / (np.percentile(x, max_prc) - np.percentile(x, min_prc) + 1e-10)
    y[y > 1] = 1
    y[y < 0] = 0
    return y


def paired_paths_from_lmdb(folders, keys, filename_tmpl=None):
    """Paired lmdb keys from meta_info.txt (reference: data_util.py:111-187)."""
    assert len(folders) == 2, f"The len of folders should be 2 with [input_folder, gt_folder]. But got {len(folders)}"
    assert len(keys) == 2, f"The len of keys should be 2 with [input_key, gt_key]. But got {len(keys)}"
    input_folder, gt_folder = folders
    input_key, gt_key = keys

    if not (input_folder.endswith(".lmdb") and gt_folder.endswith(".lmdb")):
        raise ValueError(
            f"{input_key} folder and {gt_key} folder should both in lmdb formats. "
            f"But received {input_key}: {input_folder}; {gt_key}: {gt_folder}"
        )
    with open(osp.join(input_folder, "meta_info.txt")) as fin:
        input_lmdb_keys = [line.split(".")[0] for line in fin]
    with open(osp.join(gt_folder, "meta_info.txt")) as fin:
        gt_lmdb_keys = [line.split(".")[0] for line in fin]
    if set(input_lmdb_keys) != set(gt_lmdb_keys):
        raise ValueError(f"Keys in {input_key}_folder and {gt_key}_folder are different.")
    return [{f"{input_key}_path": k, f"{gt_key}_path": k} for k in sorted(input_lmdb_keys)]


def paired_paths_from_meta_info_file(folders, keys, meta_info_file, filename_tmpl):
    """Paired paths from a meta-info txt (reference: data_util.py:190-237)."""
    assert len(folders) == 2
    assert len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys

    with open(meta_info_file, "r") as fin:
        gt_names = [line.strip().split(" ")[0] for line in fin]

    paths = []
    for gt_name in gt_names:
        basename, ext = osp.splitext(osp.basename(gt_name))
        input_name = f"{filename_tmpl.format(basename)}{ext}"
        paths.append(
            {f"{input_key}_path": osp.join(input_folder, input_name), f"{gt_key}_path": osp.join(gt_folder, gt_name)}
        )
    return paths


def paired_paths_from_folder(folders, keys, filename_tmpl, multi: bool = False):
    """Paired paths from two folders, incl. the reference's ``_HR_``→``_LRBI_``
    rename hack (data_util.py:240-294)."""
    assert len(folders) == 2
    assert len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys

    input_paths = os.listdir(input_folder)
    gt_paths = os.listdir(gt_folder)
    assert len(input_paths) == len(gt_paths), (
        f"{input_key} and {gt_key} datasets have different number of images: {len(input_paths)}, {len(gt_paths)}."
    )
    paths = []
    input_paths_set = set(input_paths)
    for gt_path in gt_paths:
        basename, ext = osp.splitext(osp.basename(gt_path))
        if multi:
            input_name = f"{filename_tmpl.format(basename)}"
        else:
            input_name = f"{filename_tmpl.format(basename)}{ext}"
        if "_HR_" in input_name:
            input_name = input_name.replace("_HR_", "_LRBI_")
        assert input_name in input_paths_set, f"{input_name} is not in {input_key}_paths."
        paths.append(
            {f"{input_key}_path": osp.join(input_folder, input_name), f"{gt_key}_path": osp.join(gt_folder, gt_path)}
        )
    return paths


def paths_from_folder(folder):
    """All file paths in a folder (reference: data_util.py:297-310)."""
    return [osp.join(folder, path) for path in os.listdir(folder)]


def paths_from_lmdb(folder):
    """lmdb keys from meta_info.txt (reference: data_util.py:313-330)."""
    if not folder.endswith(".lmdb"):
        raise ValueError(f"Folder {folder} should be in lmdb format.")
    with open(osp.join(folder, "meta_info.txt")) as fin:
        return [line.split(".")[0] for line in fin]


class MixUp_AUG:
    """Beta(1.2, 1.2) mixup over a batch (reference: data_util.py:383-409), jnp."""

    def __init__(self, alpha: float = 1.2):
        self.alpha = alpha

    def aug(self, key, rgb_gt, rgb_noisy):
        import jax
        import jax.numpy as jnp

        bs = rgb_gt.shape[0]
        k1, k2 = jax.random.split(key)
        indices = jax.random.permutation(k1, bs)
        lam = jax.random.beta(k2, self.alpha, self.alpha, (bs, 1, 1, 1))
        rgb_gt = lam * rgb_gt + (1 - lam) * rgb_gt[indices]
        rgb_noisy = lam * rgb_noisy + (1 - lam) * rgb_noisy[indices]
        return rgb_gt, rgb_noisy
