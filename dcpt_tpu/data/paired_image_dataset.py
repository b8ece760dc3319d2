"""Paired restoration datasets with on-the-fly degradation synthesis.

Torch-free re-implementations of the reference's dataset classes
(``basicsr/data/paired_image_dataset.py``), emitting **HWC RGB float32 numpy**
samples (the TPU-native NHWC layout stacks directly; no CHW transpose).

Synthesis semantics preserved exactly:

* denoise: Gaussian noise, ``sigma_type`` constant/random/choice, seeded
  ``np.random.seed(index)`` in train / ``seed(0)`` in val
  (paired_image_dataset.py:390-402);
* JPEG-CAR: cv2 JPEG encode/decode at ``q_type``/``q_range``
  (paired_image_dataset.py:532-546);
* dehaze: GT name derived as ``lq_name.split('_')[0] + suffix``
  (paired_image_dataset.py:670-671);
* mosaic: Bayer-RGGB CFA + cv2 EA demosaic on RGB uint8
  (paired_image_dataset.py:836-838);
* inpainting: 5-10 random line strokes of thickness 5-10, white or black
  (paired_image_dataset.py:981-1029).
"""

from __future__ import annotations

import os
import random

import cv2
import numpy as np

from ..utils.file_client import FileClient
from ..utils.img_util import imfrombytes
from ..utils.mosaic_util import mosaic_CFA_Bayer
from ..utils.registry import DATASET_REGISTRY
from .data_util import (
    paired_paths_from_folder,
    paired_paths_from_lmdb,
    paired_paths_from_meta_info_file,
    paths_from_folder,
    paths_from_lmdb,
    prctile_norm,
)
from .transforms import augment, center_crop, paired_random_crop


def _normalize(img: np.ndarray, mean, std) -> np.ndarray:
    mean = np.asarray(mean, dtype=img.dtype)
    std = np.asarray(std, dtype=img.dtype)
    return (img - mean) / std


class _BaseDataset:
    """Shared plumbing: io backend, decode modes, flags, normalisation."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.file_client = None
        self.io_backend_opt = dict(opt["io_backend"])
        self.decode = opt.get("decode", True)
        self.mean = opt.get("mean")
        self.std = opt.get("std")
        self.center_crop = opt.get("center_crop")
        self.depth = opt.get("depth", 8)
        self.flag = "grayscale" if opt.get("color") == "y" else "color"
        self.float32 = not opt.get("prctile_norm", False)
        self.filename_tmpl = opt.get("filename_tmpl", "{}")

    def _client(self) -> FileClient:
        if self.file_client is None:
            backend_opt = dict(self.io_backend_opt)
            self.file_client = FileClient(backend_opt.pop("type"), **backend_opt)
        return self.file_client

    def _read(self, path: str, key: str, float32: bool | None = None) -> np.ndarray:
        img_bytes = self._client().get(path, key)
        if self.decode:
            return imfrombytes(
                img_bytes, flag=self.flag, depth=self.depth,
                float32=self.float32 if float32 is None else float32,
            )
        # raw-buffer mode (decode: false): h/w/c header in the first 3 elems
        dtype = np.float32 if self.opt.get("dtype") == "float" else np.uint16
        img = np.frombuffer(img_bytes, dtype=dtype)
        h, w, c = img[0:3]
        out = img[3:].reshape(int(h), int(w), int(c))
        want_float = self.float32 if float32 is None else float32
        if want_float and dtype != np.float32:
            out = out.astype(np.float32) / 255.0
        return out

    def _finish(self, img_gt, img_lq, lq_path, gt_path) -> dict:
        """BGR→RGB, contiguity, optional mean/std normalise; stays HWC."""
        if img_gt.ndim == 2:
            img_gt = img_gt[..., None]
        if img_lq.ndim == 2:
            img_lq = img_lq[..., None]
        img_gt = np.ascontiguousarray(img_gt, dtype=np.float32)
        img_lq = np.ascontiguousarray(img_lq, dtype=np.float32)
        if self.mean is not None or self.std is not None:
            mean = self.mean if self.mean is not None else 0.0
            std = self.std if self.std is not None else 1.0
            img_gt = _normalize(img_gt, mean, std)
            img_lq = _normalize(img_lq, mean, std)
        return {"lq": img_lq, "gt": img_gt, "lq_path": lq_path, "gt_path": gt_path}

    @staticmethod
    def _bgr2rgb(*imgs):
        out = []
        for img in imgs:
            if img.shape[-1] == 3:
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            out.append(img)
        return out if len(out) > 1 else out[0]


@DATASET_REGISTRY.register()
class PairedImageDataset(_BaseDataset):
    """Generic LQ/GT pairs, 3 path modes (reference: paired_image_dataset.py:26-195)."""

    def __init__(self, opt):
        super().__init__(opt)
        self.gt_size = opt.get("gt_size")
        self.gt_folder, self.lq_folder = opt["dataroot_gt"], opt["dataroot_lq"]
        self.scale = opt["scale"]

        if self.io_backend_opt["type"] == "lmdb":
            self.io_backend_opt["db_paths"] = [self.lq_folder, self.gt_folder]
            self.io_backend_opt["client_keys"] = ["lq", "gt"]
            self.paths = paired_paths_from_lmdb([self.lq_folder, self.gt_folder], ["lq", "gt"], self.filename_tmpl)
        elif self.opt.get("meta_info_file") is not None:
            self.paths = paired_paths_from_meta_info_file(
                [self.lq_folder, self.gt_folder], ["lq", "gt"], self.opt["meta_info_file"], self.filename_tmpl
            )
        else:
            self.paths = paired_paths_from_folder(
                [self.lq_folder, self.gt_folder], ["lq", "gt"], self.filename_tmpl, multi=opt.get("multi", False)
            )

    def __getitem__(self, index):
        gt_path = self.paths[index]["gt_path"]
        lq_path = self.paths[index]["lq_path"]
        img_gt = self._read(gt_path, "gt")
        img_lq = self._read(lq_path, "lq")

        if self.opt["phase"] == "train":
            img_gt, img_lq = paired_random_crop(img_gt, img_lq, self.gt_size, self.scale, gt_path)
            img_gt, img_lq = augment([img_gt, img_lq], self.opt["use_hflip"], self.opt["use_rot"])
        elif self.center_crop is not None:
            img_gt = center_crop(img_gt, self.center_crop)
            img_lq = center_crop(img_lq, self.center_crop)

        if self.opt.get("prctile_norm", False):
            img_gt = prctile_norm(img_gt)
            img_lq = prctile_norm(img_lq)

        if self.opt["phase"] != "train":
            img_gt = img_gt[0 : img_lq.shape[0] * self.scale, 0 : img_lq.shape[1] * self.scale, ...]

        if img_gt.shape[-1] == img_lq.shape[-1] == 3:
            img_gt, img_lq = self._bgr2rgb(img_gt, img_lq)
        return self._finish(img_gt, img_lq, lq_path, gt_path)

    def __len__(self):
        return len(self.paths)


@DATASET_REGISTRY.register()
class MultiPairedImageDataset(PairedImageDataset):
    """One GT vs a directory of LQ variants, concatenated channel-wise
    (reference: paired_image_dataset.py:196-275).  NOTE: the reference does
    NOT swap BGR→RGB on this path — preserved here."""

    def __getitem__(self, index):
        gt_path = self.paths[index]["gt_path"]
        img_gt = self._read(gt_path, "gt")

        imgs_lq = []
        lq_path = self.paths[index]["lq_path"]
        for lq_name in os.listdir(lq_path):
            imgs_lq.append(self._read(os.path.join(lq_path, lq_name), "lq"))

        if self.opt["phase"] == "train":
            img_gt, imgs_lq = paired_random_crop(img_gt, imgs_lq, self.gt_size, self.scale, gt_path)
            imgs_lq.append(img_gt)
            imgs_lq = augment(imgs_lq, self.opt["use_hflip"], self.opt["use_rot"])
            img_gt = imgs_lq.pop()

        img_lq = np.concatenate(imgs_lq, axis=-1)
        if self.opt.get("prctile_norm", False):
            img_gt = prctile_norm(img_gt)
            img_lq = prctile_norm(img_lq)
        if self.opt["phase"] != "train":
            img_gt = img_gt[0 : img_lq.shape[0] * self.scale, 0 : img_lq.shape[1] * self.scale, ...]
        sample = self._finish(img_gt, img_lq, lq_path, gt_path)
        return sample


@DATASET_REGISTRY.register()
class PairedImageDenoiseDataset(_BaseDataset):
    """GT-only + synthesized Gaussian noise (reference: paired_image_dataset.py:277-424)."""

    def __init__(self, opt):
        super().__init__(opt)
        self.sigma_type = opt["sigma_type"]
        self.sigma_range = opt["sigma_range"]
        assert self.sigma_type in ["constant", "random", "choice"]
        self.gt_size = opt.get("gt_size", 128)
        self.gt_folder = opt["dataroot_gt"]
        if self.io_backend_opt["type"] == "lmdb":
            self.io_backend_opt["db_paths"] = [self.gt_folder]
            self.io_backend_opt["client_keys"] = ["gt"]
            self.paths = paths_from_lmdb(self.gt_folder)
        else:
            self.paths = paths_from_folder(self.gt_folder)

    def __getitem__(self, index):
        gt_path = self.paths[index]
        img_gt = self._read(gt_path, "gt")
        img_lq = img_gt.copy()

        if self.opt["phase"] == "train":
            img_gt, img_lq = paired_random_crop(img_gt, img_lq, self.gt_size, 1, gt_path)
            img_gt, img_lq = augment([img_gt, img_lq], self.opt["use_hflip"], self.opt["use_rot"])
        elif self.center_crop is not None:
            img_gt = center_crop(img_gt, self.center_crop)
            img_lq = center_crop(img_lq, self.center_crop)

        if self.opt.get("prctile_norm", False):
            img_gt = prctile_norm(img_gt)
            img_lq = prctile_norm(img_lq)

        if img_gt.shape[-1] == img_lq.shape[-1] == 3:
            img_gt, img_lq = self._bgr2rgb(img_gt, img_lq)

        if self.sigma_type == "constant":
            sigma_value = self.sigma_range
        elif self.sigma_type == "random":
            sigma_value = random.uniform(self.sigma_range[0], self.sigma_range[1])
        else:
            sigma_value = random.choice(self.sigma_range)

        # exact reference seeding: per-index in train, 0 in val (…py:397-402)
        np.random.seed(seed=index if self.opt["phase"] == "train" else 0)
        img_lq = img_lq + np.random.normal(0, sigma_value / 255.0, img_lq.shape)
        return self._finish(img_gt, img_lq, gt_path, gt_path)

    def __len__(self):
        return len(self.paths)


@DATASET_REGISTRY.register()
class PairedImageJPEGCARDataset(_BaseDataset):
    """GT-only + cv2 JPEG compression (reference: paired_image_dataset.py:425-583)."""

    def __init__(self, opt):
        super().__init__(opt)
        self.q_type = opt["q_type"]
        self.q_range = opt["q_range"]
        assert self.q_type in ["constant", "random", "choice"]
        self.gt_size = opt.get("gt_size", 128)
        self.gt_folder = opt["dataroot_gt"]
        if self.io_backend_opt["type"] == "lmdb":
            self.io_backend_opt["db_paths"] = [self.gt_folder]
            self.io_backend_opt["client_keys"] = ["gt"]
            self.paths = paths_from_lmdb(self.gt_folder)
        else:
            self.paths = paths_from_folder(self.gt_folder)

    def __getitem__(self, index):
        gt_path = self.paths[index]
        img_gt = self._read(gt_path, "gt")
        img_lq = img_gt.copy()

        if self.opt["phase"] == "train":
            img_gt, img_lq = paired_random_crop(img_gt, img_lq, self.gt_size, 1, gt_path)
            img_gt, img_lq = augment([img_gt, img_lq], self.opt["use_hflip"], self.opt["use_rot"])
        elif self.center_crop is not None:
            img_gt = center_crop(img_gt, self.center_crop)
            img_lq = center_crop(img_lq, self.center_crop)

        if self.q_type == "constant":
            q_value = self.q_range
        elif self.q_type == "random":
            q_value = random.uniform(self.q_range[0], self.q_range[1])
        else:
            q_value = random.choice(self.q_range)

        img_lq = (img_lq * 255).round().astype(np.uint8)
        if img_lq.shape[-1] == 1:
            img_lq = img_lq[..., 0]
        msg = cv2.imencode(".jpg", img_lq, [cv2.IMWRITE_JPEG_QUALITY, int(q_value)])[1]
        img_lq = cv2.imdecode(msg, cv2.IMREAD_UNCHANGED)
        if self.float32:
            img_lq = img_lq.astype(np.float32) / 255.0

        if img_gt.ndim == 3 and img_lq.ndim == 3 and img_gt.shape[-1] == img_lq.shape[-1] == 3:
            img_gt, img_lq = self._bgr2rgb(img_gt, img_lq)
        return self._finish(img_gt, img_lq, gt_path, gt_path)

    def __len__(self):
        return len(self.paths)


@DATASET_REGISTRY.register()
class PairedImageDehazeDataset(_BaseDataset):
    """Paired with asymmetric names: GT = lq_name.split('_')[0] + suffix
    (reference: paired_image_dataset.py:584-732)."""

    def __init__(self, opt):
        super().__init__(opt)
        self.gt_size = opt.get("gt_size", 128)
        self.gt_folder = opt["dataroot_gt"]
        self.lq_folder = opt["dataroot_lq"]
        if self.io_backend_opt["type"] == "lmdb":
            raise NotImplementedError
        self.paths = paths_from_folder(self.lq_folder)
        self.suffix = opt.get("suffix", ".jpg")

    def __getitem__(self, index):
        lq_path = self.paths[index]
        img_lq = self._read(lq_path, "lq")
        gt_name = lq_path.split("/")[-1].split("_")[0] + self.suffix
        gt_path = os.path.join(self.gt_folder, gt_name)
        img_gt = self._read(gt_path, "gt")

        if self.opt["phase"] == "train":
            img_gt, img_lq = paired_random_crop(img_gt, img_lq, self.gt_size, 1, gt_path)
            img_gt, img_lq = augment([img_gt, img_lq], self.opt["use_hflip"], self.opt["use_rot"])
        elif self.center_crop is not None:
            img_gt = center_crop(img_gt, self.center_crop)
            img_lq = center_crop(img_lq, self.center_crop)

        if self.opt.get("prctile_norm", False):
            img_gt = prctile_norm(img_gt)
            img_lq = prctile_norm(img_lq)
        if img_gt.shape[-1] == img_lq.shape[-1] == 3:
            img_gt, img_lq = self._bgr2rgb(img_gt, img_lq)
        return self._finish(img_gt, img_lq, gt_path, gt_path)

    def __len__(self):
        return len(self.paths)


@DATASET_REGISTRY.register()
class PairedImageMosaicDataset(_BaseDataset):
    """GT-only + Bayer CFA mosaic + cv2 EA demosaic (reference: paired_image_dataset.py:733-873).

    Note the reference converts BGR→RGB *before* mosaicking and works in uint8.
    """

    def __init__(self, opt):
        super().__init__(opt)
        self.gt_size = opt.get("gt_size", 128)
        self.gt_folder = opt["dataroot_gt"]
        if self.io_backend_opt["type"] == "lmdb":
            self.io_backend_opt["db_paths"] = [self.gt_folder]
            self.io_backend_opt["client_keys"] = ["gt"]
            self.paths = paths_from_lmdb(self.gt_folder)
        else:
            self.paths = paths_from_folder(self.gt_folder)

    def __getitem__(self, index):
        gt_path = self.paths[index]
        img_gt = self._read(gt_path, "gt", float32=False)  # uint8
        if img_gt.shape[-1] == 3:
            img_gt = cv2.cvtColor(img_gt, cv2.COLOR_BGR2RGB)
        img_lq = img_gt.copy()

        if self.opt["phase"] == "train":
            img_gt, img_lq = paired_random_crop(img_gt, img_lq, self.gt_size, 1, gt_path)
            img_gt, img_lq = augment([img_gt, img_lq], self.opt["use_hflip"], self.opt["use_rot"])
        elif self.center_crop is not None:
            img_gt = center_crop(img_gt, self.center_crop)
            img_lq = center_crop(img_lq, self.center_crop)

        cfa = mosaic_CFA_Bayer(img_lq)[0]
        img_lq = cv2.cvtColor(cfa, cv2.COLOR_BAYER_BG2BGR_EA)

        if self.float32:
            img_gt = img_gt.astype(np.float32) / 255.0
            img_lq = img_lq.astype(np.float32) / 255.0
        if self.opt.get("prctile_norm", False):
            img_gt = prctile_norm(img_gt)
            img_lq = prctile_norm(img_lq)
        return self._finish(img_gt, img_lq, gt_path, gt_path)

    def __len__(self):
        return len(self.paths)


@DATASET_REGISTRY.register()
class PairedImageInpaintingDataset(_BaseDataset):
    """GT-only + random line-stroke masking (reference: paired_image_dataset.py:874-1029)."""

    def __init__(self, opt):
        super().__init__(opt)
        self.gt_size = opt.get("gt_size", 128)
        self.gt_folder = opt["dataroot_gt"]
        if self.io_backend_opt["type"] == "lmdb":
            self.io_backend_opt["db_paths"] = [self.gt_folder]
            self.io_backend_opt["client_keys"] = ["gt"]
            self.paths = paths_from_lmdb(self.gt_folder)
        else:
            self.paths = paths_from_folder(self.gt_folder)

    @staticmethod
    def inpainting(img: np.ndarray, l_num: int, l_thick: int) -> np.ndarray:
        """Draw l_num random white/black strokes (reference: …py:1004-1029)."""
        ori_h, ori_w = img.shape[0], img.shape[1]
        mask = np.zeros((ori_h, ori_w, 3), np.uint8)
        col = random.choice(["white", "black"])
        while l_num:
            x1, y1 = random.randint(0, ori_w), random.randint(0, ori_h)
            x2, y2 = random.randint(0, ori_w), random.randint(0, ori_h)
            pts = np.array([[x1, y1], [x2, y2]], np.int32).reshape((-1, 1, 2))
            mask = cv2.polylines(mask, [pts], 0, (1, 1, 1), l_thick)
            l_num -= 1
        if col == "white":
            return np.clip(img + mask, 0, 1)
        return np.clip(img - mask, 0, 1)

    def __getitem__(self, index):
        gt_path = self.paths[index]
        img_gt = self._read(gt_path, "gt", float32=False)
        if img_gt.shape[-1] == 3:
            img_gt = cv2.cvtColor(img_gt, cv2.COLOR_BGR2RGB)
        img_lq = img_gt.copy()

        if self.opt["phase"] == "train":
            img_gt, img_lq = paired_random_crop(img_gt, img_lq, self.gt_size, 1, gt_path)
            img_gt, img_lq = augment([img_gt, img_lq], self.opt["use_hflip"], self.opt["use_rot"])
        elif self.center_crop is not None:
            img_gt = center_crop(img_gt, self.center_crop)
            img_lq = center_crop(img_lq, self.center_crop)

        if self.float32:
            img_gt = img_gt.astype(np.float32) / 255.0
            img_lq = img_lq.astype(np.float32) / 255.0

        l_num = random.randint(5, 10)
        l_thick = random.randint(5, 10)
        img_lq = self.inpainting(img_lq, l_num, l_thick)

        if self.opt.get("prctile_norm", False):
            img_gt = prctile_norm(img_gt)
            img_lq = prctile_norm(img_lq)
        return self._finish(img_gt, img_lq, gt_path, gt_path)

    def __len__(self):
        return len(self.paths)
