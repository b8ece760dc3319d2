"""LQ-only test dataset (reference: basicsr/data/single_image_dataset.py:12-75)."""

from __future__ import annotations

from os import path as osp

import numpy as np

from ..utils.color_util import bgr2ycbcr
from ..utils.file_client import FileClient
from ..utils.img_util import imfrombytes, img2tensor
from ..utils.misc import scandir
from ..utils.registry import DATASET_REGISTRY
from .data_util import paths_from_lmdb


@DATASET_REGISTRY.register()
class SingleImageDataset:
    def __init__(self, opt):
        self.opt = opt
        self.file_client = None
        self.io_backend_opt = dict(opt["io_backend"])
        self.mean = opt.get("mean")
        self.std = opt.get("std")
        self.lq_folder = opt["dataroot_lq"]

        if self.io_backend_opt["type"] == "lmdb":
            self.io_backend_opt["db_paths"] = [self.lq_folder]
            self.io_backend_opt["client_keys"] = ["lq"]
            self.paths = paths_from_lmdb(self.lq_folder)
        elif "meta_info_file" in self.opt:
            with open(self.opt["meta_info_file"], "r") as fin:
                self.paths = [osp.join(self.lq_folder, line.rstrip().split(" ")[0]) for line in fin]
        else:
            self.paths = sorted(list(scandir(self.lq_folder, full_path=True)))

    def __getitem__(self, index):
        if self.file_client is None:
            backend_opt = dict(self.io_backend_opt)
            self.file_client = FileClient(backend_opt.pop("type"), **backend_opt)

        lq_path = self.paths[index]
        img_bytes = self.file_client.get(lq_path, "lq")
        img_lq = imfrombytes(img_bytes, float32=True)
        if self.opt.get("color") == "y":
            img_lq = bgr2ycbcr(img_lq, y_only=True)[..., None]
        img_lq = img2tensor(img_lq, bgr2rgb=True, float32=True)  # HWC RGB float
        if self.mean is not None or self.std is not None:
            mean = np.asarray(self.mean if self.mean is not None else 0.0, dtype=np.float32)
            std = np.asarray(self.std if self.std is not None else 1.0, dtype=np.float32)
            img_lq = (img_lq - mean) / std
        return {"lq": img_lq, "lq_path": lq_path}

    def __len__(self):
        return len(self.paths)
