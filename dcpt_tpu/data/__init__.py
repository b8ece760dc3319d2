"""Dataset registry + builders (reference: basicsr/data/__init__.py:20-125).

All ``*_dataset.py`` modules are auto-imported so their registry decorators run.
"""

import importlib
import random
from copy import deepcopy
from functools import partial
from os import path as osp

import numpy as np

from ..utils.logger import get_root_logger
from ..utils.misc import scandir
from ..utils.options import get_dist_info
from ..utils.registry import DATASET_REGISTRY
from .concat_dataset import ConcatDataset  # noqa: F401
from .data_sampler import EnlargedSampler  # noqa: F401
from .dataloader import CPUPrefetcher, DataLoader, DevicePrefetcher  # noqa: F401

__all__ = ["build_dataset", "build_dataloader", "ConcatDataset", "EnlargedSampler", "CPUPrefetcher", "DevicePrefetcher"]

data_folder = osp.dirname(osp.abspath(__file__))
dataset_filenames = [osp.splitext(osp.basename(v))[0] for v in scandir(data_folder) if v.endswith("_dataset.py")]
_dataset_modules = [importlib.import_module(f"dcpt_tpu.data.{file_name}") for file_name in dataset_filenames]


def build_dataset(dataset_opt: dict):
    dataset_opt = deepcopy(dataset_opt)
    dataset = DATASET_REGISTRY.get(dataset_opt["type"])(dataset_opt)
    get_root_logger().info(f'Dataset [{dataset.__class__.__name__}] - {dataset_opt["name"]} is built.')
    return dataset


def worker_init_fn(worker_id: int, num_workers: int, rank: int, seed: int) -> None:
    """worker_seed = num_workers * rank + worker_id + seed (reference: data/__init__.py:121-125)."""
    worker_seed = num_workers * rank + worker_id + seed
    np.random.seed(worker_seed)
    random.seed(worker_seed)


def build_dataloader(dataset, dataset_opt, num_gpu: int = 1, dist: bool = False, sampler=None, seed=None, phase=None):
    """Phase-aware loader construction (reference: data/__init__.py:50-118).

    train/val: batch_size × device count when non-dist (one process drives all
    local devices), per-host batch when dist; drop_last; seeded workers.
    test: batch 1, synchronous.
    """
    phase = dataset_opt["phase"]
    rank, _ = get_dist_info()
    if phase in ["train", "val"]:
        if dist:
            batch_size = dataset_opt["batch_size_per_gpu"]
            num_workers = dataset_opt["num_worker_per_gpu"]
        else:
            multiplier = 1 if num_gpu == 0 else num_gpu
            batch_size = dataset_opt["batch_size_per_gpu"] * multiplier
            num_workers = dataset_opt["num_worker_per_gpu"] * multiplier
        if seed is not None:
            worker_init_fn(0, num_workers, rank, seed)
        return DataLoader(
            dataset,
            batch_size=batch_size,
            shuffle=(sampler is None and phase == "train"),
            sampler=sampler,
            drop_last=True,
            num_workers=num_workers,
            seed=seed,
            worker_mode=dataset_opt.get("worker_mode", "thread"),
            rank=rank,
        )
    if phase == "test":
        return DataLoader(dataset, batch_size=1, shuffle=False, num_workers=0)
    raise ValueError(f"Wrong dataset phase: {phase}. Supported ones are 'train', 'val' and 'test'.")
