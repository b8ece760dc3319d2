"""Misc host-side helpers: seeding, directories, scandir, resume rewiring.

Reference semantics: ``basicsr/utils/misc.py:13-181``.  RNG seeding covers python /
numpy (JAX itself is functional — model code threads explicit ``jax.random`` keys,
seeded from the same value).
"""

from __future__ import annotations

import os
import os.path as osp
import random
import time

import numpy as np

from .dist_util import master_only


def set_random_seed(seed: int) -> None:
    """Seed python + numpy (reference: misc.py:13-20). JAX keys are derived explicitly."""
    random.seed(seed)
    np.random.seed(seed)


def get_time_str() -> str:
    return time.strftime("%Y%m%d_%H%M%S", time.localtime())


def mkdir_and_rename(path: str) -> None:
    """mkdir; if it exists, rename the old one with a timestamp (reference: misc.py:27-38)."""
    if osp.exists(path):
        new_name = path + "_archived_" + get_time_str()
        print(f"Path already exists. Rename it to {new_name}", flush=True)
        os.rename(path, new_name)
    os.makedirs(path, exist_ok=True)


@master_only
def make_exp_dirs(opt: dict) -> None:
    """Create the experiments/results directory layout (reference: misc.py:40-57,
    rank-0 only via ``master_only`` like the reference)."""
    path_opt = dict(opt["path"])
    if opt["is_train"]:
        mkdir_and_rename(path_opt.pop("experiments_root"))
    else:
        mkdir_and_rename(path_opt.pop("results_root"))
    for key, path in path_opt.items():
        if ("strict_load" in key) or ("pretrain_network" in key) or ("resume" in key) or ("param_key" in key):
            continue
        if path:
            os.makedirs(path, exist_ok=True)


def scandir(dir_path: str, suffix: str | tuple | None = None, recursive: bool = False, full_path: bool = False):
    """Generator over files in a dir (reference: misc.py:60-99)."""
    if (suffix is not None) and not isinstance(suffix, (str, tuple)):
        raise TypeError('"suffix" must be a string or tuple of strings')

    root = dir_path

    def _scandir(dir_path, suffix, recursive):
        for entry in os.scandir(dir_path):
            if not entry.name.startswith(".") and entry.is_file():
                if full_path:
                    return_path = entry.path
                else:
                    return_path = osp.relpath(entry.path, root)
                if suffix is None or return_path.endswith(suffix):
                    yield return_path
            elif recursive and entry.is_dir():
                yield from _scandir(entry.path, suffix=suffix, recursive=recursive)

    return _scandir(dir_path, suffix=suffix, recursive=recursive)


def check_resume(opt: dict, resume_iter: int, remove_dc: bool = False) -> None:
    """Rewire pretrain paths when resuming (reference: misc.py:102-137).

    When ``path.resume_state`` is set, point every ``pretrain_network_*`` at the
    matching ``net_*_<iter>`` checkpoint in the run's model dir and switch EMA
    param keys back to ``params`` (an EMA snapshot resumes from raw params).
    ``remove_dc`` drops ``network_dc`` from the rewiring (reference :110-112).
    """
    if not opt["path"].get("resume_state"):
        return
    networks = [key for key in opt.keys() if key.startswith("network_")]
    if remove_dc:
        networks.remove("network_dc")
    flag_pretrain = False
    for network in networks:
        if opt["path"].get(f"pretrain_{network}") is not None:
            flag_pretrain = True
    if flag_pretrain:
        print("pretrain_network path will be ignored during resuming.", flush=True)
    for network in networks:
        name = f"pretrain_{network}"
        basename = network.replace("network_", "")
        if opt["path"].get("ignore_resume_networks") is None or (
            network not in opt["path"]["ignore_resume_networks"]
        ):
            # our snapshots are .npz (the reference's were .pth)
            opt["path"][name] = osp.join(opt["path"]["models"], f"net_{basename}_{resume_iter}.npz")
            print(f"Set {name} to {opt['path'][name]}", flush=True)
    _switch_ema_param_keys(opt)


def check_resume_all_in_one(opt: dict, resume_iter: int) -> None:
    """All-in-one resume variant (reference: misc.py:140-164): only the
    classifier net ``network_dc`` is rewired to the run's own snapshot — the
    restoration net keeps its configured pretrain path."""
    if not opt["path"].get("resume_state"):
        return
    if opt["path"].get("ignore_resume_networks") is None or (
        "dc" not in opt["path"]["ignore_resume_networks"]
    ):
        opt["path"]["pretrain_network_dc"] = osp.join(
            opt["path"]["models"], f"net_dc_{resume_iter}.npz"
        )
        print(f"Set pretrain_network_dc to {opt['path']['pretrain_network_dc']}", flush=True)
    _switch_ema_param_keys(opt)


def _switch_ema_param_keys(opt: dict) -> None:
    """EMA snapshots resume from raw params (reference: misc.py:132-137,159-164)."""
    for param_key in [key for key in opt["path"] if key.startswith("param_key")]:
        if opt["path"][param_key] == "params_ema":
            opt["path"][param_key] = "params"
            print(f"Set {param_key} to params", flush=True)


def sizeof_fmt(size: float, suffix: str = "B") -> str:
    """Human-readable byte size (reference: misc.py:167-181)."""
    for unit in ["", "K", "M", "G", "T", "P", "E", "Z"]:
        if abs(size) < 1024.0:
            return f"{size:3.1f} {unit}{suffix}"
        size /= 1024.0
    return f"{size:3.1f} Y{suffix}"
