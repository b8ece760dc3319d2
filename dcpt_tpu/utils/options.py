"""YAML-driven run configuration.

Keeps the exact config-key surface of the reference harness
(``basicsr/utils/options.py:100-205``) so that configs written for it — e.g.
``options/all_in_one/test/test_NAFNet_5d.yml`` — run unmodified:

* ``-opt`` path to a yml file, ``--force_yml a:b:c=value`` nested overrides,
  ``--auto_resume``, ``--debug``;
* ``datasets.<phase>`` dicts get ``phase`` / ``scale`` stamped onto them;
* ``path`` entries ending in ``resume_state`` / ``pretrain_network`` are expanded;
* ``is_train`` selects the ``experiments/<name>/...`` vs ``results/<name>/...`` layout;
* ``num_gpu: auto`` resolves to the local JAX device count (the TPU analog of
  ``torch.cuda.device_count()``).

Internally everything stays a plain nested dict (the reference models read raw
nested dicts), but ``parse_options`` seeds RNGs and initialises multi-host JAX
when a launcher is requested.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import random
from collections import OrderedDict
from typing import Any

import yaml


def ordered_yaml():
    """yaml Loader/Dumper pair that preserves mapping order (reference: options.py:14-36)."""
    try:
        from yaml import CDumper as Dumper
        from yaml import CLoader as Loader
    except ImportError:
        from yaml import Dumper, Loader

    _mapping_tag = yaml.resolver.BaseResolver.DEFAULT_MAPPING_TAG

    def dict_representer(dumper, data):
        return dumper.represent_dict(data.items())

    def dict_constructor(loader, node):
        return OrderedDict(loader.construct_pairs(node))

    Dumper.add_representer(OrderedDict, dict_representer)
    Loader.add_constructor(_mapping_tag, dict_constructor)
    return Loader, Dumper


def yaml_load(f: str):
    """Load yml from a path or a literal string (reference: options.py:39-52)."""
    if os.path.isfile(f):
        with open(f, "r") as fh:
            return yaml.load(fh, Loader=ordered_yaml()[0])
    return yaml.load(f, Loader=ordered_yaml()[0])


def dict2str(opt: dict, indent_level: int = 1) -> str:
    """Pretty-print a nested options dict (reference: options.py:55-73)."""
    msg = "\n"
    for k, v in opt.items():
        if isinstance(v, dict):
            msg += " " * (indent_level * 2) + k + ":["
            msg += dict2str(v, indent_level + 1)
            msg += " " * (indent_level * 2) + "]\n"
        else:
            msg += " " * (indent_level * 2) + f"{k}: {v}\n"
    return msg


def _postprocess_yml_value(value: str) -> Any:
    """Parse a CLI-override string into a typed python value (reference: options.py:76-97)."""
    if value == "~" or value.lower() == "none":
        return None
    if value.lower() == "true":
        return True
    if value.lower() == "false":
        return False
    if value.startswith("!!float"):
        return float(value.replace("!!float", ""))
    if value.isdigit():
        return int(value)
    if value.replace("-", "", 1).isdigit() and value.count("-") == 1 and value.startswith("-"):
        return int(value)
    try:
        return float(value)
    except ValueError:
        pass
    if value.startswith("["):
        return eval(value, {"__builtins__": {}}, {})  # list literal
    return value


def set_nested(d: dict, keys: list[str], value: Any) -> None:
    for k in keys[:-1]:
        d = d.setdefault(k, {})
    d[keys[-1]] = value


def apply_force_yml(opt: dict, force_entries) -> None:
    """Apply ``a:b:c=value`` overrides (reference: options.py:144-156, without exec)."""
    if not force_entries:
        return
    for entry in force_entries:
        entry = entry.replace(" ", "")
        keys, value = entry.split("=", 1)
        set_nested(opt, keys.split(":"), _postprocess_yml_value(value))


def apply_num_gpu_platform(opt: dict) -> None:
    """``num_gpu: 0`` means CPU in the reference (test.py: device='cpu');
    honor it in-process — the env-var route alone is overridden where a
    sitecustomize pins another backend at import time."""
    if opt.get("num_gpu") == 0:
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:  # noqa: BLE001 — backend already initialized; keep it
            pass


def _resolve_num_devices(opt: dict) -> None:
    num = opt.get("num_gpu", opt.get("num_devices", "auto"))
    # Switch platform BEFORE the auto branch can initialize the default backend.
    apply_num_gpu_platform(opt)
    if num == "auto":
        import jax

        num = jax.local_device_count()
    opt["num_gpu"] = num  # compat key the models read


def parse_options(root_path: str, is_train: bool = True, args: list[str] | None = None) -> tuple[dict, argparse.Namespace]:
    """CLI + yml → options dict (reference: options.py:100-205)."""
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True, help="Path to option YAML file.")
    parser.add_argument(
        "--launcher", choices=["none", "jax"], default="none", help="multi-host launcher"
    )
    parser.add_argument("--auto_resume", action="store_true")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--local_rank", type=int, default=0)
    parser.add_argument(
        "--force_yml", nargs="+", default=None, help="Force to update yml files. Examples: train:ema_decay=0.999"
    )
    parsed = parser.parse_args(args)

    opt = yaml_load(parsed.opt)

    # multi-host init (the reference's init_dist; here jax.distributed)
    if parsed.launcher == "none":
        opt["dist"] = False
    else:
        opt["dist"] = True
        import jax

        if not getattr(jax.distributed, "is_initialized", lambda: False)():
            try:
                jax.distributed.initialize()
            except Exception:  # single-process fallback
                opt["dist"] = False

    opt["rank"], opt["world_size"] = get_dist_info()

    # random seed
    seed = opt.get("manual_seed")
    if seed is None:
        seed = random.randint(1, 10000)
        opt["manual_seed"] = seed
    from .misc import set_random_seed

    set_random_seed(seed + opt["rank"])

    apply_force_yml(opt, parsed.force_yml)

    opt["auto_resume"] = parsed.auto_resume
    opt["is_train"] = is_train

    # debug setting
    if parsed.debug and not opt["name"].startswith("debug"):
        opt["name"] = "debug_" + opt["name"]

    _resolve_num_devices(opt)

    # persistent XLA compilation cache (TPU compiles are expensive; repeated
    # harness runs reuse them). Override dir via compilation_cache_dir in yml.
    cache_dir = opt.get("compilation_cache_dir", os.environ.get("DCPT_TPU_COMPILE_CACHE", "~/.cache/dcpt_tpu_xla"))
    if cache_dir:
        try:
            import jax

            jax.config.update("jax_compilation_cache_dir", osp.expanduser(cache_dir))
        except Exception:  # older jax or unavailable backend
            pass

    # datasets
    for phase, dataset in (opt.get("datasets") or {}).items():
        phase_key = phase.split("_")[0]
        dataset["phase"] = phase_key
        if "scale" in opt:
            dataset["scale"] = opt["scale"]
        if dataset.get("dataroot_gt") is not None:
            dataset["dataroot_gt"] = osp.expanduser(dataset["dataroot_gt"])
        if dataset.get("dataroot_lq") is not None:
            dataset["dataroot_lq"] = osp.expanduser(dataset["dataroot_lq"])

    # paths
    opt.setdefault("path", {})
    for key, val in opt["path"].items():
        if val and ("resume_state" in key or "pretrain_network" in key):
            opt["path"][key] = osp.expanduser(val)

    if is_train:
        experiments_root = osp.join(root_path, "experiments", opt["name"])
        opt["path"]["experiments_root"] = experiments_root
        opt["path"]["models"] = osp.join(experiments_root, "models")
        opt["path"]["training_states"] = osp.join(experiments_root, "training_states")
        opt["path"]["log"] = experiments_root
        opt["path"]["visualization"] = osp.join(experiments_root, "visualization")
        if "debug" in opt["name"]:
            train = opt.setdefault("train", {})
            val = opt.setdefault("val", {})
            train["total_iter"] = 8
            val["val_freq"] = 8
            opt.setdefault("logger", {})
            opt["logger"]["print_freq"] = 1
            opt["logger"]["save_checkpoint_freq"] = 8
    else:
        results_root = osp.join(root_path, "results", opt["name"])
        opt["path"]["results_root"] = results_root
        opt["path"]["log"] = results_root
        opt["path"]["visualization"] = osp.join(results_root, "visualization")

    return opt, parsed


def get_dist_info() -> tuple[int, int]:
    """(rank, world_size) — multi-host JAX analog of dist_util.get_dist_info."""
    try:
        import jax

        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def copy_opt_file(opt_file: str, experiments_root: str) -> None:
    """Archive the run's yml next to its outputs (reference: options.py:208-223,
    rank-0 only like the reference's @master_only)."""
    from .dist_util import get_dist_info

    if get_dist_info()[0] != 0:
        return
    import shutil
    import sys
    import time

    os.makedirs(experiments_root, exist_ok=True)
    cmd = " ".join(sys.argv)
    filename = osp.join(experiments_root, osp.basename(opt_file))
    shutil.copyfile(opt_file, filename)
    with open(filename, "r+") as f:
        lines = f.readlines()
        lines.insert(0, f"# GENERATE TIME: {time.asctime()}\n# CMD:\n# {cmd}\n\n")
        f.seek(0)
        f.writelines(lines)
