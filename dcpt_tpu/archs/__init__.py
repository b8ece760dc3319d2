"""Arch registry + builder (reference: basicsr/archs/__init__.py:12-30).

All ``*_arch.py`` modules in this folder are imported at package import so their
``@ARCH_REGISTRY.register()`` decorators run — the same auto-scan plugin wiring
as the reference.
"""

import importlib
from copy import deepcopy
from os import path as osp

from ..utils.misc import scandir
from ..utils.registry import ARCH_REGISTRY

__all__ = ["build_network"]

arch_folder = osp.dirname(osp.abspath(__file__))
arch_filenames = [osp.splitext(osp.basename(v))[0] for v in scandir(arch_folder) if v.endswith("_arch.py")]
_arch_modules = [importlib.import_module(f"dcpt_tpu.archs.{file_name}") for file_name in arch_filenames]


def build_network(opt: dict):
    """Instantiate an arch from its config dict (``type`` + kwargs)."""
    opt = deepcopy(opt)
    network_type = opt.pop("type")
    # tolerate reference-config keys that are constructor args there but not here
    cls = ARCH_REGISTRY.get(network_type)
    fields = getattr(cls, "__dataclass_fields__", None)
    if fields is not None:
        known = {k: v for k, v in opt.items() if k in fields}
        dropped = sorted(set(opt) - set(known) - {"name"})
        if dropped:
            from ..utils.logger import get_root_logger

            get_root_logger().warning(f"build_network({network_type}): ignoring unknown keys {dropped}")
        opt = known
        # lists in yml must become hashable tuples for flax dataclass fields
        opt = {k: tuple(v) if isinstance(v, list) else v for k, v in opt.items()}
    net = cls(**opt)
    return net
