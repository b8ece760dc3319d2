"""Model registry + builder (reference: basicsr/models/__init__.py:12-30)."""

import importlib
from copy import deepcopy
from os import path as osp

from ..utils.logger import get_root_logger
from ..utils.misc import scandir
from ..utils.registry import MODEL_REGISTRY

__all__ = ["build_model"]

model_folder = osp.dirname(osp.abspath(__file__))
model_filenames = [osp.splitext(osp.basename(v))[0] for v in scandir(model_folder) if v.endswith("_model.py")]
_model_modules = [importlib.import_module(f"dcpt_tpu.models.{file_name}") for file_name in model_filenames]


def build_model(opt: dict):
    opt = deepcopy(opt)
    model = MODEL_REGISTRY.get(opt["model_type"])(opt)
    get_root_logger().info(f"Model [{model.__class__.__name__}] is created.")
    return model
