"""Loss registry + builder (reference: basicsr/losses/__init__.py:25)."""

from copy import deepcopy

from ..utils.registry import LOSS_REGISTRY
from . import basic_loss as _basic_loss  # noqa: F401  (registers losses)
from .basic_loss import (  # noqa: F401
    CharbonnierLoss,
    CrossEntropyLoss,
    FocalLoss,
    HuberLoss,
    L1Loss,
    MSELoss,
    PSNRLoss,
    SmoothL1Loss,
    SSIMLoss,
    SSIMMSELoss,
    WeightedTVLoss,
)
from .loss_util import get_local_weights, get_refined_artifact_map  # noqa: F401

__all__ = ["build_loss"]


def build_loss(opt: dict):
    opt = deepcopy(opt)
    loss_type = opt.pop("type")
    loss = LOSS_REGISTRY.get(loss_type)(**opt)
    from ..utils.logger import get_root_logger

    get_root_logger().info(f"Loss [{loss.__class__.__name__}] is created.")
    return loss
