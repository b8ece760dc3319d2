"""Metric dispatch (reference: basicsr/metrics/__init__.py:11)."""

from copy import deepcopy

from ..utils.registry import METRIC_REGISTRY
from . import fid as _fid  # noqa: F401  (registers calculate_fid)
from . import niqe as _niqe  # noqa: F401  (registers calculate_niqe)
from . import psnr_ssim as _psnr_ssim  # noqa: F401  (registers metrics on import)
from .psnr_ssim import (  # noqa: F401
    calculate_msssim,
    calculate_nrmse,
    calculate_psnr,
    calculate_psnr_device,
    calculate_psnr_pt,
    calculate_ssim,
    calculate_ssim_device,
    calculate_ssim_pt,
)


def calculate_metric(data, opt):
    """Dispatch by ``opt['type']`` through the metric registry."""
    opt = deepcopy(opt)
    metric_type = opt.pop("type")
    return METRIC_REGISTRY.get(metric_type)(**data, **opt)
