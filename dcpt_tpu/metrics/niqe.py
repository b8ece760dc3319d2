"""NIQE — no-reference "completely blind" image quality (Mittal et al., 2013).

MATLAB-faithful host implementation matching the reference evaluation protocol
(``basicsr/metrics/niqe.py:14-225``): MSCN normalisation with a 7×7 Gaussian,
AGGD feature fits over 96×96 blocks at two scales (MATLAB bicubic half-scale
between them), Mahalanobis distance against the pristine multivariate Gaussian.
The pristine-model parameters (``niqe_pris_params.npz``) are the official ones
shipped with the NIQE release.
"""

from __future__ import annotations

import math
import os

import numpy as np
from scipy.ndimage import convolve
from scipy.special import gamma

from ..utils.matlab_functions import imresize
from ..utils.registry import METRIC_REGISTRY

# AGGD shape-parameter lookup table (shared by every fit)
_GAM = np.arange(0.2, 10.001, 0.001)
_R_GAM = np.square(gamma(2.0 / _GAM)) / (gamma(1.0 / _GAM) * gamma(3.0 / _GAM))


def estimate_aggd_param(block: np.ndarray) -> tuple[float, float, float]:
    """Fit (alpha, beta_left, beta_right) of an asymmetric generalized Gaussian."""
    block = block.flatten()
    left_std = np.sqrt(np.mean(block[block < 0] ** 2))
    right_std = np.sqrt(np.mean(block[block > 0] ** 2))
    gammahat = left_std / right_std
    rhat = (np.mean(np.abs(block))) ** 2 / np.mean(block**2)
    rhatnorm = (rhat * (gammahat**3 + 1) * (gammahat + 1)) / ((gammahat**2 + 1) ** 2)
    alpha = _GAM[np.argmin((_R_GAM - rhatnorm) ** 2)]
    beta_scale = np.sqrt(gamma(1 / alpha) / gamma(3 / alpha))
    return alpha, left_std * beta_scale, right_std * beta_scale


def compute_feature(block: np.ndarray) -> list[float]:
    """18 AGGD features: the MSCN block itself + 4 directional pairwise products."""
    feat = []
    alpha, beta_l, beta_r = estimate_aggd_param(block)
    feat.extend([alpha, (beta_l + beta_r) / 2])
    for shift in ([0, 1], [1, 0], [1, 1], [1, -1]):
        shifted = np.roll(block, shift, axis=(0, 1))
        alpha, beta_l, beta_r = estimate_aggd_param(block * shifted)
        mean = (beta_r - beta_l) * (gamma(2 / alpha) / gamma(1 / alpha))
        feat.extend([alpha, mean, beta_l, beta_r])
    return feat


def niqe_core(
    img: np.ndarray,
    mu_pris_param: np.ndarray,
    cov_pris_param: np.ndarray,
    gaussian_window: np.ndarray,
    block_size_h: int = 96,
    block_size_w: int = 96,
) -> float:
    """NIQE of a single gray/Y image in [0, 255] float, shape (h, w)."""
    assert img.ndim == 2, "Input image must be a gray or Y image with shape (h, w)."
    h, w = img.shape
    num_block_h = math.floor(h / block_size_h)
    num_block_w = math.floor(w / block_size_w)
    img = img[0 : num_block_h * block_size_h, 0 : num_block_w * block_size_w]

    distparam = []
    for scale in (1, 2):
        mu = convolve(img, gaussian_window, mode="nearest")
        sigma = np.sqrt(np.abs(convolve(np.square(img), gaussian_window, mode="nearest") - np.square(mu)))
        img_normalized = (img - mu) / (sigma + 1)

        feat = []
        for idx_w in range(num_block_w):
            for idx_h in range(num_block_h):
                block = img_normalized[
                    idx_h * block_size_h // scale : (idx_h + 1) * block_size_h // scale,
                    idx_w * block_size_w // scale : (idx_w + 1) * block_size_w // scale,
                ]
                feat.append(compute_feature(block))
        distparam.append(np.array(feat))

        if scale == 1:
            img = imresize(img / 255.0, scale=0.5, antialiasing=True) * 255.0

    distparam = np.concatenate(distparam, axis=1)

    mu_distparam = np.nanmean(distparam, axis=0)
    distparam_no_nan = distparam[~np.isnan(distparam).any(axis=1)]
    cov_distparam = np.cov(distparam_no_nan, rowvar=False)

    invcov_param = np.linalg.pinv((cov_pris_param + cov_distparam) / 2)
    diff = mu_pris_param - mu_distparam
    quality = diff @ invcov_param @ diff.T
    return float(np.squeeze(np.sqrt(quality)))


@METRIC_REGISTRY.register()
def calculate_niqe(img, crop_border, input_order="BCHW", convert_to="y", **kwargs):
    """Batch-mean NIQE; input is float [0, 1] Y images (reference: niqe.py:168-225)."""
    params = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)), "niqe_pris_params.npz"))
    mu_pris_param = params["mu_pris_param"]
    cov_pris_param = params["cov_pris_param"]
    gaussian_window = params["gaussian_window"]

    img = np.squeeze(np.asarray(img, dtype=np.float32))
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border]
    img = (img * 255.0).round()
    if img.ndim == 2:
        img = img[None, ...]
    return float(
        np.mean([niqe_core(img[i], mu_pris_param, cov_pris_param, gaussian_window) for i in range(img.shape[0])])
    )
