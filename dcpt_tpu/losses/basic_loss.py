"""Restoration + classification losses (reference: basicsr/losses/basic_loss.py,
classify_loss.py).  Plain callable classes over NHWC jnp arrays — no torch
modules needed since none of these carry parameters."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.registry import LOSS_REGISTRY
from .loss_util import weighted_loss

_reduction_modes = ["none", "mean", "sum"]


@weighted_loss
def l1_loss(pred, target):
    return jnp.abs(pred - target)


@weighted_loss
def mse_loss(pred, target):
    return (pred - target) ** 2


@weighted_loss
def charbonnier_loss(pred, target, eps=1e-12):
    return jnp.sqrt((pred - target) ** 2 + eps)


@weighted_loss
def huber_loss(pred, target, delta=0.01):
    """The reference's Huber (basic_loss.py:30-36): quadratic inside delta,
    linear outside — note it does not divide the linear part by delta."""
    abs_error = jnp.abs(pred - target)
    quadratic = jnp.minimum(abs_error, delta)
    linear = abs_error - quadratic
    return 0.5 * quadratic**2 + linear


@weighted_loss
def smooth_l1_loss(pred, target, beta=1.0):
    """torch F.smooth_l1_loss semantics (beta=1.0)."""
    abs_error = jnp.abs(pred - target)
    return jnp.where(abs_error < beta, 0.5 * abs_error**2 / beta, abs_error - 0.5 * beta)


def _check_reduction(reduction):
    if reduction not in _reduction_modes:
        raise ValueError(f"Unsupported reduction mode: {reduction}. Supported ones are: {_reduction_modes}")


@LOSS_REGISTRY.register()
class CrossEntropyLoss:
    """Softmax cross entropy over class logits (reference: basic_loss.py:39-53)."""

    def __init__(self, loss_weight=1.0, reduction="mean"):
        _check_reduction(reduction)
        self.loss_weight = loss_weight
        self.reduction = reduction

    def __call__(self, pred, target, **kwargs):
        log_p = jax.nn.log_softmax(pred, axis=-1)
        ce = -jnp.take_along_axis(log_p, target[:, None].astype(jnp.int32), axis=-1)[:, 0]
        if self.reduction == "mean":
            ce = jnp.mean(ce)
        elif self.reduction == "sum":
            ce = jnp.sum(ce)
        return self.loss_weight * ce


@LOSS_REGISTRY.register()
class L1Loss:
    def __init__(self, loss_weight=1.0, reduction="mean"):
        _check_reduction(reduction)
        self.loss_weight = loss_weight
        self.reduction = reduction

    def __call__(self, pred, target, weight=None, **kwargs):
        return self.loss_weight * l1_loss(pred, target, weight, reduction=self.reduction)


@LOSS_REGISTRY.register()
class MSELoss:
    def __init__(self, loss_weight=1.0, reduction="mean"):
        _check_reduction(reduction)
        self.loss_weight = loss_weight
        self.reduction = reduction

    def __call__(self, pred, target, weight=None, **kwargs):
        return self.loss_weight * mse_loss(pred, target, weight, reduction=self.reduction)


@LOSS_REGISTRY.register()
class SmoothL1Loss:
    def __init__(self, loss_weight=1.0, reduction="mean"):
        _check_reduction(reduction)
        self.loss_weight = loss_weight
        self.reduction = reduction

    def __call__(self, pred, target, weight=None, **kwargs):
        return self.loss_weight * smooth_l1_loss(pred, target, None, reduction=self.reduction)


@LOSS_REGISTRY.register()
class HuberLoss:
    def __init__(self, loss_weight=1.0, delta=0.01, reduction="mean"):
        _check_reduction(reduction)
        self.loss_weight = loss_weight
        self.delta = delta
        self.reduction = reduction

    def __call__(self, pred, target, weight=None, **kwargs):
        return self.loss_weight * huber_loss(pred, target, weight, delta=self.delta, reduction=self.reduction)


@LOSS_REGISTRY.register()
class CharbonnierLoss:
    def __init__(self, loss_weight=1.0, reduction="mean", eps=1e-12):
        _check_reduction(reduction)
        self.loss_weight = loss_weight
        self.reduction = reduction
        self.eps = eps

    def __call__(self, pred, target, weight=None, **kwargs):
        return self.loss_weight * charbonnier_loss(pred, target, weight, eps=self.eps, reduction=self.reduction)


@LOSS_REGISTRY.register()
class SSIMLoss:
    """ssim_weight*(1−SSIM) + mse_weight*Huber (reference: basic_loss.py:152-190)."""

    def __init__(self, ssim_weight=0.1, mse_weight=1.0, crop_border=0, reduction="mean", test_y_channel=False):
        self.ssim_weight = ssim_weight
        self.mse_weight = mse_weight
        self.crop_border = crop_border
        self.test_y_channel = test_y_channel
        self.reduction = reduction

    def __call__(self, pred, target, weight=None, **kwargs):
        from ..metrics.psnr_ssim import calculate_ssim_device

        ssim = calculate_ssim_device(
            pred, target, crop_border=self.crop_border, test_y_channel=self.test_y_channel, image_range=1
        )
        # the reference takes [0].mean() — i.e. the first sample's SSIM
        return self.ssim_weight * (1 - ssim[0]) + self.mse_weight * huber_loss(
            pred, target, weight, reduction=self.reduction
        )


@LOSS_REGISTRY.register()
class SSIMMSELoss:
    """ssim_weight*(1−SSIM) + mse_weight*MSE (reference: basic_loss.py:193-232)."""

    def __init__(self, ssim_weight=0.1, mse_weight=1.0, crop_border=0, reduction="mean", test_y_channel=False):
        self.ssim_weight = ssim_weight
        self.mse_weight = mse_weight
        self.crop_border = crop_border
        self.test_y_channel = test_y_channel
        self.reduction = reduction

    def __call__(self, pred, target, **kwargs):
        from ..metrics.psnr_ssim import calculate_ssim_device

        ssim = calculate_ssim_device(
            pred, target, crop_border=self.crop_border, test_y_channel=self.test_y_channel, image_range=1
        )
        return self.ssim_weight * (1 - jnp.mean(ssim)) + self.mse_weight * mse_loss(
            pred, target, None, reduction=self.reduction
        )


@LOSS_REGISTRY.register()
class WeightedTVLoss:
    """TV via shifted L1 (reference: basic_loss.py:305-335), NHWC."""

    def __init__(self, loss_weight=1.0, reduction="mean"):
        if reduction not in ["mean", "sum"]:
            raise ValueError(f"Unsupported reduction mode: {reduction}. Supported ones are: mean | sum")
        self.loss_weight = loss_weight
        self.reduction = reduction

    def __call__(self, pred, weight=None, **kwargs):
        y_weight = weight[:, :-1, :, :] if weight is not None else None
        x_weight = weight[:, :, :-1, :] if weight is not None else None
        y_diff = self.loss_weight * l1_loss(pred[:, :-1, :, :], pred[:, 1:, :, :], y_weight, reduction=self.reduction)
        x_diff = self.loss_weight * l1_loss(pred[:, :, :-1, :], pred[:, :, 1:, :], x_weight, reduction=self.reduction)
        return x_diff + y_diff


@LOSS_REGISTRY.register()
class PSNRLoss:
    """scale·log(MSE) — NAFNet's training loss (reference: basic_loss.py:338-365)."""

    def __init__(self, loss_weight=1.0, reduction="mean", toY=False):
        assert reduction == "mean"
        self.loss_weight = loss_weight
        self.scale = 10 / np.log(10)
        self.toY = toY
        self.coef = jnp.asarray([65.481, 128.553, 24.966])

    def __call__(self, pred, target, weight=None, **kwargs):
        assert pred.ndim == 4
        if self.toY:
            pred = (jnp.sum(pred * self.coef, axis=-1, keepdims=True) + 16.0) / 255.0
            target = (jnp.sum(target * self.coef, axis=-1, keepdims=True) + 16.0) / 255.0
        mse = jnp.mean((pred - target) ** 2, axis=(1, 2, 3))
        return self.loss_weight * self.scale * jnp.mean(jnp.log(mse + 1e-8))


@LOSS_REGISTRY.register()
class FocalLoss:
    """Focal loss for class imbalance (reference: classify_loss.py:11-150)."""

    def __init__(self, alpha=None, gamma=0.0, reduction="mean", ignore_index=-100):
        if reduction not in ("mean", "sum", "none"):
            raise ValueError('Reduction must be one of: "mean", "sum", "none".')
        self.alpha = None if alpha is None else jnp.asarray(alpha)
        self.gamma = gamma
        self.ignore_index = ignore_index
        self.reduction = reduction

    def __call__(self, x, y, **kwargs):
        if x.ndim > 2:
            c = x.shape[-1]
            x = x.reshape(-1, c)
            y = y.reshape(-1)
        y = y.astype(jnp.int32)
        valid = y != self.ignore_index
        y_safe = jnp.where(valid, y, 0)

        log_p = jax.nn.log_softmax(x, axis=-1)
        log_pt = jnp.take_along_axis(log_p, y_safe[:, None], axis=-1)[:, 0]
        ce = -log_pt
        if self.alpha is not None:
            ce = ce * self.alpha[y_safe]
        focal_term = (1 - jnp.exp(log_pt)) ** self.gamma
        loss = focal_term * ce
        loss = jnp.where(valid, loss, 0.0)

        if self.reduction == "mean":
            n = jnp.maximum(jnp.sum(valid), 1)
            return jnp.sum(loss) / n
        if self.reduction == "sum":
            return jnp.sum(loss)
        return loss
