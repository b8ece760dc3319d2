"""Loss reduction helpers + LDL artifact map (reference: basicsr/losses/loss_util.py).

All tensors are NHWC jnp arrays; "channel" weight semantics from the reference's
NCHW code map to the last axis here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def reduce_loss(loss: jax.Array, reduction: str) -> jax.Array:
    if reduction == "none":
        return loss
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    raise ValueError(f"invalid reduction: {reduction}")


def weight_reduce_loss(loss: jax.Array, weight=None, reduction: str = "mean") -> jax.Array:
    """Elementwise weight + reduction (reference: loss_util.py:27-56).

    'mean' with a weight divides by the weight mass (per reference semantics:
    single-channel weights are scaled by the channel count)."""
    if weight is not None:
        assert weight.ndim == loss.ndim
        assert weight.shape[-1] == 1 or weight.shape[-1] == loss.shape[-1]
        loss = loss * weight

    if weight is None or reduction == "sum":
        return reduce_loss(loss, reduction)
    if reduction == "mean":
        if weight.shape[-1] > 1:
            denom = jnp.sum(weight)
        else:
            denom = jnp.sum(weight) * loss.shape[-1]
        return jnp.sum(loss) / denom
    return loss


def weighted_loss(loss_func):
    """Decorator adding (weight, reduction) args to an elementwise loss fn."""

    @functools.wraps(loss_func)
    def wrapper(pred, target, weight=None, reduction="mean", **kwargs):
        loss = loss_func(pred, target, **kwargs)
        return weight_reduce_loss(loss, weight, reduction)

    return wrapper


def get_local_weights(residual: jax.Array, ksize: int, std: bool = False) -> jax.Array:
    """Local window variance/std of the residual (reference: loss_util.py:100-130).

    residual: (N, H, W, 1).  Unbiased variance over each ksize×ksize window,
    reflect padding.
    """
    pad = (ksize - 1) // 2
    padded = jnp.pad(residual, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")

    # extract all k×k patches: (N, H, W, 1, k, k)
    n, h, w, c = residual.shape
    patches = jax.lax.conv_general_dilated_patches(
        padded.transpose(0, 3, 1, 2),  # NCHW for patches util
        filter_shape=(ksize, ksize),
        window_strides=(1, 1),
        padding="VALID",
    )  # (N, C*k*k, H, W)
    patches = patches.reshape(n, c, ksize * ksize, h, w)

    mean = jnp.mean(patches, axis=2, keepdims=True)
    var = jnp.sum((patches - mean) ** 2, axis=2, keepdims=True) / (ksize * ksize - 1)
    out = var[:, :, 0]  # (N, C, H, W)
    if std:
        out = jnp.sqrt(out)
        out = (out - jnp.mean(out)) / jnp.std(out, ddof=1)
        out = (jnp.tanh(out) + 1) / 2
    return out.transpose(0, 2, 3, 1)  # back to NHWC


def get_refined_artifact_map(img_gt, img_output, img_ema=None, ksize: int = 7, std: bool = False):
    """LDL artifact map (reference: loss_util.py:133-165), NHWC."""
    if not std:
        residual_sr = jnp.sum(jnp.abs(img_gt - img_output), axis=-1, keepdims=True)
    else:
        residual_sr = jnp.abs(img_gt - img_output)

    pixel_level_weight = get_local_weights(residual_sr, ksize, std=std)
    if std:
        return pixel_level_weight

    # unbiased variance over (H, W, C) per sample
    flat = residual_sr.reshape(residual_sr.shape[0], -1)
    patch_var = jnp.var(flat, axis=1, ddof=1).reshape(-1, 1, 1, 1)
    overall_weight = patch_var ** (1 / 5) * pixel_level_weight
    if img_ema is not None:
        residual_ema = jnp.sum(jnp.abs(img_gt - img_ema), axis=-1, keepdims=True)
        overall_weight = jnp.where(residual_sr < residual_ema, 0.0, overall_weight)
    return overall_weight
