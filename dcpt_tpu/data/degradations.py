"""Real-ESRGAN degradation library: blur kernels + noise + JPEG.

Port of ``basicsr/data/degradations.py`` (dead code in the reference snapshot
— SURVEY §2.3 — but part of the inventory; it enables second-order degradation
synthesis pipelines).  Host-side kernel generation stays numpy (it feeds the
data pipeline); the batched noise ops have jnp device variants (the ``*_pt``
analogs) keyed by explicit ``jax.random`` keys.
"""

from __future__ import annotations

import math
import random

import cv2
import numpy as np
from scipy import special
from scipy.stats import multivariate_normal

# ------------------------------------------------------------------ #
# ------------------------ blur kernels ---------------------------- #
# ------------------------------------------------------------------ #


def sigma_matrix2(sig_x: float, sig_y: float, theta: float) -> np.ndarray:
    """Rotated 2×2 covariance matrix (degradations.py:17-32)."""
    d_matrix = np.array([[sig_x**2, 0], [0, sig_y**2]])
    u_matrix = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    return np.dot(u_matrix, np.dot(d_matrix, u_matrix.T))


def mesh_grid(kernel_size: int):
    """Zero-centred mesh grid (degradations.py:35-54)."""
    ax = np.arange(-kernel_size // 2 + 1.0, kernel_size // 2 + 1.0)
    xx, yy = np.meshgrid(ax, ax)
    xy = np.hstack((xx.reshape((kernel_size * kernel_size, 1)), yy.reshape(kernel_size * kernel_size, 1))).reshape(
        kernel_size, kernel_size, 2
    )
    return xy, xx, yy


def pdf2(sigma_matrix: np.ndarray, grid: np.ndarray) -> np.ndarray:
    """Un-normalised bivariate Gaussian PDF over the grid (degradations.py:57-70)."""
    inverse_sigma = np.linalg.inv(sigma_matrix)
    return np.exp(-0.5 * np.sum(np.dot(grid, inverse_sigma) * grid, 2))


def cdf2(d_matrix: np.ndarray, grid: np.ndarray) -> np.ndarray:
    """Skewed standard bivariate Gaussian CDF (degradations.py:73-88)."""
    rv = multivariate_normal([0, 0], [[1, 0], [0, 1]])
    return rv.cdf(np.dot(grid, d_matrix))


def bivariate_Gaussian(kernel_size, sig_x, sig_y, theta, grid=None, isotropic=True) -> np.ndarray:
    """Normalised (an)isotropic Gaussian kernel (degradations.py:91-116)."""
    if grid is None:
        grid, _, _ = mesh_grid(kernel_size)
    if isotropic:
        sigma_matrix = np.array([[sig_x**2, 0], [0, sig_x**2]])
    else:
        sigma_matrix = sigma_matrix2(sig_x, sig_y, theta)
    kernel = pdf2(sigma_matrix, grid)
    return kernel / np.sum(kernel)


def bivariate_generalized_Gaussian(kernel_size, sig_x, sig_y, theta, beta, grid=None, isotropic=True) -> np.ndarray:
    """exp(-0.5 (xᵀΣ⁻¹x)^β) kernel (degradations.py:119-151)."""
    if grid is None:
        grid, _, _ = mesh_grid(kernel_size)
    if isotropic:
        sigma_matrix = np.array([[sig_x**2, 0], [0, sig_x**2]])
    else:
        sigma_matrix = sigma_matrix2(sig_x, sig_y, theta)
    inverse_sigma = np.linalg.inv(sigma_matrix)
    kernel = np.exp(-0.5 * np.power(np.sum(np.dot(grid, inverse_sigma) * grid, 2), beta))
    return kernel / np.sum(kernel)


def bivariate_plateau(kernel_size, sig_x, sig_y, theta, beta, grid=None, isotropic=True) -> np.ndarray:
    """1/(1 + (xᵀΣ⁻¹x)^β) plateau kernel (degradations.py:154-188)."""
    if grid is None:
        grid, _, _ = mesh_grid(kernel_size)
    if isotropic:
        sigma_matrix = np.array([[sig_x**2, 0], [0, sig_x**2]])
    else:
        sigma_matrix = sigma_matrix2(sig_x, sig_y, theta)
    inverse_sigma = np.linalg.inv(sigma_matrix)
    kernel = np.reciprocal(np.power(np.sum(np.dot(grid, inverse_sigma) * grid, 2), beta) + 1)
    return kernel / np.sum(kernel)


def _random_sigmas(sigma_x_range, sigma_y_range, rotation_range, isotropic):
    assert sigma_x_range[0] < sigma_x_range[1], "Wrong sigma_x_range."
    sigma_x = np.random.uniform(sigma_x_range[0], sigma_x_range[1])
    if isotropic is False:
        assert sigma_y_range[0] < sigma_y_range[1], "Wrong sigma_y_range."
        assert rotation_range[0] < rotation_range[1], "Wrong rotation_range."
        sigma_y = np.random.uniform(sigma_y_range[0], sigma_y_range[1])
        rotation = np.random.uniform(rotation_range[0], rotation_range[1])
    else:
        sigma_y = sigma_x
        rotation = 0
    return sigma_x, sigma_y, rotation


def _apply_kernel_noise(kernel, noise_range):
    if noise_range is not None:
        assert noise_range[0] < noise_range[1], "Wrong noise range."
        noise = np.random.uniform(noise_range[0], noise_range[1], size=kernel.shape)
        kernel = kernel * noise
    return kernel / np.sum(kernel)


def random_bivariate_Gaussian(kernel_size, sigma_x_range, sigma_y_range, rotation_range, noise_range=None, isotropic=True):
    """Random Gaussian kernel (degradations.py:191-236)."""
    assert kernel_size % 2 == 1, "Kernel size must be an odd number."
    sigma_x, sigma_y, rotation = _random_sigmas(sigma_x_range, sigma_y_range, rotation_range, isotropic)
    kernel = bivariate_Gaussian(kernel_size, sigma_x, sigma_y, rotation, isotropic=isotropic)
    return _apply_kernel_noise(kernel, noise_range)


def random_bivariate_generalized_Gaussian(
    kernel_size, sigma_x_range, sigma_y_range, rotation_range, beta_range, noise_range=None, isotropic=True
):
    """Random generalized Gaussian kernel (degradations.py:239-292).

    β sampled below/above 1 with equal probability, as in the reference."""
    assert kernel_size % 2 == 1, "Kernel size must be an odd number."
    sigma_x, sigma_y, rotation = _random_sigmas(sigma_x_range, sigma_y_range, rotation_range, isotropic)
    if np.random.uniform() < 0.5:
        beta = np.random.uniform(beta_range[0], 1)
    else:
        beta = np.random.uniform(1, beta_range[1])
    kernel = bivariate_generalized_Gaussian(kernel_size, sigma_x, sigma_y, rotation, beta, isotropic=isotropic)
    return _apply_kernel_noise(kernel, noise_range)


def random_bivariate_plateau(
    kernel_size, sigma_x_range, sigma_y_range, rotation_range, beta_range, noise_range=None, isotropic=True
):
    """Random plateau kernel (degradations.py:295-348)."""
    assert kernel_size % 2 == 1, "Kernel size must be an odd number."
    sigma_x, sigma_y, rotation = _random_sigmas(sigma_x_range, sigma_y_range, rotation_range, isotropic)
    if np.random.uniform() < 0.5:
        beta = np.random.uniform(beta_range[0], 1)
    else:
        beta = np.random.uniform(1, beta_range[1])
    kernel = bivariate_plateau(kernel_size, sigma_x, sigma_y, rotation, beta, isotropic=isotropic)
    return _apply_kernel_noise(kernel, noise_range)


def random_mixed_kernels(
    kernel_list,
    kernel_prob,
    kernel_size=21,
    sigma_x_range=(0.6, 5),
    sigma_y_range=(0.6, 5),
    rotation_range=(-math.pi, math.pi),
    betag_range=(0.5, 8),
    betap_range=(0.5, 8),
    noise_range=None,
):
    """Sample a kernel type then a kernel (degradations.py:351-441)."""
    kernel_type = random.choices(kernel_list, kernel_prob)[0]
    if kernel_type == "iso":
        return random_bivariate_Gaussian(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range, noise_range=noise_range, isotropic=True
        )
    if kernel_type == "aniso":
        return random_bivariate_Gaussian(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range, noise_range=noise_range, isotropic=False
        )
    if kernel_type == "generalized_iso":
        return random_bivariate_generalized_Gaussian(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range, betag_range, noise_range=noise_range, isotropic=True
        )
    if kernel_type == "generalized_aniso":
        return random_bivariate_generalized_Gaussian(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range, betag_range, noise_range=noise_range, isotropic=False
        )
    if kernel_type == "plateau_iso":
        return random_bivariate_plateau(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range, betap_range, noise_range=None, isotropic=True
        )
    if kernel_type == "plateau_aniso":
        return random_bivariate_plateau(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range, betap_range, noise_range=None, isotropic=False
        )
    raise ValueError(f"unknown kernel type {kernel_type}")


def circular_lowpass_kernel(cutoff, kernel_size, pad_to=0):
    """2-D circularly-symmetric sinc filter (degradations.py:446-486)."""
    assert kernel_size % 2 == 1, "Kernel size must be an odd number."
    with np.errstate(divide="ignore", invalid="ignore"):
        kernel = np.fromfunction(
            lambda x, y: cutoff
            * special.j1(cutoff * np.sqrt((x - (kernel_size - 1) / 2) ** 2 + (y - (kernel_size - 1) / 2) ** 2))
            / (2 * np.pi * np.sqrt((x - (kernel_size - 1) / 2) ** 2 + (y - (kernel_size - 1) / 2) ** 2)),
            [kernel_size, kernel_size],
        )
    kernel[(kernel_size - 1) // 2, (kernel_size - 1) // 2] = cutoff**2 / (4 * np.pi)
    kernel = kernel / np.sum(kernel)
    if pad_to > kernel_size:
        pad_size = (pad_to - kernel_size) // 2
        kernel = np.pad(kernel, ((pad_size, pad_size), (pad_size, pad_size)))
    return kernel


# ------------------------------------------------------------------ #
# ----------------------------- noise ------------------------------ #
# ------------------------------------------------------------------ #


def generate_gaussian_noise(img, sigma=10, gray_noise=False):
    """Gaussian noise field, sigma in [0,255] scale (degradations.py:489-505)."""
    if gray_noise:
        noise = np.float32(np.random.randn(*(img.shape[0:2]))) * sigma / 255.0
        noise = np.expand_dims(noise, axis=2).repeat(3, axis=2)
    else:
        noise = np.float32(np.random.randn(*(img.shape))) * sigma / 255.0
    return noise


def _clip_round(out, clip, rounds):
    if clip and rounds:
        return np.clip((out * 255.0).round(), 0, 255) / 255.0
    if clip:
        return np.clip(out, 0, 1)
    if rounds:
        return (out * 255.0).round() / 255.0
    return out


def add_gaussian_noise(img, sigma=10, clip=True, rounds=False, gray_noise=False):
    return _clip_round(img + generate_gaussian_noise(img, sigma, gray_noise), clip, rounds)


def random_generate_gaussian_noise(img, sigma_range=(0, 10), gray_prob=0):
    sigma = np.random.uniform(sigma_range[0], sigma_range[1])
    gray_noise = np.random.uniform() < gray_prob
    return generate_gaussian_noise(img, sigma, gray_noise)


def random_add_gaussian_noise(img, sigma_range=(0, 1.0), gray_prob=0, clip=True, rounds=False):
    return _clip_round(img + random_generate_gaussian_noise(img, sigma_range, gray_prob), clip, rounds)


def generate_poisson_noise(img, scale=1.0, gray_noise=False):
    """Poisson (shot) noise (degradations.py:640-665)."""
    if gray_noise:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    img = np.clip((img * 255.0).round(), 0, 255) / 255.0
    vals = len(np.unique(img))
    vals = 2 ** np.ceil(np.log2(vals))
    out = np.float32(np.random.poisson(img * vals) / float(vals))
    noise = out - img
    if gray_noise:
        noise = np.repeat(noise[:, :, np.newaxis], 3, axis=2)
    return noise * scale


def add_poisson_noise(img, scale=1.0, clip=True, rounds=False, gray_noise=False):
    return _clip_round(img + generate_poisson_noise(img, scale, gray_noise), clip, rounds)


def random_generate_poisson_noise(img, scale_range=(0, 1.0), gray_prob=0):
    scale = np.random.uniform(scale_range[0], scale_range[1])
    gray_noise = np.random.uniform() < gray_prob
    return generate_poisson_noise(img, scale, gray_noise)


def random_add_poisson_noise(img, scale_range=(0, 1.0), gray_prob=0, clip=True, rounds=False):
    return _clip_round(img + random_generate_poisson_noise(img, scale_range, gray_prob), clip, rounds)


# ------------------------------------------------------------------ #
# ----------------- device (jnp) batched noise ops ----------------- #
# the *_pt analogs (degradations.py:530-820), NHWC + explicit keys    #
# ------------------------------------------------------------------ #


def generate_gaussian_noise_jnp(key, img, sigma=10, gray_noise=0):
    """Batched Gaussian noise over NHWC; sigma/gray_noise scalars or (b,) arrays."""
    import jax
    import jax.numpy as jnp

    b, h, w, c = img.shape
    sigma = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (b,)).reshape(b, 1, 1, 1)
    gray = jnp.broadcast_to(jnp.asarray(gray_noise, jnp.float32), (b,)).reshape(b, 1, 1, 1)
    k1, k2 = jax.random.split(key)
    noise_color = jax.random.normal(k1, img.shape) * sigma / 255.0
    noise_gray = jax.random.normal(k2, (b, h, w, 1)) * sigma / 255.0
    return noise_gray * gray + noise_color * (1 - gray)


def add_gaussian_noise_jnp(key, img, sigma=10, gray_noise=0, clip=True, rounds=False):
    import jax.numpy as jnp

    out = img + generate_gaussian_noise_jnp(key, img, sigma, gray_noise)
    if clip and rounds:
        return jnp.clip(jnp.round(out * 255.0), 0, 255) / 255.0
    if clip:
        return jnp.clip(out, 0, 1)
    if rounds:
        return jnp.round(out * 255.0) / 255.0
    return out


def random_add_gaussian_noise_jnp(key, img, sigma_range=(0, 1.0), gray_prob=0, clip=True, rounds=False):
    import jax

    b = img.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    sigma = jax.random.uniform(k1, (b,), minval=sigma_range[0], maxval=sigma_range[1])
    gray = (jax.random.uniform(k2, (b,)) < gray_prob).astype(img.dtype)
    return add_gaussian_noise_jnp(k3, img, sigma, gray, clip, rounds)


def generate_poisson_noise_jnp(key, img, scale=1.0, gray_noise=0):
    """Batched Poisson noise over NHWC (the *_pt analog, degradations.py:690-738).

    Uses a fixed vals=2^8 quantization per the dominant 8-bit-image case (the
    reference computes vals from unique-value counts, which is data-dependent
    and jit-hostile; for uint8-sourced images both equal 256)."""
    import jax
    import jax.numpy as jnp

    b, h, w, c = img.shape
    gray = jnp.broadcast_to(jnp.asarray(gray_noise, jnp.float32), (b,)).reshape(b, 1, 1, 1)
    scale = jnp.broadcast_to(jnp.asarray(scale, jnp.float32), (b,)).reshape(b, 1, 1, 1)
    img_q = jnp.clip(jnp.round(img * 255.0), 0, 255) / 255.0
    img_gray = jnp.mean(img_q, axis=-1, keepdims=True)
    vals = 256.0
    k1, k2 = jax.random.split(key)
    out_color = jax.random.poisson(k1, img_q * vals).astype(jnp.float32) / vals
    out_gray = jax.random.poisson(k2, img_gray * vals).astype(jnp.float32) / vals
    noise = (out_gray - img_gray) * gray + (out_color - img_q) * (1 - gray)
    return noise * scale


def random_add_poisson_noise_jnp(key, img, scale_range=(0, 1.0), gray_prob=0, clip=True, rounds=False):
    import jax
    import jax.numpy as jnp

    b = img.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    scale = jax.random.uniform(k1, (b,), minval=scale_range[0], maxval=scale_range[1])
    gray = (jax.random.uniform(k2, (b,)) < gray_prob).astype(img.dtype)
    out = img + generate_poisson_noise_jnp(k3, img, scale, gray)
    if clip and rounds:
        return jnp.clip(jnp.round(out * 255.0), 0, 255) / 255.0
    if clip:
        return jnp.clip(out, 0, 1)
    if rounds:
        return jnp.round(out * 255.0) / 255.0
    return out


# ------------------------------------------------------------------ #
# ------------------------------ JPEG ------------------------------ #
# ------------------------------------------------------------------ #


def add_jpg_compression(img, quality=90):
    """cv2 JPEG round-trip (degradations.py:822-838)."""
    img = np.clip(img, 0, 1)
    encode_param = [int(cv2.IMWRITE_JPEG_QUALITY), int(quality)]
    _, encimg = cv2.imencode(".jpg", img * 255.0, encode_param)
    return np.float32(cv2.imdecode(encimg, 1)) / 255.0


def random_add_jpg_compression(img, quality_range=(90, 100)):
    """Random-quality JPEG (degradations.py:841-855)."""
    quality = np.random.uniform(quality_range[0], quality_range[1])
    return add_jpg_compression(img, quality)
