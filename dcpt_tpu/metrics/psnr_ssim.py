"""PSNR / SSIM / MS-SSIM / NRMSE.

Two paths:

* **Host (numpy) path** — bit-parity with the reference evaluation protocol
  (``basicsr/metrics/psnr_ssim.py:12-183``): inputs are float images in [0, 1],
  quantised through uint8/uint16 at ``image_range``, RGB→BGR swapped, optionally
  Y-channel, then float64 math.  This is what checkpoint-parity scores are
  computed with.

* **Device (jnp) path** — ``calculate_psnr_device`` / ``calculate_ssim_device``:
  batched, jittable, float inputs in [0, 1], NHWC, no quantisation (matches the
  reference's *_pt variants, psnr_ssim.py:79-110,436-480).  Use these inside
  training loops where a host round-trip would stall the device.
"""

from __future__ import annotations

import functools

import cv2
import numpy as np

from ..utils.registry import METRIC_REGISTRY
from .metric_util import reorder_image, to_y_channel


def _quantize_pair(img: np.ndarray, img2: np.ndarray, image_range: float, crop_border: int, test_y_channel: bool):
    """The shared pre-processing of all numpy metrics (psnr_ssim.py:53-67)."""
    dtype = np.uint8 if image_range == 255 else np.uint16
    if image_range != 1:
        img = (img * float(image_range)).round().astype(dtype)
        img2 = (img2 * float(image_range)).round().astype(dtype)
    if img.shape[-1] == img2.shape[-1] == 3:
        img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
        img2 = cv2.cvtColor(img2, cv2.COLOR_RGB2BGR)
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border, ...]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border, ...]
    if test_y_channel and img.shape[-1] == img2.shape[-1] == 3:
        img = to_y_channel(img, image_range)
        img2 = to_y_channel(img2, image_range)
    return img.astype(np.float64), img2.astype(np.float64)


@METRIC_REGISTRY.register()
def calculate_psnr(img, img2, crop_border, input_order="BCHW", test_y_channel=False, image_range=255, **kwargs):
    """Batch-mean PSNR with the uint8/uint16 round-trip (reference: psnr_ssim.py:12-75)."""
    assert img.shape == img2.shape, f"Image shapes are different: {img.shape}, {img2.shape}."
    imgs = reorder_image(np.asarray(img), input_order=input_order)
    imgs2 = reorder_image(np.asarray(img2), input_order=input_order)

    psnrs = []
    for i in range(imgs.shape[0]):
        a, b = _quantize_pair(imgs[i], imgs2[i], image_range, crop_border, test_y_channel)
        mse = np.mean((a - b) ** 2)
        if mse == 0:
            return float("inf")
        psnrs.append(10.0 * np.log10(image_range * image_range / mse))
    return float(np.array(psnrs).mean())


def _ssim_single(img: np.ndarray, img2: np.ndarray, image_range: float = 255) -> tuple[float, float]:
    """Single-channel MATLAB SSIM via 11×11 Gaussian, valid region (psnr_ssim.py:483-512)."""
    c1 = (0.01 * image_range) ** 2
    c2 = (0.03 * image_range) ** 2
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())

    mu1 = cv2.filter2D(img, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    mu1_sq = mu1**2
    mu2_sq = mu2**2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = cv2.filter2D(img**2, -1, window)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = cv2.filter2D(img2**2, -1, window)[5:-5, 5:-5] - mu2_sq
    sigma12 = cv2.filter2D(img * img2, -1, window)[5:-5, 5:-5] - mu1_mu2

    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    return ssim_map.mean(), cs_map.mean()


@METRIC_REGISTRY.register()
def calculate_ssim(img, img2, crop_border, input_order="BCHW", test_y_channel=False, image_range=255, **kwargs):
    """Per-channel-mean MATLAB SSIM (reference: psnr_ssim.py:114-183)."""
    assert img.shape == img2.shape, f"Image shapes are different: {img.shape}, {img2.shape}."
    imgs = reorder_image(np.asarray(img), input_order=input_order)
    imgs2 = reorder_image(np.asarray(img2), input_order=input_order)

    ssims = []
    for i in range(imgs.shape[0]):
        a, b = _quantize_pair(imgs[i], imgs2[i], image_range, crop_border, test_y_channel)
        for j in range(a.shape[2]):
            s, _ = _ssim_single(a[..., j], b[..., j], image_range)
            ssims.append(s)
    return float(np.array(ssims).mean())


@METRIC_REGISTRY.register()
def calculate_msssim(img, img2, crop_border, weights=None, image_range=255, input_order="BCHW", test_y_channel=False, **kwargs):
    """Multi-scale SSIM (reference: psnr_ssim.py:334-432, including its per-channel downsample loop)."""
    assert img.shape == img2.shape, f"Image shapes are different: {img.shape}, {img2.shape}."
    imgs = reorder_image(np.asarray(img), input_order=input_order)
    imgs2 = reorder_image(np.asarray(img2), input_order=input_order)
    if weights is None:
        weights = [0.0448, 0.2856, 0.3001, 0.2363, 0.1333]

    results = []
    for i in range(imgs.shape[0]):
        a, b = _quantize_pair(imgs[i], imgs2[i], image_range, crop_border, test_y_channel)
        downsample_filter = np.ones((2, 2)) / 4
        ssims, css = [], []
        level = len(weights)
        for _ in range(level):
            for j in range(a.shape[2]):
                s, cs = _ssim_single(a[..., j], b[..., j], image_range)
                ssims.append(s)
                css.append(cs)
                a = cv2.filter2D(a, -1, downsample_filter, anchor=(0, 0), borderType=cv2.BORDER_REFLECT)
                b = cv2.filter2D(b, -1, downsample_filter, anchor=(0, 0), borderType=cv2.BORDER_REFLECT)
                if a.ndim == 2:
                    a = a[..., np.newaxis]
                    b = b[..., np.newaxis]
        result = np.prod(np.power(css[: level - 1], weights[: level - 1])) * (ssims[level - 1] ** weights[level - 1])
        results.append(result)
    return float(np.array(results).mean())


@METRIC_REGISTRY.register()
def calculate_nrmse(img, img2, crop_border, input_order="BCHW", test_y_channel=False, image_range=255, **kwargs):
    """Normalised RMSE (reference: psnr_ssim.py:563-612)."""
    assert img.shape == img2.shape, f"Image shapes are different: {img.shape}, {img2.shape}."
    imgs = reorder_image(np.asarray(img), input_order=input_order)
    imgs2 = reorder_image(np.asarray(img2), input_order=input_order)

    nrmses = []
    for i in range(imgs.shape[0]):
        a, b = _quantize_pair(imgs[i], imgs2[i], image_range, crop_border, test_y_channel)
        rmse = np.sqrt(np.mean((a - b) ** 2))
        if rmse == 0:
            return float("inf")
        nrmses.append(rmse / (a.max() - a.min()))
    return float(np.array(nrmses).mean())


@METRIC_REGISTRY.register()
def calculate_ssim_matlab(img, img2, crop_border, input_order="BCHW", test_y_channel=False, image_range=255, **kwargs):
    """Conv-based MATLAB SSIM with replicate padding (reference: psnr_ssim.py:201-330).

    NOTE: the reference appends each image's LAST per-channel SSIM twice
    (psnr_ssim.py:323-327 keeps a stray extra append); that bug is not
    reproduced — this computes the plain per-channel mean.
    """
    from scipy.ndimage import correlate

    assert img.shape == img2.shape, f"Image shapes are different: {img.shape}, {img2.shape}."
    imgs = reorder_image(np.asarray(img), input_order=input_order)
    imgs2 = reorder_image(np.asarray(img2), input_order=input_order)

    c1 = (0.01 * image_range) ** 2
    c2 = (0.03 * image_range) ** 2
    window = _gaussian_window_11()

    ssims = []
    for i in range(imgs.shape[0]):
        a, b = _quantize_pair(imgs[i], imgs2[i], image_range, crop_border, test_y_channel)
        a = a.astype(np.float32)
        b = b.astype(np.float32)
        for j in range(a.shape[2]):
            x, y = a[..., j], b[..., j]
            conv = functools.partial(correlate, weights=window, mode="nearest")
            mu1, mu2 = conv(x), conv(y)
            mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
            sigma1_sq = conv(x * x) - mu1_sq
            sigma2_sq = conv(y * y) - mu2_sq
            sigma12 = conv(x * y) - mu1_mu2
            ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / ((mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
            ssims.append(ssim_map.mean())
    return float(np.mean(ssims))


# ---------------------------------------------------------------------------
# Device (jnp) path — jittable, batched, NHWC float in [0, 1].
# ---------------------------------------------------------------------------


def _gaussian_window_11() -> np.ndarray:
    kernel = cv2.getGaussianKernel(11, 1.5)
    return np.outer(kernel, kernel.transpose())


@METRIC_REGISTRY.register()
def calculate_psnr_device(img, img2, crop_border=0, test_y_channel=False, **kwargs):
    """On-device PSNR over NHWC float [0,1] (matches calculate_psnr_pt, psnr_ssim.py:79-110)."""
    import jax.numpy as jnp

    from ..utils.color_util import rgb2ycbcr_jnp

    if crop_border != 0:
        img = img[:, crop_border:-crop_border, crop_border:-crop_border, :]
        img2 = img2[:, crop_border:-crop_border, crop_border:-crop_border, :]
    if test_y_channel and img.shape[-1] == 3:
        img = rgb2ycbcr_jnp(img, y_only=True)
        img2 = rgb2ycbcr_jnp(img2, y_only=True)
    img = img.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    mse = jnp.mean((img - img2) ** 2, axis=(1, 2, 3))
    return 10.0 * jnp.log10(1.0 / (mse + 1e-12))


def _pt_alias(device_fn, img, img2, crop_border, test_y_channel, input_order, kwargs):
    """Shared shim for the reference's ``*_pt`` metric names: accept the
    reference's NCHW tensor layout (or an explicit ``input_order``), route
    through the device metric, return the batch-mean float."""
    import jax.numpy as jnp

    img = jnp.asarray(np.asarray(img))
    img2 = jnp.asarray(np.asarray(img2))
    if input_order == "BCHW":
        img = jnp.transpose(img, (0, 2, 3, 1))
        img2 = jnp.transpose(img2, (0, 2, 3, 1))
    per_image = device_fn(img, img2, crop_border=crop_border, test_y_channel=test_y_channel, **kwargs)
    return float(jnp.mean(per_image))


@METRIC_REGISTRY.register()
def calculate_psnr_pt(img, img2, crop_border, test_y_channel=False, input_order="BCHW", **kwargs):
    """Reference-name alias (basicsr/metrics/psnr_ssim.py:78-110): PSNR on
    float [0,1] tensors without the uint8 quantize, batch-meaned.  The device
    math is :func:`calculate_psnr_device`; the reference default layout is
    NCHW (``input_order='BCHW'``)."""
    return _pt_alias(calculate_psnr_device, img, img2, crop_border, test_y_channel, input_order, kwargs)


@METRIC_REGISTRY.register()
def calculate_ssim_pt(img, img2, crop_border, test_y_channel=False, image_range=255, input_order="BCHW", **kwargs):
    """Reference-name alias (basicsr/metrics/psnr_ssim.py:436-480): MATLAB
    SSIM on float [0,1] tensors, batch-meaned.  NOTE the reference computes
    SSIM constants from ``image_range`` (default 255) even though the inputs
    are [0,1]-ranged — that (surprising) semantics is preserved."""
    return _pt_alias(
        functools.partial(calculate_ssim_device, image_range=image_range),
        img, img2, crop_border, test_y_channel, input_order, kwargs)


@METRIC_REGISTRY.register()
def calculate_ssim_device(img, img2, crop_border=0, test_y_channel=False, image_range=1.0, **kwargs):
    """On-device SSIM over NHWC float [0,1] (matches calculate_ssim_pt, psnr_ssim.py:436-559)."""
    import jax
    import jax.numpy as jnp

    from ..utils.color_util import rgb2ycbcr_jnp

    if crop_border != 0:
        img = img[:, crop_border:-crop_border, crop_border:-crop_border, :]
        img2 = img2[:, crop_border:-crop_border, crop_border:-crop_border, :]
    if test_y_channel and img.shape[-1] == 3:
        img = rgb2ycbcr_jnp(img, y_only=True)
        img2 = rgb2ycbcr_jnp(img2, y_only=True)
    img = img.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)

    c1 = (0.01 * image_range) ** 2
    c2 = (0.03 * image_range) ** 2
    chans = img.shape[-1]
    window = jnp.asarray(_gaussian_window_11(), dtype=img.dtype)
    # depthwise 11×11 valid conv: HWIO with feature_group_count = C
    kernel = jnp.tile(window[:, :, None, None], (1, 1, 1, chans))

    conv = functools.partial(
        jax.lax.conv_general_dilated,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=chans,
    )

    mu1 = conv(img, kernel)
    mu2 = conv(img2, kernel)
    mu1_sq = mu1**2
    mu2_sq = mu2**2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = conv(img * img, kernel) - mu1_sq
    sigma2_sq = conv(img2 * img2, kernel) - mu2_sq
    sigma12 = conv(img * img2, kernel) - mu1_mu2

    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    return jnp.mean(ssim_map, axis=(1, 2, 3))
