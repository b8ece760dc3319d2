"""FID — Fréchet Inception Distance (reference: basicsr/metrics/fid.py:11-100).

``calculate_fid`` is the exact numpy/scipy Fréchet distance.  Feature
extraction is pluggable: ``extract_features`` drives any jittable NHWC
feature-extractor callable (the reference hard-wires torchvision InceptionV3;
in a zero-egress TPU environment pretrained Inception weights can't be fetched,
so pass your own extractor — e.g. a converted InceptionV3 pytree — or any
perceptual embedding; statistics helpers are provided).
"""

from __future__ import annotations

import numpy as np
from scipy import linalg

from ..utils.registry import METRIC_REGISTRY


def load_inception_extractor(weights_path: str | None = None, resize_input: bool = True, normalize_input: bool = False):
    """The reference's ``load_patched_inception_v3`` (fid.py:11-18), flax.

    ``weights_path`` is an ``.npz`` produced by
    ``scripts/convert_inception_weights.py`` from the pytorch-fid checkpoint;
    ``None`` gives a random-init extractor (useful for plumbing tests only).
    Returns a jitted ``NHWC [0,1] batch → (B, 2048)`` callable.
    """
    import jax
    import jax.numpy as jnp

    from ..archs.inception_arch import InceptionV3Features

    net = InceptionV3Features(resize_input=resize_input, normalize_input=normalize_input)
    if weights_path is not None:
        from ..utils.tree_io import load_tree_npz

        params = load_tree_npz(weights_path)["params"]
    else:
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    fwd = jax.jit(lambda x: net.apply({"params": params}, x))
    return lambda batch: fwd(jnp.asarray(batch))


def extract_features(data_generator, extractor, len_generator=None):
    """Run the extractor over a generator of NHWC batches → (N, D) features."""
    features = []
    for data in data_generator:
        feat = np.asarray(extractor(data))
        features.append(feat.reshape(feat.shape[0], -1))
    return np.concatenate(features, axis=0)


def feature_statistics(features: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of a feature matrix."""
    mu = np.mean(features, axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


@METRIC_REGISTRY.register()
def calculate_fid(mu1, sigma1, mu2, sigma2, eps: float = 1e-6, **kwargs) -> float:
    """Fréchet distance between two Gaussians (reference: fid.py:56-100)."""
    assert mu1.shape == mu2.shape, "Two mean vectors have different lengths"
    assert sigma1.shape == sigma2.shape, "Two covariances have different dimensions"

    cov_sqrt, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)

    if not np.isfinite(cov_sqrt).all():
        print(f"Product of cov matrices is singular. Adding {eps} to diagonal of cov estimates")
        offset = np.eye(sigma1.shape[0]) * eps
        cov_sqrt = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))

    if np.iscomplexobj(cov_sqrt):
        if not np.allclose(np.diagonal(cov_sqrt).imag, 0, atol=1e-3):
            m = np.max(np.abs(cov_sqrt.imag))
            raise ValueError(f"Imaginary component {m}")
        cov_sqrt = cov_sqrt.real

    mean_diff = mu1 - mu2
    mean_norm = mean_diff @ mean_diff
    trace = np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(cov_sqrt)
    return float(mean_norm + trace)
