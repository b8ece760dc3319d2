"""Loss parity vs the PyTorch reference (NHWC ours vs NCHW theirs)."""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture()
def pair(rng):
    a = rng.random((2, 3, 16, 16)).astype(np.float32)
    b = rng.random((2, 3, 16, 16)).astype(np.float32)
    return a, b


def _nhwc(x):
    return jnp.asarray(x.transpose(0, 2, 3, 1))


PARITY_CASES = [
    ("L1Loss", dict(loss_weight=1.3)),
    ("MSELoss", dict()),
    ("CharbonnierLoss", dict(eps=1e-9)),
    ("HuberLoss", dict(delta=0.01)),
    ("SmoothL1Loss", dict()),
    ("PSNRLoss", dict()),
    ("PSNRLoss", dict(toY=True)),
]


class TestLossParity:
    @pytest.mark.parametrize("name,kwargs", PARITY_CASES)
    def test_pixel_losses(self, reference, pair, name, kwargs):
        import torch

        import basicsr.losses.basic_loss as ref_losses

        from dcpt_tpu.losses import build_loss

        a, b = pair
        ours = build_loss({"type": name, **kwargs})(_nhwc(a), _nhwc(b))
        theirs = getattr(ref_losses, name)(**kwargs)(torch.from_numpy(a), torch.from_numpy(b))
        assert float(ours) == pytest.approx(float(theirs), rel=1e-5)

    def test_cross_entropy(self, reference, rng):
        import torch

        from basicsr.losses.basic_loss import CrossEntropyLoss as RefCE

        from dcpt_tpu.losses import CrossEntropyLoss

        logits = rng.standard_normal((8, 5)).astype(np.float32)
        labels = rng.integers(0, 5, 8)
        ours = CrossEntropyLoss(loss_weight=2.0)(jnp.asarray(logits), jnp.asarray(labels))
        theirs = RefCE(loss_weight=2.0)(torch.from_numpy(logits), torch.from_numpy(labels))
        assert float(ours) == pytest.approx(float(theirs), rel=1e-5)

    def test_focal(self, reference, rng):
        import torch

        from basicsr.losses.classify_loss import FocalLoss as RefFocal

        from dcpt_tpu.losses import FocalLoss

        logits = rng.standard_normal((8, 5)).astype(np.float32)
        labels = rng.integers(0, 5, 8)
        ours = FocalLoss(gamma=2.0)(jnp.asarray(logits), jnp.asarray(labels))
        theirs = RefFocal(gamma=2.0)(torch.from_numpy(logits), torch.from_numpy(labels))
        assert float(ours) == pytest.approx(float(theirs), rel=1e-5)

    def test_weighted_tv(self, reference, pair):
        import torch

        from basicsr.losses.basic_loss import WeightedTVLoss as RefTV

        from dcpt_tpu.losses import WeightedTVLoss

        a, _ = pair
        ours = WeightedTVLoss()(_nhwc(a))
        theirs = RefTV()(torch.from_numpy(a))
        assert float(ours) == pytest.approx(float(theirs), rel=1e-5)

    def test_ssim_losses(self, reference, pair):
        import torch

        from basicsr.losses.basic_loss import SSIMMSELoss as RefSSIMMSE

        from dcpt_tpu.losses import SSIMMSELoss

        a, b = pair
        ours = SSIMMSELoss()(_nhwc(a), _nhwc(b))
        theirs = RefSSIMMSE()(torch.from_numpy(a), torch.from_numpy(b))
        assert float(ours) == pytest.approx(float(theirs), rel=1e-3)

    def test_refined_artifact_map(self, reference, pair):
        import torch

        from basicsr.losses.loss_util import get_refined_artifact_map as ref_map

        from dcpt_tpu.losses import get_refined_artifact_map

        gt, out = pair
        ema = np.clip(out + 0.01, 0, 1).astype(np.float32)
        ours = np.asarray(get_refined_artifact_map(_nhwc(gt), _nhwc(out), _nhwc(ema))).transpose(0, 3, 1, 2)
        theirs = ref_map(torch.from_numpy(gt), torch.from_numpy(out), torch.from_numpy(ema)).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_weighted_reduction(self, reference, pair):
        import torch

        from basicsr.losses.basic_loss import L1Loss as RefL1

        from dcpt_tpu.losses import L1Loss

        a, b = pair
        w = (a > 0.5).astype(np.float32)[:, :1]  # single-channel weight
        ours = L1Loss()(_nhwc(a), _nhwc(b), weight=_nhwc(w))
        theirs = RefL1()(torch.from_numpy(a), torch.from_numpy(b), weight=torch.from_numpy(w))
        assert float(ours) == pytest.approx(float(theirs), rel=1e-5)
