"""Metric parity tests: our numpy metrics must match the reference bit-for-bit,
and the on-device jnp metrics must match the reference's torch variants."""

import numpy as np
import pytest

from dcpt_tpu.metrics import (
    calculate_msssim,
    calculate_nrmse,
    calculate_psnr,
    calculate_psnr_device,
    calculate_ssim,
    calculate_ssim_device,
)


@pytest.fixture()
def img_pair(rng):
    a = rng.random((2, 3, 32, 40)).astype(np.float32)  # BCHW in [0,1]
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    return a, b


class TestNumpyParity:
    def test_psnr(self, reference, img_pair):
        from basicsr.metrics.psnr_ssim import calculate_psnr as ref_psnr

        a, b = img_pair
        for y in (False, True):
            for border in (0, 4):
                ours = calculate_psnr(a, b, crop_border=border, test_y_channel=y, image_range=255)
                theirs = ref_psnr(a, b, crop_border=border, test_y_channel=y, image_range=255)
                assert ours == pytest.approx(theirs, abs=1e-10)

    def test_psnr_identical_inf(self, img_pair):
        a, _ = img_pair
        assert calculate_psnr(a, a.copy(), crop_border=0) == float("inf")

    def test_ssim(self, reference, img_pair):
        from basicsr.metrics.psnr_ssim import calculate_ssim as ref_ssim

        a, b = img_pair
        for y in (False, True):
            ours = calculate_ssim(a, b, crop_border=0, test_y_channel=y, image_range=255)
            theirs = ref_ssim(a, b, crop_border=0, test_y_channel=y, image_range=255)
            assert ours == pytest.approx(theirs, abs=1e-10)

    def test_msssim(self, reference, rng):
        from basicsr.metrics.psnr_ssim import calculate_msssim as ref_msssim

        a = rng.random((1, 3, 192, 192)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.03, a.shape), 0, 1).astype(np.float32)
        ours = calculate_msssim(a, b, crop_border=0)
        theirs = ref_msssim(a, b, crop_border=0)
        assert ours == pytest.approx(theirs, rel=1e-9)

    def test_nrmse(self, reference, img_pair):
        from basicsr.metrics.psnr_ssim import calculate_nrmse as ref_nrmse

        a, b = img_pair
        ours = calculate_nrmse(a, b, crop_border=0)
        theirs = ref_nrmse(a, b, crop_border=0)
        assert ours == pytest.approx(theirs, abs=1e-12)


class TestDeviceMetrics:
    def test_psnr_device_matches_pt(self, reference, img_pair):
        import torch

        from basicsr.metrics.psnr_ssim import calculate_psnr_pt

        a, b = img_pair
        a_nhwc = a.transpose(0, 2, 3, 1)
        b_nhwc = b.transpose(0, 2, 3, 1)
        ours = np.asarray(calculate_psnr_device(a_nhwc, b_nhwc, crop_border=2))
        theirs = calculate_psnr_pt(torch.from_numpy(a), torch.from_numpy(b), crop_border=2).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4)

    def test_ssim_device_matches_pt(self, reference, img_pair):
        import torch

        from basicsr.metrics.psnr_ssim import calculate_ssim_pt

        a, b = img_pair
        a_nhwc = a.transpose(0, 2, 3, 1)
        b_nhwc = b.transpose(0, 2, 3, 1)
        ours = np.asarray(calculate_ssim_device(a_nhwc, b_nhwc, crop_border=0, image_range=1.0))
        theirs = calculate_ssim_pt(torch.from_numpy(a), torch.from_numpy(b), crop_border=0, image_range=1.0).numpy()
        # device path runs in float32 (TPU-native); reference computes in float64
        np.testing.assert_allclose(ours, theirs, rtol=1e-3)

    def test_device_metrics_jittable(self, img_pair):
        import jax

        a, b = img_pair
        a_nhwc = a.transpose(0, 2, 3, 1)
        b_nhwc = b.transpose(0, 2, 3, 1)
        fn = jax.jit(lambda x, y: calculate_psnr_device(x, y))
        out = fn(a_nhwc, b_nhwc)
        assert out.shape == (2,)


class TestPtAliases:
    """The reference registers ``calculate_psnr_pt``/``calculate_ssim_pt``
    (basicsr/metrics/psnr_ssim.py:78,436); a reference-written yml using those
    names must resolve here and produce the same numbers."""

    def test_psnr_pt_alias_matches_reference(self, reference, img_pair):
        import torch

        from basicsr.metrics.psnr_ssim import calculate_psnr_pt as ref_pt

        from dcpt_tpu.metrics import calculate_psnr_pt

        a, b = img_pair
        ours = calculate_psnr_pt(a, b, crop_border=2)  # NCHW, reference layout
        theirs = float(ref_pt(torch.from_numpy(a), torch.from_numpy(b), crop_border=2).mean())
        assert ours == pytest.approx(theirs, rel=1e-4)

    def test_ssim_pt_alias_matches_reference(self, reference, img_pair):
        import torch

        from basicsr.metrics.psnr_ssim import calculate_ssim_pt as ref_pt

        from dcpt_tpu.metrics import calculate_ssim_pt

        a, b = img_pair
        for image_range in (255, 1.0):  # reference default is 255 even for [0,1] data
            ours = calculate_ssim_pt(a, b, crop_border=0, image_range=image_range)
            theirs = float(
                ref_pt(torch.from_numpy(a), torch.from_numpy(b), crop_border=0, image_range=image_range).mean()
            )
            assert ours == pytest.approx(theirs, rel=1e-3)

    def test_pt_alias_via_dispatch_nhwc(self, img_pair):
        """SRModel dispatches host metrics with input_order='BHWC'."""
        from dcpt_tpu.metrics import calculate_metric

        a, b = img_pair
        out = calculate_metric(
            {"img": a.transpose(0, 2, 3, 1), "img2": b.transpose(0, 2, 3, 1)},
            {"type": "calculate_psnr_pt", "crop_border": 0, "input_order": "BHWC"},
        )
        assert 10 < out < 45


class TestRegistrySurface:
    def test_every_reference_metric_name_resolves(self):
        """Registry-surface parity: each name the reference registers
        (grep METRIC_REGISTRY.register over basicsr/metrics) exists here, so
        any reference yml's ``metrics.*.type`` resolves."""
        from dcpt_tpu.utils.registry import METRIC_REGISTRY

        reference_names = [
            "calculate_psnr",        # psnr_ssim.py:11
            "calculate_psnr_pt",     # psnr_ssim.py:78
            "calculate_ssim",        # psnr_ssim.py:113
            "calculate_ssim_matlab", # psnr_ssim.py:253
            "calculate_msssim",      # psnr_ssim.py:333
            "calculate_ssim_pt",     # psnr_ssim.py:435
            "calculate_nrmse",       # psnr_ssim.py:562
            "calculate_niqe",        # niqe.py:167
            "calculate_fid",         # fid.py:55
        ]
        import dcpt_tpu.metrics  # noqa: F401  (registers on import)

        missing = [n for n in reference_names if n not in METRIC_REGISTRY]
        assert not missing, f"reference metric names unresolvable here: {missing}"


class TestNiqe:
    def test_niqe_matches_reference(self, reference, rng):
        from basicsr.metrics.niqe import calculate_niqe as ref_niqe

        from dcpt_tpu.metrics.niqe import calculate_niqe

        # B=2: the reference squeezes the batch dim, so B=1 hits an assert there
        img = rng.random((2, 224, 224)).astype(np.float32)
        ours = calculate_niqe(img, crop_border=0)
        theirs = ref_niqe(img, crop_border=0)
        assert ours == pytest.approx(theirs, rel=1e-5)


class TestMetricDispatch:
    def test_calculate_metric(self, img_pair):
        from dcpt_tpu.metrics import calculate_metric

        a, b = img_pair
        out = calculate_metric(
            {"img": a, "img2": b},
            {"type": "calculate_psnr", "crop_border": 0, "test_y_channel": False, "image_range": 255.0},
        )
        assert 10 < out < 40
