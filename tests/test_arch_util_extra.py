"""flow_warp / LocalInstanceNorm2d / ssim_matlab parity tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestFlowWarp:
    def test_matches_reference_grid_sample(self, reference, rng):
        import torch

        from basicsr.archs.arch_util import flow_warp as ref_warp

        from dcpt_tpu.archs.arch_util import flow_warp

        x = rng.random((2, 3, 12, 16)).astype(np.float32)
        flow = (rng.random((2, 12, 16, 2)).astype(np.float32) - 0.5) * 4
        with torch.no_grad():
            theirs = ref_warp(torch.from_numpy(x), torch.from_numpy(flow)).numpy()
        ours = np.asarray(flow_warp(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(flow)))
        np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), theirs, atol=1e-4)

    def test_zero_flow_identity(self, rng):
        from dcpt_tpu.archs.arch_util import flow_warp

        x = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
        out = flow_warp(x, jnp.zeros((1, 8, 8, 2)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


class TestLocalInstanceNorm:
    def test_global_stats_matches_instance_norm(self, rng):
        import jax

        from dcpt_tpu.archs.arch_util import LocalInstanceNorm2d

        x = jnp.asarray(rng.random((2, 8, 8, 4)).astype(np.float32))
        mod = LocalInstanceNorm2d(4)
        out = mod.apply(mod.init(jax.random.PRNGKey(0), x), x)
        out_np = np.asarray(out)
        # per-sample/channel normalized
        assert abs(out_np.mean(axis=(1, 2))).max() < 1e-4
        assert abs(out_np.std(axis=(1, 2)) - 1).max() < 1e-2


class TestSSIMMatlab:
    def test_close_to_standard_ssim(self, rng):
        """The conv-based MATLAB SSIM should be within ~0.02 of the valid-window SSIM."""
        from dcpt_tpu.metrics.psnr_ssim import calculate_ssim, calculate_ssim_matlab

        a = rng.random((1, 3, 64, 64)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
        full = calculate_ssim_matlab(a, b, crop_border=0)
        valid = calculate_ssim(a, b, crop_border=0)
        assert abs(full - valid) < 0.03
