"""RCAN + degradation-classifier parity vs the PyTorch reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _psnr(a, b):
    mse = np.mean((a - b) ** 2)
    return 10 * np.log10(1.0 / max(mse, 1e-30))


class TestRCANParity:
    def test_forward_parity(self, reference, rng):
        import torch

        from basicsr.archs.rcan_arch import RCAN as RefRCAN

        from dcpt_tpu.archs.rcan_arch import RCAN
        from dcpt_tpu.convert.torch_checkpoint import state_dict_to_params, verify_params_match

        torch.manual_seed(0)
        ref = RefRCAN(num_in_ch=3, num_out_ch=3, num_feat=16, num_group=2, num_block=2, squeeze_factor=4, upscale=2)
        ref.eval()
        net = RCAN(num_in_ch=3, num_out_ch=3, num_feat=16, num_group=2, num_block=2, squeeze_factor=4, upscale=2)
        state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = state_dict_to_params(state, key_map=RCAN.torch_key_map)
        init = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        assert verify_params_match(params, init["params"]) == []

        x = rng.random((1, 3, 16, 16)).astype(np.float32)
        out, _ = net.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x)).numpy()
        ours = np.asarray(out).transpose(0, 3, 1, 2)
        assert ours.shape == ref_out.shape
        assert _psnr(ours / 255, ref_out / 255) > 55, f"parity PSNR: {_psnr(ours/255, ref_out/255):.1f} dB"


class TestClassifierParity:
    DIMS = (8, 16)

    def _features(self, rng, with_stem):
        # stem: 32→16 after 7×7/2; features must match the running spatial dims
        f0 = rng.standard_normal((2, 16, 16, self.DIMS[0])).astype(np.float32)
        f1 = rng.standard_normal((2, 8, 8, self.DIMS[1])).astype(np.float32)
        return [f0, f1]

    def test_dc_with_image_stem(self, reference, rng):
        import torch

        from basicsr.archs.degrad_classify_arch import PromptIR_DC as RefDC

        from dcpt_tpu.archs.degrad_classify_arch import PromptIR_DC
        from dcpt_tpu.convert.torch_checkpoint import state_dict_to_params, verify_params_match

        torch.manual_seed(0)
        ref = RefDC(feature_dims=list(self.DIMS), num_res_blocks=1, num_classes=5)
        ref.eval()
        net = PromptIR_DC(feature_dims=self.DIMS, num_res_blocks=1, num_classes=5)
        state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = state_dict_to_params(state, key_map=PromptIR_DC.torch_key_map)

        lq = rng.random((2, 3, 32, 32)).astype(np.float32)
        feats = self._features(rng, True)
        init = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)), [jnp.asarray(f) for f in feats])
        assert verify_params_match(params, init["params"]) == []

        out = net.apply({"params": params}, jnp.asarray(lq.transpose(0, 2, 3, 1)), [jnp.asarray(f) for f in feats])
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(lq), [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats]).numpy()
        np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-4)

    def test_dc_no_image(self, reference, rng):
        import torch

        from basicsr.archs.degrad_classify_arch import PromptIR_NoImg_DC as RefDC

        from dcpt_tpu.archs.degrad_classify_arch import PromptIR_NoImg_DC
        from dcpt_tpu.convert.torch_checkpoint import state_dict_to_params

        torch.manual_seed(1)
        ref = RefDC(feature_dims=list(self.DIMS), num_res_blocks=1, num_classes=5)
        ref.eval()
        net = PromptIR_NoImg_DC(feature_dims=self.DIMS, num_res_blocks=1, num_classes=5)
        state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = state_dict_to_params(state, key_map=PromptIR_NoImg_DC.torch_key_map)

        feats = self._features(rng, False)
        lq = rng.random((2, 3, 32, 32)).astype(np.float32)
        out = net.apply({"params": params}, jnp.asarray(lq.transpose(0, 2, 3, 1)), [jnp.asarray(f) for f in feats])
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(lq), [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats]).numpy()
        np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-4)
