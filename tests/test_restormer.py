"""Restormer / Restormer_origin numeric parity vs the PyTorch reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _psnr(a, b):
    mse = np.mean((a - b) ** 2)
    return 10 * np.log10(1.0 / max(mse, 1e-30))


def _convert(ref_net, our_cls):
    from dcpt_tpu.convert.torch_checkpoint import state_dict_to_params

    state = {k: v.detach().numpy() for k, v in ref_net.state_dict().items()}
    return state_dict_to_params(state, key_map=our_cls.torch_key_map)


TINY = dict(dim=8, num_blocks=[1, 1, 1, 1], num_refinement_blocks=1, heads=[1, 2, 2, 4])


class TestRestormerParity:
    @pytest.fixture(scope="class")
    def pair(self, reference):
        import torch

        from basicsr.archs.restormer_arch import Restormer as RefRestormer

        from dcpt_tpu.archs.restormer_arch import Restormer

        torch.manual_seed(0)
        ref = RefRestormer(**TINY)
        ref.eval()
        net = Restormer(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1, heads=(1, 2, 2, 4))
        return ref, net, _convert(ref, Restormer)

    def test_param_tree(self, pair):
        from dcpt_tpu.convert.torch_checkpoint import verify_params_match

        ref, net, params = pair
        init = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        assert verify_params_match(params, init["params"]) == []

    def test_forward_parity(self, pair, rng):
        import torch

        ref, net, params = pair
        x = rng.standard_normal((1, 3, 32, 32)).astype(np.float32) * 0.4
        out, _ = net.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x)).numpy()
        ours = np.asarray(out).transpose(0, 3, 1, 2)
        assert _psnr(ours, ref_out) > 60, f"parity PSNR: {_psnr(ours, ref_out):.1f} dB"

    def test_taps_match_hook_pass(self, pair, rng):
        """skip_tail must reproduce the hook=True semantics: encoder/decoder taps
        present, refinement/output not applied."""
        import torch

        ref, net, params = pair
        x = rng.standard_normal((1, 3, 16, 16)).astype(np.float32) * 0.4

        hooked = {}
        for name, module in ref.named_modules():
            if "encoder_level" in name and name.count(".") == 0:
                module.register_forward_hook(lambda m, i, o, n=name: hooked.__setitem__(n, o.detach().numpy()))
        with torch.no_grad():
            ref(torch.from_numpy(x), hook=True)

        _, taps = net.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), skip_tail=True)
        assert not any(k.startswith("refinement") for k in taps)
        for name, feat in hooked.items():
            # the count('.')==1 hookable module is 'encoder_levelN.body'
            ours = np.asarray(taps[name + ".body"]).transpose(0, 3, 1, 2)
            np.testing.assert_allclose(ours, feat, atol=3e-5)


class TestRestormerOriginParity:
    def test_forward_parity(self, reference, rng):
        import torch

        from basicsr.archs.restormer_arch import Restormer_origin as RefOrigin

        from dcpt_tpu.archs.restormer_arch import Restormer_origin

        torch.manual_seed(1)
        ref = RefOrigin(**TINY)
        ref.eval()
        net = Restormer_origin(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1, heads=(1, 2, 2, 4))
        params = _convert(ref, Restormer_origin)
        x = rng.standard_normal((1, 3, 32, 32)).astype(np.float32) * 0.4
        out, _ = net.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x)).numpy()
        ours = np.asarray(out).transpose(0, 3, 1, 2)
        assert _psnr(ours, ref_out) > 60, f"parity PSNR: {_psnr(ours, ref_out):.1f} dB"
