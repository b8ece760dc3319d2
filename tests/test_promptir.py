"""PromptIR numeric parity vs the PyTorch reference.

Uses dim=48 (the prompt-fusion channel constants in the reference are
hard-coded for it) with single-block levels to keep the test fast.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _psnr(a, b):
    mse = np.mean((a - b) ** 2)
    return 10 * np.log10(1.0 / max(mse, 1e-30))


@pytest.fixture(scope="module")
def pair(reference):
    import torch

    from basicsr.archs.promptir_arch import PromptIR as RefPromptIR

    from dcpt_tpu.archs.promptir_arch import PromptIR
    from dcpt_tpu.convert.torch_checkpoint import state_dict_to_params

    torch.manual_seed(0)
    ref = RefPromptIR(dim=48, num_blocks=[1, 1, 1, 1], num_refinement_blocks=1, heads=[1, 2, 4, 8])
    ref.eval()
    net = PromptIR(dim=48, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1, heads=(1, 2, 4, 8))
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = state_dict_to_params(state, key_map=PromptIR.torch_key_map)
    return ref, net, params


class TestPromptIRParity:
    def test_param_tree(self, pair):
        from dcpt_tpu.convert.torch_checkpoint import verify_params_match

        ref, net, params = pair
        init = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        assert verify_params_match(params, init["params"]) == []

    def test_forward_parity(self, pair, rng):
        import torch

        ref, net, params = pair
        x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32) * 0.4
        out, _ = net.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x)).numpy()
        ours = np.asarray(out).transpose(0, 3, 1, 2)
        assert _psnr(ours, ref_out) > 60, f"parity PSNR: {_psnr(ours, ref_out):.1f} dB"

    def test_per_block_taps_match_hooks(self, pair, rng):
        import torch

        ref, net, params = pair
        x = rng.standard_normal((1, 3, 32, 32)).astype(np.float32) * 0.4

        hooked = {}
        for name, module in ref.named_modules():
            if "encoder_level" in name and name.count(".") == 1:
                module.register_forward_hook(lambda m, i, o, n=name: hooked.__setitem__(n, o.detach().numpy()))
        with torch.no_grad():
            ref(torch.from_numpy(x), hook=True)

        _, taps = net.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), skip_tail=True)
        assert hooked, "no reference hooks fired"
        for name, feat in hooked.items():
            ours = np.asarray(taps[name]).transpose(0, 3, 1, 2)
            np.testing.assert_allclose(ours, feat, atol=3e-5)
