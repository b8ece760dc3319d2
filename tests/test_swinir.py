"""SwinIR numeric parity vs the PyTorch reference (modified SwinIR: no
rel-pos-bias, no shifted-window mask)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _psnr(a, b):
    mse = np.mean((a - b) ** 2)
    return 10 * np.log10(1.0 / max(mse, 1e-30))


CFG = dict(
    img_size=16,
    embed_dim=16,
    # the reference hard-codes decode depth indices as depths[i+3]
    # (swinir_arch.py:944), so it requires exactly 6 layers
    depths=[1, 1, 1, 2, 1, 1],
    num_heads=[2, 2, 2, 2, 2, 2],
    window_size=4,
    mlp_ratio=2.0,
    upscale=1,
    img_range=1.0,
    upsampler="",
)


def _make_pair(reference, upsampler="", upscale=1):
    import torch

    from basicsr.archs.swinir_arch import SwinIR as RefSwinIR

    from dcpt_tpu.archs.swinir_arch import SwinIR
    from dcpt_tpu.convert.torch_checkpoint import state_dict_to_params

    cfg = dict(CFG, upsampler=upsampler, upscale=upscale)
    torch.manual_seed(0)
    ref = RefSwinIR(**cfg)
    ref.eval()
    jcfg = {k: tuple(v) if isinstance(v, list) else v for k, v in cfg.items()}
    net = SwinIR(**jcfg)
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = state_dict_to_params(state, key_map=SwinIR.torch_key_map)
    return ref, net, params


class TestSwinIRParity:
    def test_param_tree(self, reference):
        from dcpt_tpu.convert.torch_checkpoint import verify_params_match

        ref, net, params = _make_pair(reference)
        init = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        assert verify_params_match(params, init["params"]) == []

    @pytest.mark.parametrize("upsampler,upscale", [("", 1), ("pixelshuffle", 2), ("pixelshuffledirect", 2), ("nearest+conv", 4)])
    def test_forward_parity(self, reference, rng, upsampler, upscale):
        import torch

        ref, net, params = _make_pair(reference, upsampler, upscale)
        x = rng.random((1, 3, 16, 16)).astype(np.float32)
        out, _ = net.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x)).numpy()
        ours = np.asarray(out).transpose(0, 3, 1, 2)
        assert ours.shape == ref_out.shape
        assert _psnr(ours, ref_out) > 60, f"parity PSNR ({upsampler}): {_psnr(ours, ref_out):.1f} dB"

    def test_encode_taps_match_hooks(self, reference, rng):
        import torch

        ref, net, params = _make_pair(reference)
        x = rng.random((1, 3, 16, 16)).astype(np.float32)

        hooked = {}
        for name, module in ref.named_modules():
            if "encode_layers" in name and name.count(".") == 1:
                module.register_forward_hook(lambda m, i, o, n=name: hooked.__setitem__(n, o.detach().numpy()))
        with torch.no_grad():
            ref(torch.from_numpy(x))

        _, taps = net.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), skip_tail=True)
        assert hooked
        for name, feat in hooked.items():
            # reference features are (B, L, C) tokens; ours are NHWC maps
            ours = np.asarray(taps[name]).reshape(feat.shape)
            np.testing.assert_allclose(ours, feat, atol=3e-5)
