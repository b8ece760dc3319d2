"""NAFNet numeric parity vs the PyTorch reference (random weights → converted)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _psnr(a, b):
    mse = np.mean((a - b) ** 2)
    return 10 * np.log10(1.0 / max(mse, 1e-30))


@pytest.fixture(scope="module")
def naf_pair(reference):
    """(reference torch net, our flax net, converted params) with random weights."""
    import torch

    from basicsr.archs.nafnet_arch import NAFNetBaseline as RefNAF

    from dcpt_tpu.archs.nafnet_arch import NAFNetBaseline
    from dcpt_tpu.convert.torch_checkpoint import state_dict_to_params

    torch.manual_seed(0)
    ref = RefNAF(img_channel=3, width=8, middle_blk_num=2, enc_blk_nums=[1, 2], dec_blk_nums=[2, 1])
    ref.eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    net = NAFNetBaseline(img_channel=3, width=8, middle_blk_num=2, enc_blk_nums=(1, 2), dec_blk_nums=(2, 1))
    params = state_dict_to_params(state, key_map=NAFNetBaseline.torch_key_map)
    return ref, net, params


class TestNAFNetParity:
    def test_param_tree_matches_init(self, naf_pair):
        from dcpt_tpu.convert.torch_checkpoint import verify_params_match

        ref, net, params = naf_pair
        x = jnp.zeros((1, 32, 32, 3))
        init = net.init(jax.random.PRNGKey(0), x)
        assert verify_params_match(params, init["params"]) == []

    def test_forward_parity(self, naf_pair, rng):
        import torch

        ref, net, params = naf_pair
        x = rng.standard_normal((2, 3, 32, 40)).astype(np.float32) * 0.5
        out, _ = net.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x)).numpy()
        ours = np.asarray(out).transpose(0, 3, 1, 2)
        assert _psnr(ours, ref_out) > 60, f"parity PSNR too low: {_psnr(ours, ref_out):.1f} dB"

    def test_feature_taps_match_hooks(self, naf_pair, rng):
        """taps['encoders.i'] must equal the reference's forward-hook captures."""
        import torch

        ref, net, params = naf_pair
        x = rng.standard_normal((1, 3, 32, 32)).astype(np.float32) * 0.5

        hooked = {}
        handles = []
        for name, module in ref.named_modules():
            if "encoders" in name and name.count(".") == 1:
                handles.append(module.register_forward_hook(lambda m, i, o, n=name: hooked.__setitem__(n, o.detach().numpy())))
        with torch.no_grad():
            ref(torch.from_numpy(x), hook=True)
        for h in handles:
            h.remove()

        _, taps = net.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), skip_tail=True)
        assert set(hooked) <= set(taps)
        for name, ref_feat in hooked.items():
            ours = np.asarray(taps[name]).transpose(0, 3, 1, 2)
            np.testing.assert_allclose(ours, ref_feat, atol=2e-5)

    def test_jit_and_grad(self, naf_pair, rng):
        """The flax net must jit and differentiate cleanly."""
        _, net, params = naf_pair
        x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))

        @jax.jit
        def loss_fn(p, x):
            out, _ = net.apply({"params": p}, x)
            return jnp.mean((out - x) ** 2)

        g = jax.grad(loss_fn)(params, x)
        flat = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(t))) for t in flat)


class TestNAFNetTLSC:
    def test_local_pool_matches_reference(self, reference, rng):
        """Our cumsum local mean vs the reference TLSC AvgPool2d exact path."""
        import torch

        from basicsr.archs.arch_util import AvgPool2d as RefAvgPool

        from dcpt_tpu.archs.arch_util import local_avg_pool

        x = rng.standard_normal((1, 4, 24, 24)).astype(np.float32)
        pool = RefAvgPool(base_size=(16, 16), fast_imp=False, train_size=(1, 3, 16, 16), auto_pad=True)
        with torch.no_grad():
            ref_out = pool(torch.from_numpy(x)).numpy()
        k = pool.kernel_size
        ours = np.asarray(local_avg_pool(jnp.asarray(x.transpose(0, 2, 3, 1)), tuple(k))).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours, ref_out, atol=1e-4)

    def test_nafnet_local_runs(self, rng):
        from dcpt_tpu.archs.nafnet_arch import NAFNet

        net = NAFNet(img_channel=3, width=8, middle_blk_num=1, enc_blk_nums=(1, 1), dec_blk_nums=(1, 1), train_size=(16, 16))
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
        params = net.init(jax.random.PRNGKey(0), x)
        out, _ = net.apply(params, x)
        assert out.shape == (1, 32, 32, 3)


class TestBuildNetwork:
    def test_registry_build(self):
        from dcpt_tpu.archs import build_network

        net = build_network(
            {"type": "NAFNetBaseline", "width": 8, "enc_blk_nums": [1, 1], "middle_blk_num": 1, "dec_blk_nums": [1, 1], "window_size": 16}
        )
        assert net.width == 8
        assert net.enc_blk_nums == (1, 1)


class TestNAFNetOptions:
    def test_remat_matches_and_differentiates(self, rng):
        """remat=True must be numerically identical and differentiable."""
        from dcpt_tpu.archs.nafnet_arch import NAFNetBaseline

        kw = dict(img_channel=3, width=8, middle_blk_num=1, enc_blk_nums=(1,), dec_blk_nums=(1,))
        x = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
        net = NAFNetBaseline(**kw)
        net_r = NAFNetBaseline(**kw, remat=True)
        params = net.init(jax.random.PRNGKey(0), x)
        out, _ = net.apply(params, x)
        out_r, _ = net_r.apply(params, x)
        np.testing.assert_allclose(np.asarray(out_r), np.asarray(out), atol=1e-6)

        g = jax.grad(lambda p: jnp.sum(net_r.apply(p, x)[0] ** 2))(params)
        assert all(np.isfinite(np.asarray(t)).all() for t in jax.tree_util.tree_leaves(g))

    def test_mixed_precision_train_step(self, tmp_path, rng):
        from dcpt_tpu.models import build_model

        opt = {
            "name": "mp", "model_type": "SRModel", "scale": 1, "num_gpu": 1, "manual_seed": 0,
            "is_train": True, "dist": False, "rank": 0, "world_size": 1,
            "network_g": {"type": "NAFNetBaseline", "width": 8, "enc_blk_nums": (1,), "middle_blk_num": 1, "dec_blk_nums": (1,), "h": 16},
            "path": {"models": str(tmp_path), "training_states": str(tmp_path), "visualization": str(tmp_path), "log": str(tmp_path)},
            "train": {
                "mixed_precision": True,
                "optim_g": {"type": "Adam", "lr": 1e-3},
                "scheduler": {"type": "MultiStepRestartLR", "milestones": [100]},
                "pixel_opt": {"type": "L1Loss"}, "total_iter": 2,
            },
            "val": {"metrics": {"psnr": {"type": "calculate_psnr", "crop_border": 0, "image_range": 255.0}}},
        }
        model = build_model(opt)
        lq = rng.random((2, 16, 16, 3)).astype(np.float32)
        gt = np.clip(lq + 0.02, 0, 1).astype(np.float32)
        model.update_learning_rate(1)
        model.feed_data({"lq": lq, "gt": gt})
        model.optimize_parameters(1)
        assert np.isfinite(model.log_dict["l_total"])
        # master params stay fp32
        assert jax.tree_util.tree_leaves(model.params_g)[0].dtype == jnp.float32
