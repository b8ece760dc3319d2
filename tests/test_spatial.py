"""Spatial-sharded inference tests on the virtual 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestSpatialSharding:
    def test_pure_conv_exact(self, rng):
        """With halo ≥ receptive field, a pure conv stack is exact everywhere."""
        import flax.linen as nn

        from dcpt_tpu.parallel import make_mesh
        from dcpt_tpu.parallel.spatial import spatial_sharded_apply

        class ConvStack(nn.Module):
            @nn.compact
            def __call__(self, x):
                for i in range(3):
                    x = nn.Conv(8 if i < 2 else 3, (3, 3), padding=((1, 1), (1, 1)))(x)
                    x = nn.relu(x) if i < 2 else x
                return x

        net = ConvStack()
        x = jnp.asarray(rng.random((1, 64, 32, 3)).astype(np.float32))
        params = net.init(jax.random.PRNGKey(0), x)["params"]

        # reflect-pad reference (the sharded version reflect-pads outer edges)
        full = net.apply({"params": params}, x)

        mesh = make_mesh({"data": 8})
        fwd = lambda p, xs: net.apply({"params": p}, xs)
        out = spatial_sharded_apply(fwd, params, x, mesh, halo=4)
        assert out.shape == full.shape
        # interior rows are exact; edge rows differ only by reflect vs zero pad
        np.testing.assert_allclose(np.asarray(out)[:, 4:-4], np.asarray(full)[:, 4:-4], atol=1e-5)

    def test_nafnet_tlsc_interior_close(self, rng):
        """NAFNet in TLSC local-stats mode: sharded output ≈ full output away
        from shard boundaries (same contract as test_tile halos)."""
        from dcpt_tpu.archs.nafnet_arch import NAFNet
        from dcpt_tpu.parallel import make_mesh
        from dcpt_tpu.parallel.spatial import spatial_sharded_apply

        net = NAFNet(width=8, enc_blk_nums=(1,), middle_blk_num=1, dec_blk_nums=(1,), train_size=(16, 16))
        x = jnp.asarray(rng.random((1, 64, 32, 3)).astype(np.float32))
        variables = net.init(jax.random.PRNGKey(0), x)

        full, _ = net.apply(variables, x)
        mesh = make_mesh({"data": 4})
        fwd = lambda p, xs: net.apply({"params": p}, xs)[0]
        out = spatial_sharded_apply(fwd, variables["params"], x, mesh, halo=8)
        assert out.shape == full.shape
        diff = np.abs(np.asarray(out) - np.asarray(full))
        # interior of each 16-row shard, away from the 8-row halo seams
        assert np.median(diff) < 0.05
