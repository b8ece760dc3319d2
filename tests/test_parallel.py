"""Multi-device (virtual 8-CPU mesh) data parallelism tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


class TestMesh:
    def test_make_mesh_shapes(self):
        from dcpt_tpu.parallel import make_mesh

        mesh = make_mesh({"data": 8})
        assert mesh.axis_names == ("data",)
        mesh2 = make_mesh({"data": 4, "tensor": 2})
        assert mesh2.devices.shape == (4, 2)

    def test_shard_batch_layout(self, rng):
        from dcpt_tpu.parallel import make_mesh, shard_batch

        mesh = make_mesh({"data": 8})
        x = shard_batch(rng.random((16, 4, 4, 3)).astype(np.float32), mesh)
        assert len(x.sharding.device_set) == 8

    def test_dp_grad_matches_single_device(self, rng):
        """Batch-sharded loss+grad must equal the single-device result."""
        from dcpt_tpu.archs import build_network
        from dcpt_tpu.parallel import make_mesh, replicate, shard_batch

        net = build_network({"type": "NAFNetBaseline", "width": 8, "enc_blk_nums": [1], "middle_blk_num": 1, "dec_blk_nums": [1]})
        x_np = rng.random((8, 8, 8, 3)).astype(np.float32)
        gt_np = rng.random((8, 8, 8, 3)).astype(np.float32)
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))["params"]

        @jax.jit
        def loss_and_grad(p, x, gt):
            def loss_fn(p):
                out, _ = net.apply({"params": p}, x)
                return jnp.mean((out - gt) ** 2)

            return jax.value_and_grad(loss_fn)(p)

        l_single, g_single = loss_and_grad(params, jnp.asarray(x_np), jnp.asarray(gt_np))

        mesh = make_mesh({"data": 8})
        p_rep = replicate(params, mesh)
        x_sh = shard_batch(x_np, mesh)
        gt_sh = shard_batch(gt_np, mesh)
        l_dp, g_dp = loss_and_grad(p_rep, x_sh, gt_sh)

        assert float(l_dp) == pytest.approx(float(l_single), rel=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(g_dp), jax.tree_util.tree_leaves(g_single)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestDryrun:
    def test_graft_dryrun_8dev(self):
        import sys, os

        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from __graft_entry__ import dryrun_multichip

        from dcpt_tpu.parallel import set_default_mesh

        try:
            dryrun_multichip(8)
        finally:
            set_default_mesh(None)
