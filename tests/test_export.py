"""Serving export (dcpt_tpu/export_util.py): StableHLO artifacts round-trip
numerically, keep the batch dimension symbolic, and work through the CLI on a
shipped-style yml.  Beyond-reference capability (the torch reference has no
deployment path) — verified self-consistently on the CPU platform.
"""

import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_net():
    from dcpt_tpu.archs import build_network

    net = build_network({
        "type": "NAFNetBaseline", "width": 8,
        "enc_blk_nums": [1, 1], "middle_blk_num": 1, "dec_blk_nums": [1, 1],
    })
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    # beta/gamma init to zero → blocks are identity; perturb so the artifact
    # computes something distinguishable
    params = jax.tree_util.tree_map_with_path(
        lambda p, a: jnp.full_like(a, 0.3) if p[-1].key in ("beta", "gamma") else a, params)
    return net, params


class TestExportRoundTrip:
    def test_numerics_and_symbolic_batch(self, tiny_net):
        from dcpt_tpu.export_util import export_network, load_exported

        net, params = tiny_net
        blob = export_network(net, params, height=16, width=16, platforms=("cpu",))
        assert isinstance(blob, bytes) and len(blob) > 1000
        restore = load_exported(blob)

        rng = np.random.default_rng(0)
        for bs in (1, 3):  # symbolic batch: one artifact, any batch size
            x = jnp.asarray(rng.random((bs, 16, 16, 3), np.float32))
            want = net.apply({"params": params}, x)[0]
            got = restore(x)
            assert got.shape == (bs, 16, 16, 3)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def test_static_batch_rejects_other_sizes(self, tiny_net):
        from dcpt_tpu.export_util import export_network, load_exported

        net, params = tiny_net
        blob = export_network(net, params, height=16, width=16, platforms=("cpu",),
                              symbolic_batch=False)
        restore = load_exported(blob)
        assert restore(jnp.zeros((1, 16, 16, 3))).shape == (1, 16, 16, 3)
        with pytest.raises(Exception):
            restore(jnp.zeros((2, 16, 16, 3)))

    def test_bf16_artifact(self, tiny_net):
        from dcpt_tpu.export_util import export_network, load_exported

        net, params = tiny_net
        blob = export_network(net, params, height=16, width=16, platforms=("cpu",),
                              dtype=jnp.bfloat16)
        out = load_exported(blob)(jnp.zeros((2, 16, 16, 3), jnp.bfloat16))
        assert out.dtype == jnp.bfloat16 and np.isfinite(np.asarray(out, np.float32)).all()


class TestExportAllFlagships:
    """Every flagship arch exports and round-trips at tiny dims — pins the
    serving path across the zoo (window attention, MDTA, prompts, pixel
    (un)shuffle all survive jax.export's symbolic-batch tracing)."""

    CONFIGS = {  # mirrors the proven tiny configs in test_pipeline_all_archs.py
        "restormer": {"type": "Restormer", "dim": 8, "num_blocks": [1, 1, 1, 1],
                      "num_refinement_blocks": 1, "heads": [1, 2, 2, 4]},
        "promptir": {"type": "PromptIR", "dim": 48, "num_blocks": [1, 1, 1, 1],
                     "num_refinement_blocks": 1, "heads": [1, 2, 4, 8]},
        "swinir": {"type": "SwinIR", "img_size": 16, "embed_dim": 16, "depths": [1, 1],
                   "num_heads": [2, 2], "mlp_ratio": 2.0, "window_size": 8, "upscale": 1},
    }

    @pytest.mark.parametrize("name", sorted(CONFIGS))
    def test_flagship_exports(self, name):
        from dcpt_tpu.archs import build_network
        from dcpt_tpu.export_util import export_network, load_exported

        net = build_network(dict(self.CONFIGS[name]))
        x16 = jnp.zeros((1, 16, 16, 3))
        params = net.init(jax.random.PRNGKey(0), x16)["params"]
        blob = export_network(net, params, height=16, width=16, platforms=("cpu",))
        restore = load_exported(blob)
        x = jnp.asarray(np.random.default_rng(2).random((2, 16, 16, 3), np.float32))
        out = net.apply({"params": params}, x)
        want = out[0] if isinstance(out, tuple) else out
        np.testing.assert_allclose(np.asarray(restore(x)), np.asarray(want), atol=2e-5)


class TestMultiChipExport:
    """Sharded serving artifacts on the virtual 8-device CPU mesh: the
    artifact embeds mesh size + shardings + collectives, and its output must
    equal the in-process path it wraps."""

    def test_dp_sharded_artifact(self, tiny_net):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from dcpt_tpu.export_util import export_network_dp, load_exported

        net, params = tiny_net
        blob = export_network_dp(net, params, devices=4, height=16, width=16, platforms=("cpu",))
        exported = __import__("jax.export", fromlist=["deserialize"]).deserialize(blob)
        assert exported.nr_devices == 4

        restore = load_exported(blob)
        mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
        sh = NamedSharding(mesh, P("data"))
        for bs in (4, 8):  # symbolic: any multiple of the mesh size
            x_np = np.random.default_rng(bs).random((bs, 16, 16, 3), np.float32)
            x = jax.device_put(jnp.asarray(x_np), sh)
            want = net.apply({"params": params}, jnp.asarray(x_np))[0]
            np.testing.assert_allclose(np.asarray(restore(x)), np.asarray(want), atol=1e-5)

    def test_cp_sharded_artifact_matches_inprocess_cp(self):
        """Exported CP program (shard_map + ppermute + psum collectives
        baked into one artifact) == the live spatial_sharded_apply path."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from dcpt_tpu.archs import build_network
        from dcpt_tpu.export_util import export_network_cp, load_exported
        from dcpt_tpu.parallel.spatial import spatial_sharded_apply

        cfg = {"type": "NAFNetBaseline", "width": 8,
               "enc_blk_nums": [1], "middle_blk_num": 1, "dec_blk_nums": [1]}
        plain = build_network(dict(cfg))
        net_cp = build_network(dict(cfg, cp_axis="data", cp_halo=8))
        params = plain.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 32, 3)))["params"]
        params = jax.tree_util.tree_map_with_path(
            lambda p, a: jnp.full_like(a, 0.3) if p[-1].key in ("beta", "gamma") else a, params)

        blob = export_network_cp(net_cp, params, devices=4, height=64, width=32,
                                 halo=8, platforms=("cpu",))
        mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
        sh = NamedSharding(mesh, P(None, "data"))
        x_np = np.random.default_rng(0).random((1, 64, 32, 3), np.float32)
        x = jax.device_put(jnp.asarray(x_np), sh)

        want = spatial_sharded_apply(
            lambda p, xs: net_cp.apply({"params": p}, xs)[0], params, x, mesh, halo=8)
        got = load_exported(blob)(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

        # halo/axis mismatches with the arch's cp options must be rejected
        with pytest.raises(ValueError):
            export_network_cp(net_cp, params, devices=4, height=64, width=32,
                              halo=16, platforms=("cpu",))
        with pytest.raises(ValueError):
            export_network_cp(net_cp, params, devices=4, height=64, width=32,
                              halo=8, axis="spatial", platforms=("cpu",))


class TestExportCli:
    def test_cli_end_to_end(self, tiny_net, tmp_path):
        from dcpt_tpu.export_util import load_exported
        from dcpt_tpu.utils.tree_io import save_tree_npz

        net, params = tiny_net
        ckpt = tmp_path / "net_g.npz"
        save_tree_npz(str(ckpt), {"params": jax.tree.map(np.asarray, params)})
        yml = tmp_path / "export.yml"
        yml.write_text(
            "network_g:\n"
            "  type: NAFNetBaseline\n"
            "  width: 8\n"
            "  enc_blk_nums: [1, 1]\n"
            "  middle_blk_num: 1\n"
            "  dec_blk_nums: [1, 1]\n"
            f"path:\n  pretrain_network_g: {ckpt}\n"
        )
        out = tmp_path / "net.shlo"
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.config.update('jax_platforms', 'cpu');"
             "from dcpt_tpu.export_util import main; main()",
             "-opt", str(yml), "--height", "16", "--width", "16",
             "--out", str(out), "--platforms", "cpu"],
            capture_output=True, text=True, cwd=".",
        )
        assert proc.returncode == 0, proc.stdout + proc.stderr
        restore = load_exported(str(out))
        x = jnp.asarray(np.random.default_rng(1).random((2, 16, 16, 3), np.float32))
        want = net.apply({"params": params}, x)[0]
        np.testing.assert_allclose(np.asarray(restore(x)), np.asarray(want), atol=1e-6)
