"""ZeRO-1 optimizer-state sharding (`train.zero_sharding`, parallel/zero.py).

The reference replicates params AND Adam moments on every DDP rank
(basicsr/models/base_model.py:100-118); ZeRO-1 shards the moments over the
data axis while keeping step numerics exactly the replicated step's.  These
tests pin (a) the static spec chooser, (b) that the state is REALLY sharded
(per-device shard < global), and (c) end-to-end step parity on the virtual
8-device mesh for SRModel and DCPTModel.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


@pytest.fixture
def mesh8():
    from dcpt_tpu.parallel import make_mesh, set_default_mesh

    mesh = make_mesh({"data": 8})
    set_default_mesh(mesh)
    yield mesh
    set_default_mesh(None)


@pytest.fixture
def rng():
    return np.random.default_rng(3)


class TestZeroSpecs:
    def test_spec_chooser(self, mesh8):
        from dcpt_tpu.parallel.zero import zero_specs

        tree = {
            "conv": jnp.zeros((3, 3, 64, 128)),      # big, two divisible dims
            "bias": jnp.zeros((128,)),               # divisible but tiny
            "count": jnp.zeros((), jnp.int32),       # scalar
            "odd": jnp.zeros((9, 300, 300)),         # only dims 1,2 divisible... 300%8=4 → none
        }
        specs = zero_specs(tree, mesh8, min_bytes=1 << 10)
        assert specs["conv"].spec == P(None, None, None, "data")  # largest dim wins, later index on tie
        assert specs["bias"].spec == P()
        assert specs["count"].spec == P()
        assert specs["odd"].spec == P()

    def test_trivial_axis_replicates(self, rng):
        from dcpt_tpu.parallel import make_mesh
        from dcpt_tpu.parallel.zero import zero_specs

        mesh1 = make_mesh({"data": 1}, devices=jax.devices()[:1])
        specs = zero_specs({"w": jnp.zeros((256, 256))}, mesh1, min_bytes=0)
        assert specs["w"].spec == P()

    def test_shard_opt_state_places_shards(self, mesh8):
        import optax

        from dcpt_tpu.parallel.zero import shard_opt_state

        params = {"w": jnp.ones((256, 256)), "b": jnp.ones((8,))}
        state = optax.adam(1e-3).init(params)
        placed, specs = shard_opt_state(state, mesh8, min_bytes=1 << 10)
        mu_w = placed[0].mu["w"]
        assert len(mu_w.sharding.device_set) == 8
        assert mu_w.addressable_shards[0].data.shape == (256, 32)
        # bias moment stays replicated
        assert placed[0].mu["b"].sharding.is_fully_replicated


def _sr_opt(tmp_path, zero):
    return {
        "name": "zero_sr", "model_type": "SRModel", "scale": 1, "num_gpu": 8,
        "manual_seed": 0, "is_train": True, "dist": False, "rank": 0, "world_size": 1,
        "network_g": {"type": "NAFNetBaseline", "width": 8, "enc_blk_nums": (1, 1),
                      "middle_blk_num": 1, "dec_blk_nums": (1, 1), "window_size": 4, "h": 16},
        "path": {"models": str(tmp_path / "m"), "training_states": str(tmp_path / "s"),
                 "visualization": str(tmp_path / "v"), "log": str(tmp_path)},
        "train": {
            "ema_decay": 0.99,
            "optim_g": {"type": "AdamW", "lr": 1e-3, "weight_decay": 1e-4},
            "scheduler": {"type": "CosineAnnealingRestartLR", "periods": [10], "restart_weights": [1]},
            "pixel_opt": {"type": "L1Loss"},
            "zero_sharding": zero,
            # zero test thresholds: tiny net → lower the byte floor so the
            # 8-wide conv moments actually shard on the test geometry
            "zero_min_bytes": 256,
            "total_iter": 4,
        },
        "val": {"metrics": {}},
    }


class TestModelZero:
    def _run(self, tmp_path, rng, zero, steps=2):
        from dcpt_tpu.models import build_model

        for sub in ("m", "s", "v"):
            os.makedirs(tmp_path / sub, exist_ok=True)
        model = build_model(_sr_opt(tmp_path, zero))
        r = np.random.default_rng(11)
        for it in range(1, steps + 1):
            model.update_learning_rate(it)
            lq = r.random((8, 16, 16, 3)).astype(np.float32)
            model.feed_data({"lq": lq, "gt": lq * 0.9 + 0.05})
            model.optimize_parameters(it)
        return model

    def test_step_matches_replicated(self, tmp_path, rng, mesh8):
        m_rep = self._run(tmp_path / "rep", rng, zero=False)
        m_zero = self._run(tmp_path / "zero", rng, zero=True)
        for k in m_rep.log_dict:
            np.testing.assert_allclose(m_zero.log_dict[k], m_rep.log_dict[k],
                                       rtol=1e-5, atol=1e-6, err_msg=k)
        for a, b in zip(jax.tree_util.tree_leaves(m_rep.params_g),
                        jax.tree_util.tree_leaves(m_zero.params_g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    def test_moments_are_sharded_and_params_replicated(self, tmp_path, rng, mesh8):
        model = self._run(tmp_path / "z2", rng, zero=True)
        leaves = [x for x in jax.tree_util.tree_leaves(model.opt_state_g)
                  if hasattr(x, "sharding") and x.ndim >= 1 and x.nbytes >= 256]
        sharded = [x for x in leaves if not x.sharding.is_fully_replicated]
        assert sharded, "no optimizer-state leaf is sharded — ZeRO is a no-op"
        for x in sharded:
            assert x.addressable_shards[0].data.size < x.size
        # ZeRO-1: params stay replicated (no forward-path collectives)
        for p in jax.tree_util.tree_leaves(model.params_g):
            assert p.sharding.is_fully_replicated

    def test_resume_roundtrip_keeps_parity(self, tmp_path, rng, mesh8):
        """save → restore re-places the shards (unpack lands host arrays);
        resumed steps continue identically to the uninterrupted zero run."""
        from dcpt_tpu.models import build_model
        from dcpt_tpu.parallel import replicate

        m_full = self._run(tmp_path / "full", rng, zero=True, steps=4)

        m_a = self._run(tmp_path / "a", rng, zero=True, steps=2)
        m_a.save(epoch=0, current_iter=2)
        m_a.finalize_checkpoints()
        state_path = os.path.join(m_a.opt["path"]["training_states"], "2.state")

        for sub in ("m", "s", "v"):
            os.makedirs(tmp_path / "b" / sub, exist_ok=True)
        m_b = build_model(_sr_opt(tmp_path / "b", zero=True))
        m_b.resume_training(m_b.resume_training_state(state_path))
        m_b.params_g = replicate(m_b.load_network_params(
            m_b.net_g, os.path.join(m_a.opt["path"]["models"], "net_g_2.npz"),
            True, "params", init_params=m_b.params_g), m_b.mesh)
        # restored state must be re-placed on the ZeRO shards, not replicated
        sharded = [x for x in jax.tree_util.tree_leaves(m_b.opt_state_g)
                   if hasattr(x, "sharding") and not x.sharding.is_fully_replicated]
        assert sharded, "resume dropped the ZeRO placement"
        r = np.random.default_rng(11)
        for it in range(1, 5):
            lq = r.random((8, 16, 16, 3)).astype(np.float32)
            if it >= 3:
                m_b.update_learning_rate(it)
                m_b.feed_data({"lq": lq, "gt": lq * 0.9 + 0.05})
                m_b.optimize_parameters(it)
        for a, b in zip(jax.tree_util.tree_leaves(m_full.params_g),
                        jax.tree_util.tree_leaves(m_b.params_g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def _dcpt_opt(tmp_path, zero):
    return {
        "name": "zero_dcpt", "model_type": "DCPTModel", "scale": 1, "num_gpu": 8,
        "manual_seed": 0, "is_train": True, "dist": False, "rank": 0, "world_size": 1,
        "hook_names": "ups", "init_size": 16,
        "network_g": {"type": "NAFNetBaseline", "width": 8, "enc_blk_nums": (1, 1),
                      "middle_blk_num": 1, "dec_blk_nums": (1, 1), "window_size": 4, "h": 16},
        "network_dc": {"type": "PromptIR_NoImg_DC", "feature_dims": (8, 16),
                       "num_res_blocks": 1, "num_classes": 5},
        "path": {"models": str(tmp_path / "m"), "training_states": str(tmp_path / "s"),
                 "visualization": str(tmp_path / "v"), "log": str(tmp_path)},
        "train": {
            "optim_g": {"type": "AdamW", "lr": 1e-3, "weight_decay": 1e-4},
            "optim_dc": {"type": "AdamW", "lr": 1e-3, "weight_decay": 1e-4},
            "scheduler": {"type": "CosineAnnealingRestartLR", "periods": [10], "restart_weights": [1]},
            "classify_opt": {"type": "CrossEntropyLoss"},
            "pixel_opt": {"type": "L1Loss"},
            "zero_sharding": zero,
            "zero_min_bytes": 256,
            "total_iter": 4,
        },
        "val": {"metrics": {}},
    }


class TestDCPTZero:
    def _run(self, tmp_path, zero):
        from dcpt_tpu.models import build_model

        for sub in ("m", "s", "v"):
            os.makedirs(tmp_path / sub, exist_ok=True)
        model = build_model(_dcpt_opt(tmp_path, zero))
        r = np.random.default_rng(5)
        for it in range(1, 3):
            model.update_learning_rate(it)
            lq = r.random((8, 16, 16, 3)).astype(np.float32)
            model.feed_data({"lq": lq, "gt": lq * 0.9 + 0.05,
                             "dataset_idx": r.integers(0, 5, 8)})
            model.optimize_parameters(it)
        return model

    def test_step_matches_replicated(self, tmp_path, mesh8):
        m_rep = self._run(tmp_path / "rep", zero=False)
        m_zero = self._run(tmp_path / "zero", zero=True)
        for k in m_rep.log_dict:
            np.testing.assert_allclose(m_zero.log_dict[k], m_rep.log_dict[k],
                                       rtol=1e-5, atol=1e-6, err_msg=k)
        # sharded-update float reassociation: ≤5e-6 abs on single params
        for tree_a, tree_b in ((m_rep.params_g, m_zero.params_g),
                               (m_rep.params_dc, m_zero.params_dc)):
            for a, b in zip(jax.tree_util.tree_leaves(tree_a),
                            jax.tree_util.tree_leaves(tree_b)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-4, atol=1e-5)

    def test_both_opt_states_sharded(self, tmp_path, mesh8):
        model = self._run(tmp_path / "z", zero=True)
        for state in (model.opt_state_g, model.opt_state_dc):
            sharded = [x for x in jax.tree_util.tree_leaves(state)
                       if hasattr(x, "sharding") and not x.sharding.is_fully_replicated]
            assert sharded, "opt state fully replicated — ZeRO is a no-op"
