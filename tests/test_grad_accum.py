"""Gradient accumulation (`train.accumulate_steps`, optax.MultiSteps).

Beyond reference — the torch DDP loop applies an optimizer step every
iteration; accumulation gives effective batch k×B at unchanged step memory.
Semantics pinned here: k micro-batches → ONE update with the MEAN grad,
exactly an un-accumulated step on the concatenated k×B batch (batch-mean
losses), with params frozen on the intermediate micro-iterations.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _opt(tmp_path, accum, zero=False):
    return {
        "name": "accum", "model_type": "SRModel", "scale": 1, "num_gpu": 0,
        "manual_seed": 0, "is_train": True, "dist": False, "rank": 0, "world_size": 1,
        "network_g": {"type": "NAFNetBaseline", "width": 8, "enc_blk_nums": (1, 1),
                      "middle_blk_num": 1, "dec_blk_nums": (1, 1), "window_size": 4, "h": 16},
        "path": {"models": str(tmp_path / "m"), "training_states": str(tmp_path / "s"),
                 "visualization": str(tmp_path / "v"), "log": str(tmp_path)},
        "train": {
            "optim_g": {"type": "AdamW", "lr": 1e-3, "weight_decay": 1e-4},
            "scheduler": {"type": "CosineAnnealingRestartLR", "periods": [1000], "restart_weights": [1]},
            "pixel_opt": {"type": "L1Loss"},
            "accumulate_steps": accum,
            "zero_sharding": zero,
            "zero_min_bytes": 256,
            "total_iter": 100,
        },
        "val": {"metrics": {}},
    }


def _build(tmp_path, accum, zero=False):
    from dcpt_tpu.models import build_model

    for sub in ("m", "s", "v"):
        os.makedirs(tmp_path / sub, exist_ok=True)
    return build_model(_opt(tmp_path, accum, zero))


def _step(model, batch):
    model.update_learning_rate(1)
    model.feed_data(batch)
    model.optimize_parameters(1)


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


class TestGradAccum:
    def test_micro_steps_freeze_params_then_update(self, tmp_path):
        model = _build(tmp_path / "a", accum=3)
        r = np.random.default_rng(0)
        p0 = _leaves(model.params_g)
        for i in range(3):
            lq = r.random((2, 16, 16, 3)).astype(np.float32)
            _step(model, {"lq": lq, "gt": lq * 0.9})
            p = _leaves(model.params_g)
            if i < 2:  # micro-iterations: zero update, params frozen
                for a, b in zip(p0, p):
                    np.testing.assert_array_equal(a, b)
        changed = any(not np.array_equal(a, b) for a, b in zip(p0, _leaves(model.params_g)))
        assert changed, "no update applied after accumulate_steps iterations"

    def test_two_micro_batches_equal_one_double_batch(self, tmp_path):
        r = np.random.default_rng(1)
        b1 = r.random((2, 16, 16, 3)).astype(np.float32)
        b2 = r.random((2, 16, 16, 3)).astype(np.float32)

        m_acc = _build(tmp_path / "acc", accum=2)
        _step(m_acc, {"lq": b1, "gt": b1 * 0.9})
        _step(m_acc, {"lq": b2, "gt": b2 * 0.9})

        m_big = _build(tmp_path / "big", accum=1)
        big = np.concatenate([b1, b2], axis=0)
        _step(m_big, {"lq": big, "gt": big * 0.9})

        for a, b in zip(_leaves(m_acc.params_g), _leaves(m_big.params_g)):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    def test_composes_with_zero_sharding(self, tmp_path):
        from dcpt_tpu.parallel import make_mesh, set_default_mesh

        mesh = make_mesh({"data": 8})
        set_default_mesh(mesh)
        try:
            opt = _opt(tmp_path / "z", accum=2, zero=True)
            opt["num_gpu"] = 8
            from dcpt_tpu.models import build_model

            for sub in ("m", "s", "v"):
                os.makedirs(tmp_path / "z" / sub, exist_ok=True)
            model = build_model(opt)
            r = np.random.default_rng(2)
            for _ in range(2):
                lq = r.random((8, 16, 16, 3)).astype(np.float32)
                _step(model, {"lq": lq, "gt": lq * 0.9})
            # the MultiSteps grad accumulator is params-sized optimizer state
            # — it must be ZeRO-sharded like the moments
            sharded = [x for x in jax.tree_util.tree_leaves(model.opt_state_g)
                       if hasattr(x, "sharding") and not x.sharding.is_fully_replicated]
            assert sharded, "accumulator/moments fully replicated under zero_sharding"
            assert all(np.isfinite(v) for v in model.log_dict.values())
        finally:
            set_default_mesh(None)

    def test_resume_carries_accumulator(self, tmp_path):
        """Interrupting mid-accumulation and resuming continues to the same
        params as an uninterrupted run (the accumulator and mini_step counter
        live in the packed optimizer state)."""
        r = np.random.default_rng(3)
        batches = [r.random((2, 16, 16, 3)).astype(np.float32) for _ in range(2)]

        m_full = _build(tmp_path / "full", accum=2)
        for b in batches:
            _step(m_full, {"lq": b, "gt": b * 0.9})

        m_a = _build(tmp_path / "a", accum=2)
        _step(m_a, {"lq": batches[0], "gt": batches[0] * 0.9})
        m_a.save(epoch=0, current_iter=1)
        m_a.finalize_checkpoints()

        m_b = _build(tmp_path / "b", accum=2)
        state_path = os.path.join(m_a.opt["path"]["training_states"], "1.state")
        m_b.resume_training(m_b.resume_training_state(state_path))
        m_b.params_g = m_b.load_network_params(
            m_b.net_g, os.path.join(m_a.opt["path"]["models"], "net_g_1.npz"),
            True, "params", init_params=m_b.params_g)
        _step(m_b, {"lq": batches[1], "gt": batches[1] * 0.9})

        for a, b in zip(_leaves(m_full.params_g), _leaves(m_b.params_g)):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
