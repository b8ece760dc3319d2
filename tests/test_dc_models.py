"""DC model family end-to-end: DCModel / DCPTModel / DCTModel / DCDistModel,
plus the full train_pipeline on a tiny DCPT config."""

import os

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _make_images(root, n=4, size=(32, 32)):
    gt_dir = os.path.join(root, "gt")
    os.makedirs(gt_dir, exist_ok=True)
    rng = np.random.default_rng(3)
    for i in range(n):
        img = (rng.random((*size, 3)) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(gt_dir, f"i{i}.png"), img)
    return gt_dir


NETWORK_G = {
    "type": "NAFNetBaseline",
    "width": 8,
    "enc_blk_nums": (1, 1),
    "middle_blk_num": 1,
    "dec_blk_nums": (1, 1),
    "window_size": 4,
    "h": 16,
}
# NAFNet 'ups' taps reversed: [ups.1: 8ch@16×16, ups.0: 16ch@8×8] — matches the DC stage pyramid
NETWORK_DC = {"type": "PromptIR_NoImg_DC", "feature_dims": (8, 16), "num_res_blocks": 1, "num_classes": 2}


def _base_opt(tmp_path):
    return {
        "name": "tiny_dc",
        "scale": 1,
        "num_gpu": 1,
        "manual_seed": 0,
        "is_train": True,
        "dist": False,
        "rank": 0,
        "world_size": 1,
        "hook_names": "ups",
        "network_g": dict(NETWORK_G),
        "network_dc": dict(NETWORK_DC),
        "path": {
            "models": str(tmp_path / "models"),
            "training_states": str(tmp_path / "states"),
            "visualization": str(tmp_path / "vis"),
            "log": str(tmp_path),
        },
        "val": {"metrics": {"psnr": {"type": "calculate_psnr", "crop_border": 0, "image_range": 255.0}}},
    }


def _batch(rng, b=2, hw=16):
    lq = rng.random((b, hw, hw, 3)).astype(np.float32)
    gt = np.clip(lq + 0.03, 0, 1).astype(np.float32)
    idx = np.arange(b) % 2
    return {"lq": lq, "gt": gt, "dataset_idx": idx}


class TestDCModel:
    def test_probe_trains(self, tmp_path, rng):
        from dcpt_tpu.models import build_model

        opt = _base_opt(tmp_path)
        opt["model_type"] = "DCModel"
        opt["train"] = {
            "optim_dc": {"type": "AdamW", "lr": 1e-3, "weight_decay": 1e-4},
            "scheduler": {"type": "MultiStepRestartLR", "milestones": [100]},
            "classify_opt": {"type": "CrossEntropyLoss"},
            "total_iter": 4,
        }
        model = build_model(opt)
        pg_before = jax.tree_util.tree_leaves(model.params_g)[0].copy()
        for it in range(1, 4):
            model.update_learning_rate(it)
            model.feed_data(_batch(rng))
            model.optimize_parameters(it)
        assert "l_classify" in model.log_dict
        # net_g frozen
        np.testing.assert_array_equal(np.asarray(jax.tree_util.tree_leaves(model.params_g)[0]), np.asarray(pg_before))
        logits = model.classify()
        assert logits.shape == (2, 2)


class TestDCPTModel:
    def test_mixed_precision_step(self, tmp_path, rng):
        """bf16 compute / fp32 masters: both nets update, losses finite,
        master params stay fp32 (same recipe as SRModel's mixed step)."""
        from dcpt_tpu.models import build_model

        opt = _base_opt(tmp_path)
        opt["model_type"] = "DCPTModel"
        opt["train"] = {
            "optim_g": {"type": "Adam", "lr": 1e-3},
            "optim_dc": {"type": "Adam", "lr": 1e-3},
            "scheduler": {"type": "CosineAnnealingRestartLR", "periods": [10], "restart_weights": [1]},
            "classify_opt": {"type": "CrossEntropyLoss"},
            "pixel_opt": {"type": "L1Loss"},
            "mixed_precision": True,
            "total_iter": 4,
        }
        model = build_model(opt)
        pg0 = np.asarray(jax.tree_util.tree_leaves(model.params_g)[0]).copy()
        for it in range(1, 3):
            model.update_learning_rate(it)
            model.feed_data(_batch(rng))
            model.optimize_parameters(it)
        assert all(np.isfinite(v) for v in model.log_dict.values())
        leaves = jax.tree_util.tree_leaves(model.params_g)
        assert all(leaf.dtype == jnp.float32 for leaf in leaves)
        assert not np.allclose(np.asarray(leaves[0]), pg0)

    @pytest.mark.parametrize("model_type", ["DCPTModel", "DCTModel"])
    def test_batched_trunk_step_matches_two_pass(self, tmp_path, rng, model_type):
        """``train.batched_trunk`` (VERDICT r4 #4): the concat-2B trunk step
        — tail on the gt half, taps from the lq half (DCT: single full
        forward, identical input ⇒ identical taps) — must match the two-pass
        step exactly: same losses and same updated params from the same init
        and data (convs/LNs/SCA are batch-parallel, so this is an identity,
        not an approximation)."""
        from dcpt_tpu.models import build_model

        models = {}
        for batched in (False, True):
            opt = _base_opt(tmp_path / f"bt{int(batched)}")
            for sub in opt["path"].values():
                os.makedirs(sub, exist_ok=True)
            opt["model_type"] = model_type
            opt["train"] = {
                "optim_g": {"type": "Adam", "lr": 1e-3},
                "optim_dc": {"type": "Adam", "lr": 1e-3},
                "scheduler": {"type": "CosineAnnealingRestartLR", "periods": [10], "restart_weights": [1]},
                "classify_opt": {"type": "CrossEntropyLoss"},
                "pixel_opt": {"type": "L1Loss"},
                "batched_trunk": batched,
                "total_iter": 4,
            }
            model = build_model(opt)  # manual_seed 0 → identical init
            r = np.random.default_rng(7)
            for it in range(1, 3):
                model.update_learning_rate(it)
                model.feed_data(_batch(r))
                model.optimize_parameters(it)
            models[batched] = model

        for k in models[False].log_dict:
            np.testing.assert_allclose(models[True].log_dict[k], models[False].log_dict[k],
                                       rtol=1e-5, atol=1e-6, err_msg=k)
        for a, b in zip(jax.tree_util.tree_leaves(models[False].params_g),
                        jax.tree_util.tree_leaves(models[True].params_g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(models[False].params_dc),
                        jax.tree_util.tree_leaves(models[True].params_dc)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("model_type", ["DCPTModel", "DCTModel"])
    def test_joint_training_updates_both_nets(self, tmp_path, rng, model_type):
        from dcpt_tpu.models import build_model

        opt = _base_opt(tmp_path)
        opt["model_type"] = model_type
        opt["train"] = {
            "optim_g": {"type": "Adam", "lr": 1e-3},
            "optim_dc": {"type": "Adam", "lr": 1e-3},
            "scheduler": {"type": "CosineAnnealingRestartLR", "periods": [10], "restart_weights": [1]},
            "classify_opt": {"type": "CrossEntropyLoss"},
            "pixel_opt": {"type": "L1Loss"},
            "total_iter": 4,
        }
        model = build_model(opt)
        pg0 = np.asarray(jax.tree_util.tree_leaves(model.params_g)[0]).copy()
        pdc0 = np.asarray(jax.tree_util.tree_leaves(model.params_dc)[0]).copy()
        for it in range(1, 3):
            model.update_learning_rate(it)
            model.feed_data(_batch(rng))
            model.optimize_parameters(it)
        assert set(model.log_dict) == {"l_pix", "l_classify"}
        assert not np.allclose(np.asarray(jax.tree_util.tree_leaves(model.params_g)[0]), pg0)
        assert not np.allclose(np.asarray(jax.tree_util.tree_leaves(model.params_dc)[0]), pdc0)
        model.save(0, 2)
        assert os.path.exists(os.path.join(opt["path"]["models"], "net_g_2.npz"))
        assert os.path.exists(os.path.join(opt["path"]["models"], "net_dc_2.npz"))


class TestDCDistModel:
    def test_finetune_with_frozen_classifier(self, tmp_path, rng):
        from dcpt_tpu.models import build_model

        opt = _base_opt(tmp_path)
        opt["model_type"] = "DCDistModel"
        opt["dataset_idx"] = 1  # config-constant label broadcast
        opt["train"] = {
            "ema_decay": 0.99,
            "optim_g": {"type": "Adam", "lr": 1e-3},
            "scheduler": {"type": "CosineAnnealingRestartLR", "periods": [10], "restart_weights": [1]},
            "classify_opt": {"type": "CrossEntropyLoss"},
            "pixel_opt": {"type": "L1Loss"},
            "total_iter": 4,
        }
        model = build_model(opt)
        pdc0 = np.asarray(jax.tree_util.tree_leaves(model.params_dc)[0]).copy()
        for it in range(1, 3):
            model.update_learning_rate(it)
            batch = _batch(rng)
            del batch["dataset_idx"]
            model.feed_data(batch)
            model.optimize_parameters(it)
        assert set(model.log_dict) == {"l_pixel", "l_classify"}
        np.testing.assert_array_equal(np.asarray(jax.tree_util.tree_leaves(model.params_dc)[0]), pdc0)

    @pytest.mark.parametrize("model_type", ["DCModel", "DCDistModel"])
    def test_mixed_precision_step(self, tmp_path, rng, model_type):
        """mixed_precision across the rest of the DC family: finite losses,
        trainable net updates, masters stay fp32."""
        from dcpt_tpu.models import build_model

        opt = _base_opt(tmp_path)
        opt["model_type"] = model_type
        opt["train"] = {
            "scheduler": {"type": "CosineAnnealingRestartLR", "periods": [10], "restart_weights": [1]},
            "classify_opt": {"type": "CrossEntropyLoss"},
            "mixed_precision": True,
            "total_iter": 4,
        }
        if model_type == "DCModel":
            opt["train"]["optim_dc"] = {"type": "Adam", "lr": 1e-3}
            trained = "params_dc"
        else:
            opt["train"]["optim_g"] = {"type": "Adam", "lr": 1e-3}
            opt["train"]["pixel_opt"] = {"type": "L1Loss"}
            trained = "params_g"
        model = build_model(opt)
        before = np.asarray(jax.tree_util.tree_leaves(getattr(model, trained))[0]).copy()
        for it in range(1, 3):
            model.update_learning_rate(it)
            model.feed_data(_batch(rng))
            model.optimize_parameters(it)
        assert all(np.isfinite(v) for v in model.log_dict.values())
        leaves = jax.tree_util.tree_leaves(getattr(model, trained))
        assert all(leaf.dtype == jnp.float32 for leaf in leaves)
        assert not np.allclose(np.asarray(leaves[0]), before)


class TestTrainPipeline:
    def test_dcpt_train_pipeline(self, tmp_path):
        """Full train loop: ConcatDataset over 2 degradations → DCPT steps → save."""
        gt_dir = _make_images(str(tmp_path))
        yml = tmp_path / "train_tiny.yml"
        yml.write_text(
            f"""
name: debug_tiny_dcpt
model_type: DCPTModel
scale: 1
num_gpu: 0
manual_seed: 0
hook_names: ups
datasets:
  train:
    name: dcpt2d
    type: ConcatDataset
    phase: train
    gt_size: 16
    use_hflip: true
    use_rot: true
    batch_size_per_gpu: 2
    num_worker_per_gpu: 0
    dataset_enlarge_ratio: 1
    datasets:
      d1:
        name: noise
        type: PairedImageDenoiseDataset
        dataroot_gt: {gt_dir}
        io_backend: {{type: disk}}
        sigma_type: constant
        sigma_range: 25
      d2:
        name: jpeg
        type: PairedImageJPEGCARDataset
        dataroot_gt: {gt_dir}
        io_backend: {{type: disk}}
        q_type: constant
        q_range: 10
network_g:
  type: NAFNetBaseline
  width: 8
  enc_blk_nums: [1, 1]
  middle_blk_num: 1
  dec_blk_nums: [1, 1]
  window_size: 4
  h: 16
network_dc:
  type: PromptIR_NoImg_DC
  feature_dims: [8, 16]
  num_res_blocks: 1
  num_classes: 2
path: {{}}
train:
  total_iter: 4
  warmup_iter: -1
  optim_g: {{type: Adam, lr: 1.0e-3}}
  optim_dc: {{type: Adam, lr: 1.0e-3}}
  scheduler: {{type: CosineAnnealingRestartLR, periods: [4], restart_weights: [1]}}
  pixel_opt: {{type: L1Loss}}
  classify_opt: {{type: CrossEntropyLoss}}
logger:
  print_freq: 1
  save_checkpoint_freq: 4
  use_tb_logger: false
"""
        )
        import os as _os

        cwd = _os.getcwd()
        _os.chdir(tmp_path)
        try:
            from dcpt_tpu.train import train_pipeline

            model = train_pipeline(str(tmp_path), args=["-opt", str(yml)])
        finally:
            _os.chdir(cwd)
        assert model.log_dict["l_classify"] > 0
        models_dir = tmp_path / "experiments" / "debug_tiny_dcpt" / "models"
        assert (models_dir / "net_g_latest.npz").exists()
        assert (models_dir / "net_dc_latest.npz").exists()


class TestDCDistEval:
    """Test-time quirks of the reference DCDistModel (:239-460)."""

    def _eval_model(self, tmp_path):
        from dcpt_tpu.models import build_model

        opt = _base_opt(tmp_path)
        opt["model_type"] = "DCDistModel"
        opt["is_train"] = False
        return build_model(opt), opt

    def test_center_crop_128_after_restore(self, tmp_path, rng):
        """test() restores, THEN center-crops lq to 128 (:239-250)."""
        model, _ = self._eval_model(tmp_path)
        lq = rng.random((1, 160, 144, 3)).astype(np.float32)
        model.feed_data({"lq": lq})
        model.pre_test()
        model.test()
        model.post_test()
        assert model.pix_output.shape == (1, 160, 144, 3)
        assert model.lq.shape == (1, 128, 128, 3)
        # torchvision center_crop: top=round((160-128)/2)=16, left=round((144-128)/2)=8
        np.testing.assert_array_equal(np.asarray(model.lq), lq[:, 16:144, 8:136, :])

    def test_center_crop_pads_small_inputs(self, tmp_path, rng):
        """torchvision pads with zeros when the image is smaller than 128."""
        model, _ = self._eval_model(tmp_path)
        lq = rng.random((1, 60, 40, 3)).astype(np.float32)
        model.feed_data({"lq": lq})
        model.pre_test()
        model.test()
        model.post_test()
        got = np.asarray(model.lq)
        assert got.shape == (1, 128, 128, 3)
        np.testing.assert_array_equal(got[:, 34:94, 44:84, :], lq)
        assert got[:, :34].sum() == 0 and got[:, 94:].sum() == 0
        assert got[:, :, :44].sum() == 0 and got[:, :, 84:].sum() == 0

    def test_validation_signature_and_batch_quirk(self, tmp_path, rng):
        """validation takes clamp/dataset_idx; metrics accumulate once per
        image path over the FULL batch (:349-359)."""
        from types import SimpleNamespace

        from dcpt_tpu.metrics import calculate_metric

        model, opt = self._eval_model(tmp_path)
        lq = rng.random((2, 16, 16, 3)).astype(np.float32)
        gt = np.clip(lq + 0.02, 0, 1).astype(np.float32)
        batch = {"lq": lq, "gt": gt, "lq_path": ["a.png", "b.png"]}

        class _Loader:
            dataset = SimpleNamespace(opt={"name": "dist_val"})

            def __iter__(self):
                return iter([batch])

        model.validation(_Loader(), 1, None, save_img=False, clamp=True, dataset_idx=3)
        restored = np.asarray(
            model._apply(model.params_g, jnp.asarray(lq)), dtype=np.float32
        ).clip(0, 1)
        expect = calculate_metric(
            {"img": restored, "img2": gt},
            {"type": "calculate_psnr", "crop_border": 0, "image_range": 255.0, "input_order": "BHWC"},
        )
        # two lq_paths in one batch → metric counted twice, divided by 1 batch
        assert model.metric_results["psnr"] == pytest.approx(2 * expect, rel=1e-5)
        best_iter = model.best_metric_results["dist_val"]["psnr"]["iter"]

        # clamp=False computes metrics but skips best-metric update + logging
        model.validation(_Loader(), 2, None, save_img=False, clamp=False)
        assert model.best_metric_results["dist_val"]["psnr"]["iter"] == best_iter
