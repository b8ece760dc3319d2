"""DCDistModel — fine-tune with a frozen classifier as regularizer.

Reference: ``basicsr/models/degradation_classification_distillation_model.py:23-466``.
One forward of ``net_g`` on the degraded input produces both the restored
image (pixel loss vs GT) and the feature taps, which flow through the FROZEN
``net_dc`` for a classify loss on ``dataset_idx`` (from data or a config
constant broadcast, :140-150).  Gradients reach ``net_g`` through both paths.

The hook filter hard-codes Restormer_origin's last-encoder-block indices
(:88-93) — reproduced by ``select_taps_restormer_origin``; other archs fall
back to plain substring selection.

Test-time quirks reproduced from the reference:
* ``test()`` center-crops ``self.lq`` to 128 AFTER restoring (torchvision
  ``center_crop`` semantics incl. zero-padding of smaller images,
  :239-250) — the crop was input to a now-commented-out classifier call but
  still changes the ``lq`` visual;
* ``validation(...)`` takes per-loader ``clamp`` and ``dataset_idx`` args
  (:264-283); ``clamp=False`` skips clamping, best-metric updates and
  logging; ``dataset_idx`` is accepted (its only consumer is commented out
  upstream, :362-367);
* metrics are accumulated once per image path but computed over the FULL
  batched visuals (:349-359) — a reference quirk kept for number parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses import build_loss
from ..metrics import calculate_metric
from ..utils.logger import get_root_logger
from ..utils.registry import MODEL_REGISTRY
from .dc_util import select_taps, select_taps_restormer_origin
from .sr_model import SRModel
from ..archs import build_network


def center_crop_tv(x, size: int):
    """torchvision ``F.center_crop`` on an NHWC array (reference crop at
    …distillation_model.py:250 → torchvision/transforms/functional.py).

    Pads with zeros when the image is smaller than the crop, then crops at
    ``round((dim - size) / 2)`` — both behaviors matter for <128px val sets.
    """
    _, h, w, _ = x.shape
    pad_l = (size - w) // 2 if size > w else 0
    pad_t = (size - h) // 2 if size > h else 0
    pad_r = (size - w + 1) // 2 if size > w else 0
    pad_b = (size - h + 1) // 2 if size > h else 0
    if pad_l or pad_t or pad_r or pad_b:
        x = jnp.pad(x, ((0, 0), (pad_t, pad_b), (pad_l, pad_r), (0, 0)))
        _, h, w, _ = x.shape
    top = int(round((h - size) / 2.0))
    left = int(round((w - size) / 2.0))
    return x[:, top : top + size, left : left + size, :]


@MODEL_REGISTRY.register()
class DCDistModel(SRModel):
    def __init__(self, opt: dict):
        self.hook_names = opt.get("hook_names")
        self._use_restormer_filter = opt["network_g"].get("type") == "Restormer_origin"
        super().__init__(opt)

    def _select(self, taps):
        if self._use_restormer_filter:
            feats = select_taps_restormer_origin(taps, self.hook_names)
            if feats:
                return feats
        return select_taps(taps, self.hook_names)

    def init_training_settings(self) -> None:
        train_opt = self.opt["train"]

        # frozen classifier (…distillation_model.py:60-64)
        self.net_dc = build_network(self.opt["network_dc"])
        in_ch = self.opt["network_g"].get("img_channel", self.opt["network_g"].get("inp_channels", 3))
        h = self.opt["network_g"].get("h", 64)
        dummy = jnp.zeros((1, h, h, in_ch))
        _, taps = self.net_g.apply({"params": self.params_g}, dummy, skip_tail=True)
        feats = [jax.lax.stop_gradient(f) for f in self._select(taps)[::-1]]
        self.rng, kdc = jax.random.split(self.rng)
        self.params_dc = self.net_dc.init(kdc, dummy, feats)["params"]
        load_path_dc = self.opt["path"].get("pretrain_network_dc")
        if load_path_dc is not None:
            self.params_dc = self.load_network_params(
                self.net_dc, load_path_dc, self.opt["path"].get("strict_load_dc", True),
                self.opt["path"].get("param_key_dc", "params"), init_params=self.params_dc,
            )

        self.ema_decay = train_opt.get("ema_decay", 0)
        if self.ema_decay > 0:
            get_root_logger().info(f"Use Exponential Moving Average with decay: {self.ema_decay}")
            self.params_g_ema = jax.tree_util.tree_map(jnp.copy, self.params_g)

        self.cri_pix = build_loss(train_opt["pixel_opt"]) if train_opt.get("pixel_opt") else None
        self.cri_ldl = None
        self.cri_classify = build_loss(train_opt["classify_opt"]) if train_opt.get("classify_opt") else None

        self.setup_optimizers()
        self.setup_schedulers()
        self._train_step = self._make_train_step()

    def _make_train_step(self):
        net_g, net_dc = self.net_g, self.net_dc
        cri_pixel, cri_classify = self.cri_pix, self.cri_classify
        tx = self.optimizer_g
        ema_decay = self.ema_decay
        zero_specs = self._zero_specs_g
        zero_mesh = self.mesh if zero_specs is not None else None
        from ..parallel.zero import constrain as zero_constrain
        from ..parallel.zero import constrain_replicated as zero_repl
        select = self._select
        # bf16 compute / fp32 masters, fp32 losses+update (SRModel's recipe)
        mixed = (self.opt.get("train") or {}).get("mixed_precision", False)

        @functools.partial(jax.jit, donate_argnums=(0, 2, 3))
        def step(params_g, params_dc, ema, opt_state, lq, gt, dataset_idx, lr):
            def loss_fn(pg):
                pdc = jax.lax.stop_gradient(params_dc)
                if mixed:
                    pg = jax.tree_util.tree_map(lambda t: t.astype(jnp.bfloat16), pg)
                    pdc = jax.tree_util.tree_map(lambda t: t.astype(jnp.bfloat16), pdc)
                    lq_c = lq.astype(jnp.bfloat16)
                else:
                    lq_c = lq
                losses = {}
                total = 0.0
                pix_output, taps = net_g.apply({"params": pg}, lq_c)
                if cri_pixel is not None:
                    l_pixel = cri_pixel(pix_output.astype(jnp.float32), gt)
                    total += l_pixel
                    losses["l_pixel"] = l_pixel
                if cri_classify is not None:
                    feats = select(taps)[::-1]
                    logits = net_dc.apply({"params": pdc}, lq_c, feats)
                    l_classify = cri_classify(logits.astype(jnp.float32), dataset_idx)
                    total += l_classify
                    losses["l_classify"] = l_classify
                return total, losses

            (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params_g)
            updates, new_opt_state = tx.update(grads, opt_state, params_g)
            new_opt_state = zero_constrain(new_opt_state, zero_specs)
            new_params = zero_repl(optax.apply_updates(params_g, jax.tree_util.tree_map(lambda u: -lr * u, updates)), zero_mesh)
            new_ema = (
                jax.tree_util.tree_map(lambda e, p: e * ema_decay + p * (1 - ema_decay), ema, new_params)
                if ema is not None
                else None
            )
            return new_params, new_ema, new_opt_state, losses

        return step

    def feed_data(self, data: dict) -> None:
        super().feed_data(data)
        if "dataset_idx" in data:
            self.dataset_idx = jnp.asarray(data["dataset_idx"])
        if "dataset_idx" in self.opt:
            # config-constant broadcast (…distillation_model.py:144-149)
            batch = self.lq.shape[0]
            self.dataset_idx = jnp.full((batch,), int(self.opt["dataset_idx"]), dtype=jnp.int32)

    def optimize_parameters(self, current_iter: int) -> None:
        lr = jnp.float32(self._current_lrs[0])
        self.params_g, self.params_g_ema, self.opt_state_g, losses = self._train_step(
            self.params_g, self.params_dc, self.params_g_ema, self.opt_state_g,
            self.lq, self.gt, self.dataset_idx, lr,
        )
        self.log_dict = self.reduce_loss_dict(losses)

    # ------------------------------------------------------------------
    # Test / validation (reference: …distillation_model.py:239-460)
    # ------------------------------------------------------------------

    def test(self) -> None:
        """Plain forward, then center-crop lq to 128 (:239-250)."""
        self.pix_output = self._apply(self._infer_params(), self.lq)
        self.output = self.pix_output
        self.lq = center_crop_tv(self.lq, 128)

    def post_test(self) -> None:
        if "window_size" not in self.opt["network_g"]:
            return
        _, h, w, _ = self.pix_output.shape
        self.pix_output = self.pix_output[
            :, : h - self.mod_pad_h * self.scale, : w - self.mod_pad_w * self.scale, :
        ]
        self.output = self.pix_output

    def get_current_visuals(self):
        from collections import OrderedDict

        out = OrderedDict()
        out["lq"] = np.asarray(self.lq)
        out["result"] = np.asarray(self.pix_output, dtype=np.float32)
        if self.gt is not None:
            out["gt"] = np.asarray(self.gt)
        return out

    def validation(self, dataloader, current_iter, tb_logger, save_img=False, clamp=True, dataset_idx=0):
        if self.opt.get("dist"):
            self.dist_validation(dataloader, current_iter, tb_logger, save_img, clamp, dataset_idx)
        else:
            self.nondist_validation(dataloader, current_iter, tb_logger, save_img, clamp, dataset_idx)

    def dist_validation(self, dataloader, current_iter, tb_logger, save_img=False, clamp=True, dataset_idx=0):
        if self.opt.get("rank", 0) == 0:
            self.nondist_validation(dataloader, current_iter, tb_logger, save_img, clamp, dataset_idx)
        # resync the non-zero ranks (see dist_util.barrier)
        from dcpt_tpu.utils.dist_util import barrier

        barrier("dcdist_validation_done")

    def nondist_validation(self, dataloader, current_iter, tb_logger, save_img, clamp=True, dataset_idx=0):
        dataset_name = dataloader.dataset.opt["name"]
        with_metrics = self.opt["val"].get("metrics") is not None
        if with_metrics:
            if not hasattr(self, "metric_results"):
                self.metric_results = {metric: 0 for metric in self.opt["val"]["metrics"].keys()}
            self._initialize_best_metric_results(dataset_name)
            self.metric_results = {metric: 0 for metric in self.metric_results}

        idx = -1
        for idx, val_data in enumerate(dataloader):
            self.feed_data(val_data)
            self.pre_test()
            self.test()
            self.post_test()

            visuals = self.get_current_visuals()
            result = visuals["result"]
            gt = visuals.get("gt")
            if clamp:
                result = np.clip(result, 0, 1)
                if gt is not None:
                    gt = np.clip(gt, 0, 1)
            del self.lq
            self.pix_output = self.output = None
            self.gt = None

            if with_metrics:
                # per-image-path accumulation over the FULL batch (:349-359)
                for _ in val_data["lq_path"]:
                    for name, opt_ in self.opt["val"]["metrics"].items():
                        self.metric_results[name] += calculate_metric(
                            {"img": result, "img2": gt}, dict(opt_, input_order="BHWC")
                        )

            if save_img:
                self._save_validation_images(val_data, result, dataset_name, current_iter)

        if with_metrics and idx >= 0:
            for metric in self.metric_results.keys():
                self.metric_results[metric] /= idx + 1
                if clamp:
                    self._update_best_metric_result(dataset_name, metric, self.metric_results[metric], current_iter)
            if clamp:
                self._log_validation_metric_values(current_iter, dataset_name, tb_logger)
