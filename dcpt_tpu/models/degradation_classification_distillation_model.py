"""DCDistModel — fine-tune with a frozen classifier as regularizer.

Reference: ``basicsr/models/degradation_classification_distillation_model.py:23-466``.
One forward of ``net_g`` on the degraded input produces both the restored
image (pixel loss vs GT) and the feature taps, which flow through the FROZEN
``net_dc`` for a classify loss on ``dataset_idx`` (from data or a config
constant broadcast, :140-150).  Gradients reach ``net_g`` through both paths.

The hook filter hard-codes Restormer_origin's last-encoder-block indices
(:88-93) — reproduced by ``select_taps_restormer_origin``; other archs fall
back to plain substring selection.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from ..losses import build_loss
from ..utils.logger import get_root_logger
from ..utils.registry import MODEL_REGISTRY
from .dc_util import select_taps, select_taps_restormer_origin
from .sr_model import SRModel
from ..archs import build_network


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
        select = self._select

        @functools.partial(jax.jit, donate_argnums=(0, 2, 3))
        def step(params_g, params_dc, ema, opt_state, lq, gt, dataset_idx, lr):
            def loss_fn(pg):
                losses = {}
                total = 0.0
                pix_output, taps = net_g.apply({"params": pg}, lq)
                if cri_pixel is not None:
                    l_pixel = cri_pixel(pix_output, gt)
                    total += l_pixel
                    losses["l_pixel"] = l_pixel
                if cri_classify is not None:
                    feats = select(taps)[::-1]
                    logits = net_dc.apply({"params": jax.lax.stop_gradient(params_dc)}, lq, feats)
                    l_classify = cri_classify(logits, dataset_idx)
                    total += l_classify
                    losses["l_classify"] = l_classify
                return total, losses

            (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params_g)
            updates, new_opt_state = tx.update(grads, opt_state, params_g)
            new_params = optax.apply_updates(params_g, jax.tree_util.tree_map(lambda u: -lr * u, updates))
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
