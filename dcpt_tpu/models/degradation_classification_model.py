"""DCModel — stage-2 probe: frozen restoration net, trainable classifier.

Reference: ``basicsr/models/degradation_classification_model.py:17-289``.
The restoration net runs feature-only (stop-gradient = the reference's detached
hooks, :94-97); the classifier consumes the reversed feature pyramid and trains
with CE/Focal loss on ``dataset_idx``; validation is top-1 accuracy.
"""

from __future__ import annotations

import functools
from collections import OrderedDict

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..archs import build_network
from ..losses import build_loss
from ..utils.logger import get_root_logger
from ..utils.registry import MODEL_REGISTRY
from .base_model import BaseModel
from .dc_util import accuracy_topk, select_taps
from .sr_model import _init_hint, _net_in_channels, check_window_size


@MODEL_REGISTRY.register()
class DCModel(BaseModel):
    def __init__(self, opt: dict):
        super().__init__(opt)
        self.scale = opt.get("scale", 1)
        self.hook_names = opt.get("hook_names")
        self.rng = jax.random.PRNGKey(opt.get("manual_seed", 0) or 0)

        self.net_g = build_network({k: v for k, v in opt["network_g"].items() if k != "h"})
        self.net_dc = build_network(opt["network_dc"])

        in_ch = _net_in_channels(opt["network_g"])
        h = _init_hint(opt)
        self.rng, kg, kdc = jax.random.split(self.rng, 3)
        self.params_g = self.net_g.init(kg, jnp.zeros((1, h, h, in_ch)))["params"]
        dummy_feats = self._dummy_features(jnp.zeros((1, h, h, in_ch)))
        self.params_dc = self.net_dc.init(kdc, jnp.zeros((1, h, h, in_ch)), dummy_feats)["params"]
        self.print_network(self.net_g, self.params_g)
        self.print_network(self.net_dc, self.params_dc)

        self._load_both()
        self.params_dc_ema = None
        self._cache: dict = {}
        if self.is_train:
            self.init_training_settings()

    # -- setup -----------------------------------------------------------

    def _dummy_features(self, x):
        _, taps = self.net_g.apply({"params": self.params_g}, x, skip_tail=True)
        return select_taps(taps, self.hook_names)[::-1]

    def _load_both(self) -> None:
        load_path_g = self.opt["path"].get("pretrain_network_g")
        if load_path_g is not None:
            self.params_g = self.load_network_params(
                self.net_g, load_path_g, self.opt["path"].get("strict_load_g", True),
                self.opt["path"].get("param_key_g", "params"), self.opt.get("remove_norm", False),
                init_params=self.params_g,
            )
        load_path_dc = self.opt["path"].get("pretrain_network_dc")
        if load_path_dc is not None:
            self.params_dc = self.load_network_params(
                self.net_dc, load_path_dc, self.opt["path"].get("strict_load_dc", True),
                self.opt["path"].get("param_key_dc", "params"), self.opt.get("remove_norm", False),
                init_params=self.params_dc,
            )

    def init_training_settings(self) -> None:
        train_opt = self.opt["train"]
        self.ema_decay = train_opt.get("ema_decay", 0)
        if self.ema_decay > 0:
            get_root_logger().info(f"Use Exponential Moving Average with decay: {self.ema_decay}")
            self.params_dc_ema = jax.tree_util.tree_map(jnp.copy, self.params_dc)
        self.cri_classify = build_loss(train_opt["classify_opt"]) if train_opt.get("classify_opt") else None
        if self.cri_classify is None:
            raise ValueError("Classify loss is None.")
        self.setup_optimizers()
        self.setup_schedulers()
        self._train_step = self._make_train_step()

    def setup_optimizers(self) -> None:
        optim_opt = dict(self.opt["train"]["optim_dc"])
        optim_type = optim_opt.pop("type")
        self._optimizer_base_lrs = [("optim_dc", optim_opt["lr"])]
        self.optimizer_dc = self.get_optimizer(optim_type, **optim_opt)
        self.opt_state_dc = self.optimizer_dc.init(self.params_dc)
        self.opt_state_dc, self._zero_specs_dc = self.maybe_zero_shard(self.opt_state_dc)
        self.optimizers = [("optim_dc", self.optimizer_dc)]

    # -- steps ------------------------------------------------------------

    def _make_train_step(self):
        net_g, net_dc = self.net_g, self.net_dc
        cri = self.cri_classify
        hook_names = self.hook_names
        tx = self.optimizer_dc
        ema_decay = self.ema_decay
        zero_specs = self._zero_specs_dc
        zero_mesh = self.mesh if zero_specs is not None else None
        from ..parallel.zero import constrain as zero_constrain
        from ..parallel.zero import constrain_replicated as zero_repl
        # bf16 compute / fp32 masters, fp32 losses+update (SRModel's recipe)
        mixed = (self.opt.get("train") or {}).get("mixed_precision", False)

        @functools.partial(jax.jit, donate_argnums=(1, 2, 3))
        def step(params_g, params_dc, opt_state, ema, lq, dataset_idx, lr):
            if mixed:
                params_g = jax.tree_util.tree_map(lambda t: t.astype(jnp.bfloat16), params_g)
                lq = lq.astype(jnp.bfloat16)
            # frozen encoder, detached features (…model.py:94-97,123-128)
            _, taps = net_g.apply({"params": params_g}, lq, skip_tail=True)
            feats = [jax.lax.stop_gradient(f) for f in select_taps(taps, hook_names)[::-1]]

            def loss_fn(pdc):
                if mixed:
                    pdc = jax.tree_util.tree_map(lambda t: t.astype(jnp.bfloat16), pdc)
                logits = net_dc.apply({"params": pdc}, lq, feats)
                l_classify = cri(logits.astype(jnp.float32), dataset_idx)
                return l_classify, {"l_classify": l_classify}

            (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params_dc)
            updates, new_opt_state = tx.update(grads, opt_state, params_dc)
            new_opt_state = zero_constrain(new_opt_state, zero_specs)
            updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
            new_params = zero_repl(optax.apply_updates(params_dc, updates), zero_mesh)
            new_ema = (
                jax.tree_util.tree_map(lambda e, p: e * ema_decay + p * (1 - ema_decay), ema, new_params)
                if ema is not None
                else None
            )
            return new_params, new_opt_state, new_ema, losses

        return step

    def feed_data(self, data: dict) -> None:
        self.lq = jnp.asarray(data["lq"]) if not isinstance(data["lq"], jax.Array) else data["lq"]
        self.dataset_idx = jnp.asarray(data["dataset_idx"])
        self.gt = jnp.asarray(data["gt"]) if "gt" in data else None

    def optimize_parameters(self, current_iter: int) -> None:
        lr = jnp.float32(self._current_lrs[0])
        self.params_dc, self.opt_state_dc, self.params_dc_ema, losses = self._train_step(
            self.params_g, self.params_dc, self.opt_state_dc, self.params_dc_ema, self.lq, self.dataset_idx, lr
        )
        self.log_dict = self.reduce_loss_dict(losses)

    # -- eval ---------------------------------------------------------------

    def pre_test(self) -> None:
        self.mod_pad_h = self.mod_pad_w = 0
        if "window_size" not in self.opt["network_g"]:
            return
        ws = check_window_size(self.opt["network_g"]["window_size"])
        _, h, w, _ = self.lq.shape
        self.mod_pad_h = (ws - h % ws) % ws
        self.mod_pad_w = (ws - w % ws) % ws
        if self.mod_pad_h or self.mod_pad_w:
            self.lq = jnp.pad(self.lq, ((0, 0), (0, self.mod_pad_h), (0, self.mod_pad_w), (0, 0)), mode="reflect")

    def classify(self, params_dc=None):
        if "cls" not in self._cache:
            net_g, net_dc, hook_names = self.net_g, self.net_dc, self.hook_names

            @jax.jit
            def cls(pg, pdc, lq):
                _, taps = net_g.apply({"params": pg}, lq, skip_tail=True)
                feats = select_taps(taps, hook_names)[::-1]
                return net_dc.apply({"params": pdc}, lq, feats)

            self._cache["cls"] = cls
        if params_dc is not None:
            pdc = params_dc
        else:
            pdc = self.params_dc_ema if self.params_dc_ema is not None else self.params_dc
        return self._cache["cls"](self.params_g, pdc, self.lq)

    def dist_validation(self, dataloader, current_iter, tb_logger, save_img=False, clamp=True):
        if self.opt.get("rank", 0) == 0:
            self.nondist_validation(dataloader, current_iter, tb_logger, save_img, clamp)
        # resync: without this the other ranks race into the next training
        # collective while rank 0 validates, and the collective backend's
        # context-init deadline (Gloo: 30 s) expires → DEADLINE_EXCEEDED
        from dcpt_tpu.utils.dist_util import barrier

        barrier("dc_validation_done")

    def nondist_validation(self, dataloader, current_iter, tb_logger, save_img=False, clamp=True):
        """Top-1 accuracy over the loader (reference: …model.py:229-289)."""
        if not hasattr(self, "metric_results"):
            self.metric_results = {"top-1": 0.0}
        self._initialize_best_metric_results_cls()
        self.metric_results = {metric: 0 for metric in self.metric_results}

        idx = -1
        for idx, val_data in enumerate(dataloader):
            self.feed_data(val_data)
            self.pre_test()
            logits = self.classify()
            self.metric_results["top-1"] += float(accuracy_topk(logits, self.dataset_idx)[0])

        if idx >= 0:
            for metric in self.metric_results.keys():
                self.metric_results[metric] /= idx + 1
                rec = self.best_metric_results[metric]
                if self.metric_results[metric] >= rec["val"]:
                    rec["val"] = self.metric_results[metric]
                    rec["iter"] = current_iter
            self._log_cls_metrics(current_iter, tb_logger)

    def _initialize_best_metric_results_cls(self) -> None:
        if not hasattr(self, "best_metric_results") or "top-1" not in getattr(self, "best_metric_results", {}):
            self.best_metric_results = {"top-1": dict(val=0.0, iter=-1)}

    def _log_cls_metrics(self, current_iter, tb_logger) -> None:
        log_str = "Validation Degradation Classifier.\n"
        for metric, value in self.metric_results.items():
            rec = self.best_metric_results[metric]
            log_str += f"\t # {metric}: {value:.4f}\tBest: {rec['val']:.4f} @ {rec['iter']} iter\n"
        get_root_logger().info(log_str)
        if tb_logger:
            for metric, value in self.metric_results.items():
                tb_logger.add_scalar(f"metrics/{metric}", value, current_iter)

    def save(self, epoch: int, current_iter: int) -> None:
        trees = {"params": self.params_dc}
        if self.params_dc_ema is not None:
            trees["params_ema"] = self.params_dc_ema
        self.save_network(trees, "net_dc", current_iter)
        self.save_training_state(epoch, current_iter, {"opt_state_dc": self.pack_state(self.opt_state_dc)})

    def resume_training(self, resume_state: dict) -> None:
        if "opt_state_dc" in resume_state:
            self.opt_state_dc = self.unpack_state(self.opt_state_dc, resume_state["opt_state_dc"])
            if self._zero_specs_dc is not None:
                self.opt_state_dc = jax.tree_util.tree_map(
                    jax.device_put, self.opt_state_dc, self._zero_specs_dc)
