"""DCPTModel — the DCPT pre-training: restoration net + classifier co-train.

Reference: ``basicsr/models/degradation_classification_pretrain_model.py:17-290``.
One jitted step fuses the reference's two-pass scheme (:133-169):

1. full forward on the **clean** image → pixel loss (identity restoration);
2. feature-only forward on the **degraded** image → classifier → classify loss
   on ``dataset_idx``;
3. single combined backward, both optimizers step.  Classifier gradients flow
   into the restoration encoder (the hooks are NOT detached here — unlike
   DCModel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from ..archs import build_network
from ..losses import build_loss
from ..utils.logger import get_root_logger
from ..utils.registry import MODEL_REGISTRY
from .dc_util import select_taps
from .degradation_classification_model import DCModel


@MODEL_REGISTRY.register()
class DCPTModel(DCModel):
    # what the pixel-loss forward consumes: clean GT for DCPT (…pretrain:140)
    _pixel_input = "gt"

    def init_training_settings(self) -> None:
        train_opt = self.opt["train"]
        self.ema_decay = train_opt.get("ema_decay", 0)
        self.params_dc_ema = None
        self.cri_classify = build_loss(train_opt["classify_opt"]) if train_opt.get("classify_opt") else None
        self.cri_pixel = build_loss(train_opt["pixel_opt"]) if train_opt.get("pixel_opt") else None
        if self.cri_classify is None:
            raise ValueError("Classify loss is None.")
        self.setup_optimizers()
        self.setup_schedulers()
        self._train_step = self._make_train_step()

    def setup_optimizers(self) -> None:
        train_opt = self.opt["train"]
        optim_g = dict(train_opt["optim_g"])
        optim_dc = dict(train_opt["optim_dc"])
        type_g, type_dc = optim_g.pop("type"), optim_dc.pop("type")
        self._optimizer_base_lrs = [("optim_g", optim_g["lr"]), ("optim_dc", optim_dc["lr"])]
        self.optimizer_g = self.get_optimizer(type_g, **optim_g)
        self.optimizer_dc = self.get_optimizer(type_dc, **optim_dc)
        self.opt_state_g = self.optimizer_g.init(self.params_g)
        self.opt_state_dc = self.optimizer_dc.init(self.params_dc)
        self.opt_state_g, self._zero_specs_g = self.maybe_zero_shard(self.opt_state_g)
        self.opt_state_dc, self._zero_specs_dc = self.maybe_zero_shard(self.opt_state_dc)
        self.optimizers = [("optim_g", self.optimizer_g), ("optim_dc", self.optimizer_dc)]

    def _make_train_step(self):
        net_g, net_dc = self.net_g, self.net_dc
        cri_pixel, cri_classify = self.cri_pixel, self.cri_classify
        hook_names = self.hook_names
        tx_g, tx_dc = self.optimizer_g, self.optimizer_dc
        zero_specs_g, zero_specs_dc = self._zero_specs_g, self._zero_specs_dc
        zero_mesh = self.mesh if zero_specs_g is not None or zero_specs_dc is not None else None
        from ..parallel.zero import constrain as zero_constrain
        from ..parallel.zero import constrain_replicated as zero_repl
        pixel_input = self._pixel_input
        # mixed precision (TPU-native, same recipe as SRModel): bf16 compute
        # with fp32 master params; losses and optimizer updates stay fp32
        mixed = (self.opt.get("train") or {}).get("mixed_precision", False)
        # batched trunk (VERDICT r4 #4): the step's two net_g passes (pixel
        # forward on the clean gt, …pretrain_model.py:140; skip-tail taps
        # forward on the degraded lq, :154) share weights and are
        # batch-parallel, so one concatenated 2B trunk call — tail on the gt
        # half, taps from the lq half — is numerically exact and doubles MXU
        # occupancy at the under-tiled deep stages (the round-4 profile's
        # 50.7-TFLOPS grad ceiling).  Requires the arch to accept
        # ``tail_count`` (NAFNet family); parity-pinned in test_dc_models.
        # A/B: scripts/bench_dcpt_batched_trunk.py; ships per measured-winner
        # policy via ``train.batched_trunk``.
        batched = (self.opt.get("train") or {}).get("batched_trunk", False)

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
        def step(params_g, params_dc, opt_g, opt_dc, lq, gt, dataset_idx, lr_g, lr_dc):
            def loss_fn(pg, pdc):
                if mixed:
                    pg = jax.tree_util.tree_map(lambda t: t.astype(jnp.bfloat16), pg)
                    pdc = jax.tree_util.tree_map(lambda t: t.astype(jnp.bfloat16), pdc)
                    lq_c, gt_c = lq.astype(jnp.bfloat16), gt.astype(jnp.bfloat16)
                else:
                    lq_c, gt_c = lq, gt
                losses = {}
                total = 0.0
                pix_in = gt_c if pixel_input == "gt" else lq_c
                pix_output = None
                if batched and cri_pixel is not None and pixel_input == "lq":
                    # DCT: pixel and tap passes share the SAME input and
                    # weights — one full forward yields both exactly
                    pix_output, taps = net_g.apply({"params": pg}, lq_c)
                elif batched and cri_pixel is not None:
                    b = lq.shape[0]
                    x2 = jnp.concatenate([pix_in, lq_c], axis=0)
                    pix_output, taps2 = net_g.apply({"params": pg}, x2, tail_count=b)
                    taps = jax.tree_util.tree_map(lambda t: t[b:], taps2)
                else:
                    if cri_pixel is not None:
                        pix_output, _ = net_g.apply({"params": pg}, pix_in)
                    _, taps = net_g.apply({"params": pg}, lq_c, skip_tail=True)
                if pix_output is not None:
                    l_pix = cri_pixel(pix_output.astype(jnp.float32), gt)
                    total += l_pix
                    losses["l_pix"] = l_pix
                feats = select_taps(taps, hook_names)[::-1]
                logits = net_dc.apply({"params": pdc}, lq_c, feats)
                l_classify = cri_classify(logits.astype(jnp.float32), dataset_idx)
                total += l_classify
                losses["l_classify"] = l_classify
                return total, losses

            (_, losses), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(params_g, params_dc)
            g_g, g_dc = grads
            up_g, new_opt_g = tx_g.update(g_g, opt_g, params_g)
            up_dc, new_opt_dc = tx_dc.update(g_dc, opt_dc, params_dc)
            new_opt_g = zero_constrain(new_opt_g, zero_specs_g)
            new_opt_dc = zero_constrain(new_opt_dc, zero_specs_dc)
            new_pg = zero_repl(optax.apply_updates(params_g, jax.tree_util.tree_map(lambda u: -lr_g * u, up_g)), zero_mesh)
            new_pdc = zero_repl(optax.apply_updates(params_dc, jax.tree_util.tree_map(lambda u: -lr_dc * u, up_dc)), zero_mesh)
            return new_pg, new_pdc, new_opt_g, new_opt_dc, losses

        return step

    def optimize_parameters(self, current_iter: int) -> None:
        lr_g = jnp.float32(self._current_lrs[0])
        lr_dc = jnp.float32(self._current_lrs[1])
        self.params_g, self.params_dc, self.opt_state_g, self.opt_state_dc, losses = self._train_step(
            self.params_g, self.params_dc, self.opt_state_g, self.opt_state_dc,
            self.lq, self.gt, self.dataset_idx, lr_g, lr_dc,
        )
        self.log_dict = self.reduce_loss_dict(losses)

    def save(self, epoch: int, current_iter: int) -> None:
        """Save BOTH nets (reference: …pretrain_model.py:171-174)."""
        self.save_network({"params": self.params_g}, "net_g", current_iter)
        self.save_network({"params": self.params_dc}, "net_dc", current_iter)
        self.save_training_state(
            epoch,
            current_iter,
            {"opt_state_g": self.pack_state(self.opt_state_g), "opt_state_dc": self.pack_state(self.opt_state_dc)},
        )

    def resume_training(self, resume_state: dict) -> None:
        for name, specs in (("opt_state_g", self._zero_specs_g),
                            ("opt_state_dc", self._zero_specs_dc)):
            if name in resume_state:
                state = self.unpack_state(getattr(self, name), resume_state[name])
                if specs is not None:
                    state = jax.tree_util.tree_map(jax.device_put, state, specs)
                setattr(self, name, state)


@MODEL_REGISTRY.register()
class DCTModel(DCPTModel):
    """Direct-train ablation — identical step but the pixel forward consumes
    the DEGRADED image (reference: …direct_train_model.py:133-170)."""

    _pixel_input = "lq"
