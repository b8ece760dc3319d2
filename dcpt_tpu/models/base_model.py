"""BaseModel — training/eval orchestration scaffolding, TPU-native.

Functional re-design of the reference ``basicsr/models/base_model.py:17-457``:
networks are flax modules with explicit param pytrees, optimizers are optax
transforms (lr injected per step from host-side schedules, mirroring the
reference's scheduler.step/warmup logic), EMA is a pytree lerp, checkpoints are
flat-npz network snapshots + orbax training state.  Multi-device execution
happens inside jitted steps over a ``jax.sharding.Mesh`` (see
``dcpt_tpu/parallel``) instead of DDP wrapping.
"""

from __future__ import annotations

import os
import os.path as osp
import time
from collections import OrderedDict
from copy import deepcopy

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..utils.logger import get_root_logger
from ..utils.tree_io import load_tree_npz, save_tree_npz
from .lr_scheduler import build_schedule


class BaseModel:
    def __init__(self, opt: dict):
        self.opt = opt
        self.is_train = opt["is_train"]
        self.schedulers: list = []
        self.optimizers: list = []  # (name, optax transform) pairs
        self.log_dict: dict = {}
        self._current_lrs: list[float] = []

    # ------------------------------------------------------------------
    # Device & mesh
    # ------------------------------------------------------------------

    @property
    def mesh(self):
        from ..parallel import get_default_mesh

        return get_default_mesh(self.opt)

    def shard_batch(self, array):
        """Place a host array onto the mesh, batch-sharded over 'data'."""
        from ..parallel import shard_batch

        return shard_batch(array, self.mesh)

    def maybe_zero_shard(self, opt_state):
        """ZeRO-1 optimizer-state sharding (``train.zero_sharding``, default
        off — `parallel/zero.py`; the reference replicates Adam moments on
        every DDP rank, base_model.py:100-118).  Returns ``(opt_state,
        specs-or-None)``; the model's jitted step must pin the layout with
        ``parallel.zero.constrain(new_opt_state, specs)`` and resume paths
        must re-place restored host arrays with ``device_put`` on the specs.
        """
        train_opt = self.opt.get("train") or {}
        if not train_opt.get("zero_sharding"):
            return opt_state, None
        from ..parallel.zero import MIN_SHARD_BYTES, shard_opt_state

        return shard_opt_state(
            opt_state, self.mesh,
            min_bytes=train_opt.get("zero_min_bytes", MIN_SHARD_BYTES))

    # ------------------------------------------------------------------
    # Optimizers / schedulers
    # ------------------------------------------------------------------

    def get_optimizer(self, optim_type: str, **kwargs):
        """optax transform WITHOUT the lr scale — the step multiplies by the
        host-scheduled lr (reference optimizer zoo: base_model.py:120-139)."""
        kwargs = dict(kwargs)
        kwargs.pop("lr", None)
        betas = kwargs.pop("betas", None)
        if betas is not None:
            kwargs["b1"], kwargs["b2"] = betas
        wd = kwargs.pop("weight_decay", 0.0)

        if optim_type == "Adam":
            tx = optax.scale_by_adam(**kwargs)
            if wd:
                tx = optax.chain(optax.add_decayed_weights(wd), tx)
        elif optim_type == "AdamW":
            tx = optax.chain(optax.scale_by_adam(**kwargs), optax.add_decayed_weights(wd if wd else 1e-2))
        elif optim_type == "Adamax":
            tx = optax.scale_by_adamax(**{k: v for k, v in kwargs.items() if k in ("b1", "b2", "eps")})
        elif optim_type == "SGD":
            momentum = kwargs.pop("momentum", 0.0)
            tx = optax.trace(decay=momentum) if momentum else optax.identity()
            if wd:
                tx = optax.chain(optax.add_decayed_weights(wd), tx)
        elif optim_type in ("ASGD",):
            get_root_logger().warning("ASGD has no optax equivalent; using plain SGD semantics.")
            tx = optax.identity()
        elif optim_type == "RMSprop":
            tx = optax.scale_by_rms(decay=kwargs.pop("alpha", 0.99), eps=kwargs.pop("eps", 1e-8))
        elif optim_type == "Rprop":
            tx = optax.scale_by_rprop(learning_rate=1.0)
        else:
            raise NotImplementedError(f"optimizer {optim_type} is not supported yet.")

        grad_clip = self.opt.get("grad_clip", 0) or (self.opt.get("train", {}) or {}).get("grad_clip", 0)
        if grad_clip:
            tx = optax.chain(optax.clip_by_global_norm(float(grad_clip)), tx)
        # gradient accumulation (beyond reference — the torch DDP loop steps
        # every iteration): train.accumulate_steps=k averages k micro-batch
        # grads and applies ONE update every k iterations, so effective batch
        # = k × batch_size_per_gpu × n_devices with unchanged step memory.
        # The accumulator lives in the optimizer state → it is donated,
        # checkpointed by pack_state, and ZeRO-sharded like the moments.
        acc = int((self.opt.get("train") or {}).get("accumulate_steps", 1) or 1)
        if acc > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=acc)
        # final scale by -lr happens in the train step via optax.scale
        return tx

    def setup_schedulers(self) -> None:
        """One schedule per optimizer (reference: base_model.py:141-160)."""
        train_opt = self.opt["train"]
        scheduler_opt = train_opt["scheduler"]
        warmup = train_opt.get("warmup_iter", -1)
        self.schedulers = []
        for name, base_lr in self._optimizer_base_lrs:
            self.schedulers.append(build_schedule(deepcopy(scheduler_opt), base_lr, warmup))
        self._current_lrs = [s(0) for s in self.schedulers]

    def update_learning_rate(self, current_iter: int, warmup_iter: int = -1) -> None:
        """Host-side lr computation for this step (reference: base_model.py:223-244).

        warmup is already folded into the schedules by setup_schedulers."""
        self._current_lrs = [sched(current_iter) for sched in self.schedulers]

    def get_current_learning_rate(self):
        return list(self._current_lrs)

    # ------------------------------------------------------------------
    # EMA
    # ------------------------------------------------------------------

    @staticmethod
    def ema_update(ema_params, params, decay: float):
        """ema = ema*decay + params*(1-decay) (reference: base_model.py:86-95)."""
        return jax.tree_util.tree_map(lambda e, p: e * decay + p * (1 - decay), ema_params, params)

    # ------------------------------------------------------------------
    # Validation bookkeeping
    # ------------------------------------------------------------------

    def validation(self, dataloader, current_iter, tb_logger, save_img=False, clamp=True):
        """Dispatch dist/nondist (reference: base_model.py:40-56)."""
        if self.opt.get("dist"):
            self.dist_validation(dataloader, current_iter, tb_logger, save_img, clamp)
        else:
            self.nondist_validation(dataloader, current_iter, tb_logger, save_img, clamp)

    def _initialize_best_metric_results(self, dataset_name: str) -> None:
        """Track best metric values per dataset (reference: base_model.py:58-76)."""
        if hasattr(self, "best_metric_results") and dataset_name in self.best_metric_results:
            return
        if not hasattr(self, "best_metric_results"):
            self.best_metric_results = {}
        record = {}
        for metric, content in self.opt["val"]["metrics"].items():
            better = content.get("better", "higher")
            init_val = float("-inf") if better == "higher" else float("inf")
            record[metric] = dict(better=better, val=init_val, iter=-1)
        self.best_metric_results[dataset_name] = record

    def _update_best_metric_result(self, dataset_name, metric, val, current_iter) -> None:
        rec = self.best_metric_results[dataset_name][metric]
        if (rec["better"] == "higher" and val >= rec["val"]) or (rec["better"] == "lower" and val <= rec["val"]):
            rec["val"] = val
            rec["iter"] = current_iter

    def reduce_loss_dict(self, loss_dict: dict) -> OrderedDict:
        """Loss logging (reference: base_model.py:432-457).

        Whenever ``dist`` the logged losses are averaged across processes —
        the reference reduces by default under dist (its ``dist.reduce`` to
        rank 0 + world-size divide, base_model.py:440-451); here every host
        gets the mean (allgather is one tiny host collective either way).
        Set ``train.reduce_losses: false`` to opt out (e.g. when the train
        step is jitted over one GLOBAL mesh, where loss outputs are already
        global means and the collective is redundant)."""
        if self.opt.get("dist") and (self.opt.get("train") or {}).get("reduce_losses", True):
            from jax.experimental import multihost_utils

            keys = list(loss_dict)
            local = np.asarray([float(loss_dict[k]) for k in keys], np.float32)
            gathered = multihost_utils.process_allgather(local)
            mean = np.asarray(gathered).reshape(-1, len(keys)).mean(axis=0)
            return OrderedDict(zip(keys, (float(v) for v in mean)))
        return OrderedDict((k, float(v)) for k, v in loss_dict.items())

    # ------------------------------------------------------------------
    # Checkpointing
    # ------------------------------------------------------------------

    def _is_master(self) -> bool:
        return self.opt.get("rank", 0) == 0

    def save_network(self, trees: dict[str, dict], net_label: str, current_iter) -> None:
        """Save {param_key: tree} under models/net_<label>_<iter>.npz
        (reference: base_model.py:249-298; retry ×3 like the reference)."""
        if not self._is_master():
            return
        if current_iter == -1:
            current_iter = "latest"
        save_filename = f"{net_label}_{current_iter}.npz"
        save_path = osp.join(self.opt["path"]["models"], save_filename)
        trees = jax.tree_util.tree_map(np.asarray, trees)
        for attempt in range(3):
            try:
                save_tree_npz(save_path, trees)
                return
            except Exception as e:  # noqa: BLE001
                get_root_logger().warning(f"Save model error: {e}, remaining retry times: {2 - attempt}")
                time.sleep(1)
        raise IOError(f"Cannot save {save_path}.")

    def load_network_params(self, net, load_path: str, strict: bool = True, param_key: str = "params", remove_norm: bool = False, init_params: dict | None = None) -> dict:
        """Load a network snapshot: our .npz or a reference .pth
        (reference: base_model.py:300-369 incl. params_ema→params fallback)."""
        logger = get_root_logger()
        if load_path.endswith(".pth"):
            from ..convert.torch_checkpoint import load_network_params

            loaded = load_network_params(net, load_path, param_key=param_key)["params"]
        else:
            trees = load_tree_npz(load_path)
            if param_key not in trees:
                if param_key == "params_ema" and "params" in trees:
                    logger.info("Loading: params_ema does not exist, use params.")
                    param_key = "params"
                else:
                    param_key = list(trees.keys())[0]
            loaded = trees[param_key]
        logger.info(f"Loading model from {load_path}, with param key: [{param_key}].")

        if remove_norm:
            def _strip(tree):
                return {k: (_strip(v) if isinstance(v, dict) else v) for k, v in tree.items() if "norm" not in k}

            loaded = _strip(loaded)

        if init_params is not None:
            from ..convert.torch_checkpoint import verify_params_match

            problems = verify_params_match(loaded, init_params)
            if problems and strict:
                raise KeyError("checkpoint/network mismatch:\n  " + "\n  ".join(problems))
            for p in problems:
                logger.warning(f"checkpoint mismatch (non-strict): {p}")
            if problems:
                # non-strict: graft loaded values onto init where paths+shapes agree
                def merge(init, ld):
                    out = {}
                    for k, v in init.items():
                        lv = ld.get(k) if isinstance(ld, dict) else None
                        if isinstance(v, dict):
                            out[k] = merge(v, lv if isinstance(lv, dict) else {})
                        elif lv is not None and np.shape(lv) == np.shape(v):
                            out[k] = lv
                        else:
                            out[k] = v
                    return out

                loaded = merge(init_params, loaded)
        return jax.tree_util.tree_map(jnp.asarray, loaded)

    @staticmethod
    def pack_state(pytree) -> dict:
        """Optimizer states contain namedtuples orbax restores as plain dicts;
        serialize as an ordered leaves list and rebuild with the live treedef."""
        leaves = jax.tree_util.tree_leaves(pytree)
        return {f"leaf_{i:04d}": np.asarray(l) for i, l in enumerate(leaves)}

    @staticmethod
    def unpack_state(live_pytree, packed: dict):
        leaves = [packed[k] for k in sorted(packed.keys())]
        treedef = jax.tree_util.tree_structure(live_pytree)
        live_leaves = jax.tree_util.tree_leaves(live_pytree)
        assert len(leaves) == len(live_leaves), (
            f"resume state has {len(leaves)} leaves, live optimizer has {len(live_leaves)}"
        )
        leaves = [jnp.asarray(n, dtype=jnp.asarray(o).dtype) for n, o in zip(leaves, live_leaves)]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def _async_state_ckptr(self):
        """Lazily-built orbax AsyncCheckpointer shared across saves (the
        SURVEY §5.3 TPU design target: the train loop must not stall on
        checkpoint serialization — the write happens on a background thread
        while the next jitted step runs)."""
        if getattr(self, "_async_ckptr", None) is None:
            import orbax.checkpoint as ocp

            self._async_ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        return self._async_ckptr

    def finalize_checkpoints(self) -> None:
        """Block until any in-flight async training-state save has committed."""
        if getattr(self, "_async_ckptr", None) is not None:
            self._async_ckptr.wait_until_finished()

    def save_training_state(self, epoch: int, current_iter: int, state: dict) -> None:
        """Async orbax save of {epoch, iter, opt_states…} (reference:
        base_model.py:371-411 — there a blocking ``torch.save``).

        The call returns as soon as the state is snapshotted to host memory;
        the directory write commits on a background thread (next save/
        ``finalize_checkpoints`` joins it first).  ``logger.keep_checkpoints``
        (TPU extension) prunes old `.state` dirs, keeping the newest N —
        orbax-style retention.
        """
        if current_iter == -1:
            return
        if not self._is_master() and not self.opt.get("dist"):
            return
        # NOTE: under jax.distributed EVERY process must call orbax save —
        # it synchronises globally and elects the primary host for the write;
        # a master-only call deadlocks the fleet on the sync barrier.
        state = dict(state, epoch=epoch, iter=current_iter)
        path = osp.join(self.opt["path"]["training_states"], f"{current_iter}.state")
        ckptr = self._async_state_ckptr()
        ckptr.wait_until_finished()  # at most one save in flight
        ckptr.save(os.path.abspath(path), state, force=True)

        keep = (self.opt.get("logger") or {}).get("keep_checkpoints") if self._is_master() else None
        if keep:
            import shutil

            root = self.opt["path"]["training_states"]
            states = sorted(
                (f for f in os.listdir(root) if f.endswith(".state")),
                key=lambda f: float(f.split(".state")[0]),
            )
            # the save just launched is still in flight (not yet listed): it
            # counts toward the retention budget, but the newest COMMITTED
            # state must survive until the in-flight write commits — if the
            # host dies mid-write there has to be a durable state to resume
            # from.  (keep=1 therefore over-retains one state dir until the
            # next save call prunes it.)
            in_flight = 0 if f"{current_iter}.state" in states else 1
            keep_committed = max(keep - in_flight, 1)
            for old in states[:-keep_committed]:
                shutil.rmtree(osp.join(root, old), ignore_errors=True)

    def resume_training_state(self, state_path: str) -> dict:
        import orbax.checkpoint as ocp

        self.finalize_checkpoints()  # join any in-flight async save first
        with ocp.PyTreeCheckpointer() as ckptr:
            return ckptr.restore(os.path.abspath(state_path))

    # ------------------------------------------------------------------
    # Introspection
    # ------------------------------------------------------------------

    def print_network(self, net, params=None) -> None:
        """Param count + module table (the torchinfo analog, base_model.py:170-204)."""
        if not self._is_master():
            return
        logger = get_root_logger()
        if params is not None:
            n_params = sum(int(np.prod(np.shape(x))) for x in jax.tree_util.tree_leaves(params))
            logger.info(f"Network: {net.__class__.__name__}, with parameters: {n_params:,d}")
        else:
            logger.info(f"Network: {net.__class__.__name__}")
