"""SRModel — restoration train/eval orchestration, TPU-native.

Functional port of the reference ``basicsr/models/sr_model.py:27-588``:

* ``optimize_parameters`` is ONE jitted train step (forward → pixel/LDL loss →
  grads → clip → optax update → EMA lerp), batch-sharded over the mesh;
* ``test`` uses the EMA params when present (sr_model.py:176-185);
* ``pre_test``/``post_test`` reflect-pad H, W to the arch's window-size
  multiple and crop back (sr_model.py:234-271) — this also bounds XLA
  recompiles to one shape-bucket per padded size;
* ``test_tile`` is the overlap-pad halo tiler (sr_model.py:273-361);
* ``test_selfensemble`` averages the 8 dihedral augments via jnp flips/
  transposes on device — no host round-trips (sr_model.py:187-232);
* ``nondist_validation`` computes the reference metric protocol on host numpy
  with [0,1] clamp (sr_model.py:375-499);
* ``nondist_profile`` reports wall-clock / device memory / XLA-cost FLOPs
  (sr_model.py:520-568 → jax.profiler + cost analysis).
"""

from __future__ import annotations

import math
import os.path as osp
import time
from collections import OrderedDict
from functools import partial

import cv2
import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..archs import build_network
from ..losses import build_loss, get_refined_artifact_map
from ..metrics import calculate_metric
from ..utils.img_util import imwrite
from ..utils.logger import get_root_logger
from ..utils.registry import MODEL_REGISTRY
from .base_model import BaseModel


def _net_in_channels(net_opt: dict) -> int:
    for key in ("img_channel", "inp_channels", "in_chans", "num_in_ch"):
        if key in net_opt:
            return net_opt[key]
    return 3


def check_window_size(window_size):
    """Tuple/list window sizes collapse to their max (sr_model.py:234-242)."""
    if isinstance(window_size, (tuple, list)):
        return max(window_size)
    return window_size


def _init_hint(opt: dict) -> int:
    """Spatial size for the flax param-shape init pass.

    Preferred spelling is top-level ``init_size`` (it is a harness hint, not a
    network constructor arg); ``network_g.h`` is accepted for backward compat
    but is stripped before ``build_network`` so it never warns."""
    return int(opt.get("init_size") or opt["network_g"].get("h") or 64)


@MODEL_REGISTRY.register()
class SRModel(BaseModel):
    def __init__(self, opt: dict):
        super().__init__(opt)
        self.scale = opt.get("scale", 1)
        # cp_* arch options only make sense under shard_map (their psums need
        # a bound mesh axis) — strip them for the plain net used by init/jit
        # paths; _test_spatial_cp builds the cp variant lazily (param-free,
        # so the same params apply)
        self._cp_net_opt = {k: v for k, v in opt["network_g"].items() if k != "h"}
        plain_net_opt = {k: v for k, v in self._cp_net_opt.items() if not k.startswith("cp_")}
        self.net_g = build_network(plain_net_opt)
        self.rng = jax.random.PRNGKey(opt.get("manual_seed", 0) or 0)

        in_ch = _net_in_channels(opt["network_g"])
        h = _init_hint(opt)
        self.rng, init_key = jax.random.split(self.rng)
        variables = self.net_g.init(init_key, jnp.zeros((1, h, h, in_ch)))
        self.params_g = variables["params"]
        self.print_network(self.net_g, self.params_g)

        load_path = self.opt["path"].get("pretrain_network_g")
        if load_path is not None:
            param_key = self.opt["path"].get("param_key_g", "params")
            self.params_g = self.load_network_params(
                self.net_g,
                load_path,
                self.opt["path"].get("strict_load_g", True),
                param_key,
                self.opt.get("remove_norm", False),
                init_params=self.params_g,
            )

        from ..parallel import replicate

        self.params_g = replicate(self.params_g, self.mesh)
        self.params_g_ema = None

        self._apply_cache: dict = {}
        if self.is_train:
            self.init_training_settings()

    # ------------------------------------------------------------------
    # Training setup
    # ------------------------------------------------------------------

    def init_training_settings(self) -> None:
        train_opt = self.opt["train"]
        self.ema_decay = train_opt.get("ema_decay", 0)
        if self.ema_decay > 0:
            get_root_logger().info(f"Use Exponential Moving Average with decay: {self.ema_decay}")
            load_path = self.opt["path"].get("pretrain_network_g")
            if load_path is not None:
                self.params_g_ema = self.load_network_params(
                    self.net_g, load_path, self.opt["path"].get("strict_load_g", True), "params_ema",
                    init_params=None,
                )
            else:
                self.params_g_ema = jax.tree_util.tree_map(jnp.copy, self.params_g)

        self.cri_pix = build_loss(train_opt["pixel_opt"]) if train_opt.get("pixel_opt") else None
        self.cri_ldl = build_loss(train_opt["ldl_opt"]) if train_opt.get("ldl_opt") else None
        if train_opt.get("perceptual_opt"):
            get_root_logger().warning("perceptual_opt configured but PerceptualLoss is not shipped (matches reference).")
        self.cri_perceptual = None
        if self.cri_pix is None and self.cri_ldl is None:
            raise ValueError("Both pixel and perceptual losses are None.")

        self.setup_optimizers()
        self.setup_schedulers()
        self._train_step = self._make_train_step()

    def setup_optimizers(self) -> None:
        train_opt = self.opt["train"]
        optim_opt = dict(train_opt["optim_g"])
        optim_type = optim_opt.pop("type")
        self._optimizer_base_lrs = [("optim_g", optim_opt["lr"])]
        self.optimizer_g = self.get_optimizer(optim_type, **optim_opt)
        self.opt_state_g = self.optimizer_g.init(self.params_g)
        self.opt_state_g, self._zero_specs_g = self.maybe_zero_shard(self.opt_state_g)
        self.optimizers = [("optim_g", self.optimizer_g)]

    def _make_train_step(self):
        net = self.net_g
        cri_pix, cri_ldl = self.cri_pix, self.cri_ldl
        ldl_std = (self.opt.get("train") or {}).get("ldl_std", False)
        tx = self.optimizer_g
        ema_decay = self.ema_decay
        zero_specs = self._zero_specs_g
        zero_mesh = self.mesh if zero_specs is not None else None
        from ..parallel.zero import constrain as zero_constrain
        from ..parallel.zero import constrain_replicated as zero_repl
        # mixed precision (TPU-native): bf16 compute with fp32 master params;
        # losses and the optimizer update stay fp32
        mixed = (self.opt.get("train") or {}).get("mixed_precision", False)

        # donate params/ema/opt_state buffers: the step consumes and replaces
        # them, halving peak HBM for the update
        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def step(params, ema, opt_state, lq, gt, lr):
            def loss_fn(p):
                if mixed:
                    p_c = jax.tree_util.tree_map(lambda t: t.astype(jnp.bfloat16), p)
                    out, _ = net.apply({"params": p_c}, lq.astype(jnp.bfloat16), deterministic=False)
                    out = out.astype(jnp.float32)
                else:
                    out, _ = net.apply({"params": p}, lq, deterministic=False)
                losses = {}
                total = 0.0
                if cri_pix is not None:
                    l_pix = cri_pix(out, gt)
                    total += l_pix
                    losses["l_pix"] = l_pix
                if cri_ldl is not None:
                    pixel_weight = get_refined_artifact_map(gt, out, std=ldl_std)
                    l_ldl = jnp.mean(pixel_weight * cri_ldl(out, gt))
                    total += l_ldl
                    losses["l_ldl"] = l_ldl
                return total, losses

            (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt_state = tx.update(grads, opt_state, params)
            # ZeRO-1: pin the moments to their shards so the donated output
            # keeps the layout (each device updates its slice; XLA all-gathers
            # only the fresh params)
            new_opt_state = zero_constrain(new_opt_state, zero_specs)
            updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
            new_params = zero_repl(optax.apply_updates(params, updates), zero_mesh)
            new_ema = (
                jax.tree_util.tree_map(lambda e, p: e * ema_decay + p * (1 - ema_decay), ema, new_params)
                if ema is not None
                else None
            )
            losses["l_total"] = total
            return new_params, new_ema, new_opt_state, losses

        return step

    # ------------------------------------------------------------------
    # Data & step
    # ------------------------------------------------------------------

    def feed_data(self, data: dict) -> None:
        self.lq = jnp.asarray(data["lq"]) if not isinstance(data["lq"], jax.Array) else data["lq"]
        self.gt = None
        if "gt" in data:
            self.gt = jnp.asarray(data["gt"]) if not isinstance(data["gt"], jax.Array) else data["gt"]

    def optimize_parameters(self, current_iter: int) -> None:
        lr = jnp.float32(self._current_lrs[0])
        self.params_g, self.params_g_ema, self.opt_state_g, losses = self._train_step(
            self.params_g, self.params_g_ema, self.opt_state_g, self.lq, self.gt, lr
        )
        self.log_dict = self.reduce_loss_dict(losses)

    # ------------------------------------------------------------------
    # Inference paths
    # ------------------------------------------------------------------

    def _infer_params(self):
        return self.params_g_ema if self.params_g_ema is not None else self.params_g

    def _apply(self, params, x):
        """jit-cached forward returning only the restored image."""
        if "fwd" not in self._apply_cache:
            net = self.net_g

            @jax.jit
            def fwd(p, x):
                out, _ = net.apply({"params": p}, x)
                return out

            self._apply_cache["fwd"] = fwd
        return self._apply_cache["fwd"](params, x)

    def pre_test(self) -> None:
        """Reflect-pad H, W to window-size multiples (sr_model.py:244-260).

        ``val.pad_multiple`` (TPU extension) buckets the padded shape up to a
        larger multiple, bounding the number of XLA recompiles across a
        variable-size validation set to one per bucket.
        """
        self.mod_pad_h, self.mod_pad_w = 0, 0
        window_size = 1
        if "window_size" in self.opt["network_g"]:
            window_size = check_window_size(self.opt["network_g"]["window_size"])
        bucket = (self.opt.get("val") or {}).get("pad_multiple", 0)
        multiple = max(window_size, bucket or 0)
        if multiple <= 1:
            return
        _, h, w, _ = self.lq.shape
        self.mod_pad_h = (multiple - h % multiple) % multiple
        self.mod_pad_w = (multiple - w % multiple) % multiple
        if self.mod_pad_h or self.mod_pad_w:
            self.lq = jnp.pad(self.lq, ((0, 0), (0, self.mod_pad_h), (0, self.mod_pad_w), (0, 0)), mode="reflect")

    def post_test(self) -> None:
        if "window_size" not in self.opt["network_g"]:
            return
        _, h, w, _ = self.output.shape
        self.output = self.output[:, : h - self.mod_pad_h * self.scale, : w - self.mod_pad_w * self.scale, :]

    def test(self) -> None:
        cp = (self.opt.get("val") or {}).get("spatial_cp")
        if cp:
            self._test_spatial_cp(cp)
            return
        self.output = self._apply(self._infer_params(), self.lq)

    def _test_spatial_cp(self, cp: dict) -> None:
        """Huge-image context-parallel inference from the yml surface.

        ``val.spatial_cp: {halo: <rows>, axis: <mesh axis>}`` shards H over
        the mesh via ``spatial_sharded_apply``; pair it with the arch's
        ``network_g.cp_axis/cp_halo`` options (NAFNetBaseline / Restormer /
        PromptIR) to keep global statistics exact under the sharding.
        """
        from ..parallel.mesh import get_default_mesh
        from ..parallel.spatial import spatial_sharded_apply
        from ..utils.dist_util import get_dist_info

        _, world_size = get_dist_info()
        if self.opt.get("dist") and world_size > 1:
            # the shard_map/psum below is a GLOBAL collective: under default
            # dist_validation only rank 0 evaluates (the others never enter →
            # deadlock), and dist_eval strides hosts across different images
            # (mismatched psums).  spatial_cp is a single-process multi-chip
            # feature; multi-host huge-image inference needs a dedicated
            # every-rank-same-image path that does not exist.
            raise ValueError(
                "val.spatial_cp is not supported under multi-process dist — "
                "run spatial context parallelism from a single host process "
                "spanning the mesh (it shard_maps over the local mesh)")
        mesh = get_default_mesh(self.opt)
        axis = cp.get("axis", "data")
        halo = int(cp["halo"])
        n = mesh.shape[axis]
        h = self.lq.shape[1]
        if h % n != 0:
            raise ValueError(
                f"spatial_cp: H={h} must divide over {n} '{axis}' shards — "
                f"set val.pad_multiple to a multiple of {n}")
        # cross-check yml surface vs arch cp options: a silent mismatch would
        # produce WRONG global statistics instead of an error — the exactness
        # contract the cp feature exists for
        arch_axis = self._cp_net_opt.get("cp_axis")
        arch_halo = self._cp_net_opt.get("cp_halo")
        if arch_axis is not None and arch_axis != axis:
            raise ValueError(
                f"spatial_cp: val.spatial_cp.axis={axis!r} != network_g.cp_axis={arch_axis!r}")
        if arch_halo is not None and int(arch_halo) != halo:
            raise ValueError(
                f"spatial_cp: val.spatial_cp.halo={halo} != network_g.cp_halo={arch_halo}")
        arch_shards = self._cp_net_opt.get("cp_shards")
        if arch_shards is not None and int(arch_shards) != n:
            raise ValueError(
                f"spatial_cp: network_g.cp_shards={arch_shards} != mesh axis "
                f"'{axis}' size {n} — prompt rows would land on wrong shards")
        # NAFNet U-Nets: each shard forwards (H/n + 2·halo) rows through
        # len(enc_blk_nums) stride-2 downs; a non-divisible height truncates
        # and fails deep in the decoder concat — error at the surface instead
        enc_blks = self._cp_net_opt.get("enc_blk_nums")
        if enc_blks and str(self._cp_net_opt.get("type", "")).startswith("NAFNet"):
            down = 2 ** len(enc_blks)
            shard_h = h // n + 2 * halo
            if shard_h % down != 0:
                raise ValueError(
                    f"spatial_cp: per-shard height H/n + 2·halo = {shard_h} must divide "
                    f"by 2**len(enc_blk_nums) = {down} — adjust val.pad_multiple or halo")
        if str(self._cp_net_opt.get("type", "")) == "SwinIR":
            ws = int(self._cp_net_opt.get("window_size", 8))
            if halo % ws != 0 or (h // n) % ws != 0:
                raise ValueError(
                    f"spatial_cp(SwinIR): halo ({halo}) and per-shard height H/n "
                    f"({h // n}) must both divide by window_size {ws} so the "
                    f"shard-local window grid aligns with the global one")
        if "cp_net" not in self._apply_cache:
            # cp variant of net_g (exact global stats under sharding); its
            # options add no params, so self.params_g applies unchanged
            self._apply_cache["cp_net"] = build_network(dict(self._cp_net_opt))
        net = self._apply_cache["cp_net"]
        self.output = spatial_sharded_apply(
            lambda p, xs: net.apply({"params": p}, xs)[0],
            self._infer_params(), self.lq, mesh, halo=halo, axis=axis, scale=self.scale,
        )

    def test_selfensemble(self) -> None:
        """×8 dihedral test-time ensemble, fully on device (sr_model.py:187-232).

        For square inputs the 8 augments run as ONE batched forward (8× batch)
        — a single MXU-saturating launch instead of 8 small ones; non-square
        inputs fall back to two batched passes (4 flips × {plain, transposed}).
        """
        params = self._infer_params()

        def flips(x):
            return [x, jnp.flip(x, 2), jnp.flip(x, 1), jnp.flip(jnp.flip(x, 1), 2)]

        def unflips(ys):
            return [ys[0], jnp.flip(ys[1], 2), jnp.flip(ys[2], 1), jnp.flip(jnp.flip(ys[3], 1), 2)]

        b = self.lq.shape[0]
        plain = flips(self.lq)
        trans = flips(self.lq.transpose(0, 2, 1, 3))
        if self.lq.shape[1] == self.lq.shape[2]:
            batch = jnp.concatenate(plain + trans, axis=0)
            out = self._apply(params, batch)
            ys = [out[i * b : (i + 1) * b] for i in range(8)]
        else:
            out_p = self._apply(params, jnp.concatenate(plain, axis=0))
            out_t = self._apply(params, jnp.concatenate(trans, axis=0))
            ys = [out_p[i * b : (i + 1) * b] for i in range(4)] + [out_t[i * b : (i + 1) * b] for i in range(4)]
        ys = unflips(ys[:4]) + [y.transpose(0, 2, 1, 3) for y in unflips(ys[4:])]
        self.output = jnp.mean(jnp.stack(ys, axis=0), axis=0)

    @staticmethod
    def _tile_grid(height, width, infer_size, tile_pad, scale):
        """The reference tile geometry (sr_model.py:286-302), one dict per tile."""
        tiles = []
        for y in range(math.ceil(height / infer_size)):
            for x in range(math.ceil(width / infer_size)):
                in_sx, in_ex = x * infer_size, min((x + 1) * infer_size, width)
                in_sy, in_ey = y * infer_size, min((y + 1) * infer_size, height)
                pad_sx, pad_ex = max(in_sx - tile_pad, 0), min(in_ex + tile_pad, width)
                pad_sy, pad_ey = max(in_sy - tile_pad, 0), min(in_ey + tile_pad, height)
                tiles.append(
                    {
                        "src": (pad_sy, pad_ey, pad_sx, pad_ex),
                        "dst": (in_sy * scale, in_ey * scale, in_sx * scale, in_ex * scale),
                        "crop": (
                            (in_sy - pad_sy) * scale,
                            (in_ey - pad_sy) * scale,
                            (in_sx - pad_sx) * scale,
                            (in_ex - pad_sx) * scale,
                        ),
                    }
                )
        return tiles

    def test_tile(self) -> None:
        """Device-resident static-shape tiler (reference loop: sr_model.py:273-361).

        The reference forwards every tile separately — ceil(W/t)·ceil(H/t)
        tiny launches, a fresh compile per ragged edge shape, and a host
        round-trip per tile.  Here the WHOLE tiling is one jitted XLA
        program: tiles are grouped by patch geometry (at most 9 groups for
        any image: interior / 4 edges / 4 corners, each possibly ragged),
        each group's patches are static slices of the on-device image,
        forwards run as fixed-size batched chunks under ``lax.map`` (bounding
        peak activation memory via ``tile.chunk``), and the de-haloed crops
        paste into the output with static updates — one upload, one dispatch,
        one download, which is what a tunnel/PCIe-attached chip needs.
        Patches are exactly the reference's clamped regions and batch
        elements are independent in every shipped arch, so the output matches
        the reference tiler bit-for-bit.
        """
        batch, height, width, channel = self.lq.shape
        infer_size = self.opt["tile"]["infer_size"]
        tile_pad = self.opt["tile"]["tile_pad"]
        chunk = self.opt["tile"].get("chunk", 8)
        scale = self.scale
        params = self._infer_params()

        cache_key = ("tile", batch, height, width, channel, infer_size, tile_pad, chunk, scale)
        if cache_key not in self._apply_cache:
            groups: dict = {}
            for tile in self._tile_grid(height, width, infer_size, tile_pad, scale):
                sy, ey, sx, ex = tile["src"]
                key = (ey - sy, ex - sx, tile["crop"])
                groups.setdefault(key, []).append(tile)
            net = self.net_g

            @jax.jit
            def tiled_fwd(p, lq):
                out_img = jnp.zeros((batch, height * scale, width * scale, channel), lq.dtype)
                for (ph, pw, crop), tiles in groups.items():
                    n = len(tiles)
                    patches = jnp.concatenate(
                        [lq[:, t["src"][0] : t["src"][0] + ph, t["src"][2] : t["src"][2] + pw] for t in tiles]
                    )  # (n·b, ph, pw, c)
                    k = -(-n * batch // (chunk * batch))
                    pad_n = k * chunk * batch - n * batch
                    if pad_n:
                        patches = jnp.concatenate([patches, jnp.repeat(patches[-1:], pad_n, axis=0)])
                    outs = jax.lax.map(
                        lambda piece: net.apply({"params": p}, piece)[0],
                        patches.reshape(k, chunk * batch, ph, pw, channel),
                    )
                    outs = outs.reshape(k * chunk * batch, ph * scale, pw * scale, channel)
                    outs = outs[: n * batch].reshape(n, batch, ph * scale, pw * scale, channel)
                    csy, cey, csx, cex = crop
                    for i, t in enumerate(tiles):
                        osy, oey, osx, oex = t["dst"]
                        out_img = jax.lax.dynamic_update_slice(
                            out_img, outs[i, :, csy:cey, csx:cex].astype(out_img.dtype), (0, osy, osx, 0)
                        )
                return out_img

            self._apply_cache[cache_key] = tiled_fwd
        self.output = self._apply_cache[cache_key](params, self.lq)

    def _test_tile_loop(self) -> None:
        """Reference-literal per-tile loop (sr_model.py:273-361) — kept as the
        numeric oracle for the grouped tiler's parity test."""
        batch, height, width, channel = self.lq.shape
        infer_size = self.opt["tile"]["infer_size"]
        tile_pad = self.opt["tile"]["tile_pad"]
        scale = self.scale
        output = np.zeros((batch, height * scale, width * scale, channel), dtype=np.float32)
        params = self._infer_params()
        for tile in self._tile_grid(height, width, infer_size, tile_pad, scale):
            sy, ey, sx, ex = tile["src"]
            output_tile = np.asarray(self._apply(params, self.lq[:, sy:ey, sx:ex, :]))
            osy, oey, osx, oex = tile["dst"]
            csy, cey, csx, cex = tile["crop"]
            output[:, osy:oey, osx:oex] = output_tile[:, csy:cey, csx:cex]
        self.output = jnp.asarray(output)

    def get_current_visuals(self) -> OrderedDict:
        out = OrderedDict()
        out["lq"] = np.asarray(self.lq)
        out["result"] = np.asarray(self.output, dtype=np.float32)
        if self.gt is not None:
            out["gt"] = np.asarray(self.gt)
        return out

    def get_current_log(self):
        return self.log_dict

    # ------------------------------------------------------------------
    # Validation / profiling
    # ------------------------------------------------------------------

    def dist_validation(self, dataloader, current_iter, tb_logger, save_img, clamp=True):
        """Multi-host validation.

        Default = reference semantics (rank 0 evaluates everything,
        sr_model.py:363-369).  ``val.dist_eval: true`` (TPU extension, the
        SURVEY §2.9 design target) stripes the images across processes —
        every host evaluates its ``idx % world == rank`` slice and the metric
        sums are allgathered — an O(world) validation speedup.
        """
        if (self.opt.get("val") or {}).get("dist_eval"):
            self.nondist_validation(
                dataloader, current_iter, tb_logger, save_img, clamp,
                _stride=(self.opt.get("rank", 0), self.opt.get("world_size", 1)),
            )
        elif self.opt.get("rank", 0) == 0:
            self.nondist_validation(dataloader, current_iter, tb_logger, save_img, clamp)
        if not (self.opt.get("val") or {}).get("dist_eval"):
            # rank-0-only path: resync before the other ranks hit the next
            # training collective (its backend context init would time out —
            # Gloo's 30 s deadline; see dist_util.barrier)
            from dcpt_tpu.utils.dist_util import barrier

            barrier("sr_validation_done")

    def nondist_validation(self, dataloader, current_iter, tb_logger, save_img, clamp=True, _stride=None):
        dataset_name = dataloader.dataset.opt["name"]
        with_metrics = self.opt["val"].get("metrics") is not None
        if with_metrics:
            if not hasattr(self, "metric_results"):
                self.metric_results = {metric: 0 for metric in self.opt["val"]["metrics"].keys()}
            self._initialize_best_metric_results(dataset_name)
            self.metric_results = {metric: 0 for metric in self.metric_results}

        n_seen = 0
        for idx, val_data in enumerate(dataloader):
            if _stride is not None and idx % _stride[1] != _stride[0]:
                continue
            n_seen += 1
            self.feed_data(val_data)
            self.pre_test()
            if "tile" in self.opt:
                self.test_tile()
            elif self.opt.get("ensemble"):
                self.test_selfensemble()
            else:
                self.test()
            self.post_test()

            device_result, device_gt = self.output, self.gt
            visuals = self.get_current_visuals()
            result = visuals["result"]
            gt = visuals.get("gt")
            if clamp:
                result = np.clip(result, 0, 1)
                if gt is not None:
                    gt = np.clip(gt, 0, 1)
            del self.lq, self.output
            self.gt = None

            if with_metrics:
                for name, opt_ in self.opt["val"]["metrics"].items():
                    if str(opt_.get("type", "")).endswith("_device"):
                        # on-device metric: no host round-trip (BASELINE.json goal)
                        val = calculate_metric(
                            {"img": jnp.clip(device_result, 0, 1), "img2": jnp.clip(device_gt, 0, 1)},
                            dict(opt_),
                        )
                        self.metric_results[name] += float(jnp.mean(val))
                    else:
                        self.metric_results[name] += calculate_metric(
                            {"img": result, "img2": gt}, dict(opt_, input_order="BHWC")
                        )
                if not clamp:
                    result = np.nan_to_num(result)
                    self.metric_results["mae"] = 255 * np.abs(np.mean(result.clip(0, 1) - gt))

            if save_img:
                self._save_validation_images(val_data, result, dataset_name, current_iter)

        if _stride is not None and with_metrics:
            # allgather (sum, count) so every host holds the GLOBAL averages
            from jax.experimental import multihost_utils

            keys = sorted(self.metric_results)
            local = np.asarray([self.metric_results[k] for k in keys] + [float(n_seen)], np.float64)
            gathered = np.asarray(multihost_utils.process_allgather(local.astype(np.float32)))
            totals = gathered.reshape(-1, len(keys) + 1).sum(axis=0)
            n_seen = int(totals[-1])
            for i, k in enumerate(keys):
                self.metric_results[k] = float(totals[i])

        if with_metrics and n_seen > 0:
            for metric in self.metric_results.keys():
                self.metric_results[metric] /= n_seen
                if clamp:
                    self._update_best_metric_result(dataset_name, metric, self.metric_results[metric], current_iter)
            if clamp and (_stride is None or _stride[0] == 0):
                self._log_validation_metric_values(current_iter, dataset_name, tb_logger)

    def _save_validation_images(self, val_data, result, dataset_name, current_iter):
        """8/16-bit PNG dump per image path (reference: sr_model.py:441-480)."""
        for i, img_path in enumerate(val_data["lq_path"]):
            depth = self.opt.get("depth", 8)
            if depth == 16:
                sr_img = (result[i] * 65535.0).round().astype(np.uint16)
            else:
                sr_img = (result[i] * 255.0).round().astype(np.uint8)
            if sr_img.shape[-1] == 3:
                sr_img = cv2.cvtColor(sr_img, cv2.COLOR_RGB2BGR)
            elif sr_img.shape[-1] == 1:
                sr_img = sr_img[..., 0]
            img_name = osp.splitext(osp.basename(img_path))[0]
            if self.opt["is_train"]:
                save_img_path = osp.join(
                    self.opt["path"]["visualization"], img_name, f"{img_name}_{current_iter}.png"
                )
            elif self.opt["val"].get("suffix"):
                save_img_path = osp.join(
                    self.opt["path"]["visualization"], dataset_name, f'{img_name}_{self.opt["val"]["suffix"]}.png'
                )
            else:
                save_img_path = osp.join(
                    self.opt["path"]["visualization"], dataset_name, f'{img_name}_{self.opt["name"]}.png'
                )
            imwrite(sr_img, save_img_path)

    def _log_validation_metric_values(self, current_iter, dataset_name, tb_logger):
        log_str = f"Validation {dataset_name}\n"
        for metric, value in self.metric_results.items():
            log_str += f"\t # {metric}: {value:.4f}"
            if hasattr(self, "best_metric_results"):
                rec = self.best_metric_results[dataset_name][metric]
                log_str += f'\tBest: {rec["val"]:.4f} @ {rec["iter"]} iter'
            log_str += "\n"
        get_root_logger().info(log_str)
        if tb_logger:
            for metric, value in self.metric_results.items():
                tb_logger.add_scalar(f"metrics/{dataset_name}/{metric}", value, current_iter)

    def dist_profile(self, dataloader):
        if self.opt.get("rank", 0) == 0:
            self.nondist_profile(dataloader)

    def nondist_profile(self, dataloader, flops: bool = True):
        """Latency / memory / FLOPs report (reference: sr_model.py:520-568).

        ``profile_trace_dir`` in the options additionally captures a
        ``jax.profiler`` trace viewable in TensorBoard/Perfetto.
        """
        logger = get_root_logger()
        trace_dir = self.opt.get("profile_trace_dir")
        trace_cm = jax.profiler.trace(trace_dir) if trace_dir else None
        if trace_cm is not None:
            trace_cm.__enter__()
        timings, mpix = [], []
        flops_reported = False
        for idx, val_data in enumerate(dataloader):
            self.feed_data(val_data)
            self.pre_test()

            if flops and not flops_reported:
                try:
                    net = self.net_g
                    lowered = jax.jit(lambda p, x: net.apply({"params": p}, x)[0]).lower(self._infer_params(), self.lq)
                    cost = lowered.compile().cost_analysis()
                    if cost and "flops" in cost:
                        logger.info(f"XLA cost analysis: {cost['flops'] / 1e9:.2f} GFLOPs @ input {self.lq.shape}")
                except Exception as e:  # noqa: BLE001
                    logger.warning(f"cost analysis unavailable: {e}")
                flops_reported = True

            # warm-up compile for this shape
            self.test()
            jax.block_until_ready(self.output)
            t0 = time.perf_counter()
            self.test()
            jax.block_until_ready(self.output)
            dt = time.perf_counter() - t0
            timings.append(dt * 1000)
            mpix.append(self.lq.shape[1] * self.lq.shape[2] * self.lq.shape[0] / 1e6 / dt)
            self.post_test()

        if trace_cm is not None:
            trace_cm.__exit__(None, None, None)
            logger.info(f"jax.profiler trace written to {trace_dir}")
        logger.info(f"The average test time is {np.mean(timings):.2f} ms.")
        logger.info(f"Throughput: {np.mean(mpix):.2f} Megapixels/sec/chip.")
        try:
            stats = jax.local_devices()[0].memory_stats()
            if stats:
                logger.info(f"Device peak memory: {stats.get('peak_bytes_in_use', 0) / 1024**2:.1f} MiB")
        except Exception:  # noqa: BLE001
            pass
        return {"ms": float(np.mean(timings)), "mpix_per_s": float(np.mean(mpix))}

    # ------------------------------------------------------------------
    # Save / resume
    # ------------------------------------------------------------------

    def save(self, epoch: int, current_iter: int) -> None:
        trees = {"params": self.params_g}
        if self.params_g_ema is not None:
            trees["params_ema"] = self.params_g_ema
        self.save_network(trees, "net_g", current_iter)
        self.save_training_state(epoch, current_iter, {"opt_state_g": self.pack_state(self.opt_state_g)})

    def resume_training(self, resume_state: dict) -> None:
        if "opt_state_g" in resume_state:
            self.opt_state_g = self.unpack_state(self.opt_state_g, resume_state["opt_state_g"])
            if self._zero_specs_g is not None:
                # unpack lands host arrays — re-place on the ZeRO-1 shards
                self.opt_state_g = jax.tree_util.tree_map(
                    jax.device_put, self.opt_state_g, self._zero_specs_g)
