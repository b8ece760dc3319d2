"""DCPT pre-training step throughput on one chip (the reference's headline
workload — the two-pass scheme of …pretrain_model.py:133-169 fused into one
jitted, buffer-donated step).

Usage: python scripts/bench_train.py [--batch 8 16] [--gt-size 128] [--iters 8]

Methodology matches bench.py: chained dependency (the step feeds its own
params forward — donation makes that natural) ended by one host
materialization, params initialized on the host CPU device.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[8, 16])
    ap.add_argument("--gt-size", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--mixed", action="store_true", help="bf16 compute / fp32 master params")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dcpt_tpu.models import build_model

    cpu = jax.devices("cpu")[0]
    accel = jax.devices()[0]
    gt = args.gt_size

    # the flagship train_NAFNet_dcpt_5d.yml network/train sections
    opt = {
        "name": "bench_train", "model_type": "DCPTModel", "scale": 1, "num_gpu": 1,
        "manual_seed": 0, "is_train": True, "dist": False, "rank": 0, "world_size": 1,
        "hook_names": "ups",
        "network_g": {"type": "NAFNetBaseline", "width": 64, "enc_blk_nums": [1, 1, 1, 28],
                      "middle_blk_num": 1, "dec_blk_nums": [1, 1, 1, 1], "window_size": 16, "h": gt},
        "network_dc": {"type": "PromptIR_NoImg_DC", "feature_dims": [64, 128, 256, 512],
                       "num_res_blocks": 2, "num_classes": 5},
        "path": {},
        "train": {
            "optim_g": {"type": "AdamW", "lr": 1e-4, "weight_decay": 1e-4},
            "optim_dc": {"type": "AdamW", "lr": 1e-4, "weight_decay": 1e-4},
            "scheduler": {"type": "CosineAnnealingRestartLR", "periods": [100], "restart_weights": [1]},
            "classify_opt": {"type": "CrossEntropyLoss"},
            "pixel_opt": {"type": "PSNRLoss", "loss_weight": 1.0, "reduction": "mean"},
            "mixed_precision": args.mixed,
            "total_iter": 100,
        },
        "val": {"metrics": {}},
    }

    with jax.default_device(cpu):
        model = build_model(opt)
    model.params_g = jax.device_put(model.params_g, accel)
    model.params_dc = jax.device_put(model.params_dc, accel)
    model.opt_state_g = jax.device_put(model.opt_state_g, accel)
    model.opt_state_dc = jax.device_put(model.opt_state_dc, accel)

    rng = np.random.default_rng(0)
    results = {}
    for bs in args.batch:
        lq = jax.device_put(jnp.asarray(rng.random((bs, gt, gt, 3), dtype=np.float32)), accel)
        gt_img = jax.device_put(jnp.asarray(rng.random((bs, gt, gt, 3), dtype=np.float32)), accel)
        idx = jax.device_put(jnp.asarray(rng.integers(0, 5, bs), dtype=jnp.int32), accel)
        lr = jnp.float32(1e-4)

        # the step donates its state args, so thread one live copy through
        state = (model.params_g, model.params_dc, model.opt_state_g, model.opt_state_dc)
        state = jax.tree_util.tree_map(lambda a: a + 0 if hasattr(a, "dtype") else a, state)

        def run(state, n):
            pg, pdc, og, odc = state
            for _ in range(n):
                pg, pdc, og, odc, losses = model._train_step(pg, pdc, og, odc, lq, gt_img, idx, lr, lr)
            np.asarray(jax.tree_util.tree_leaves(pg)[0]).ravel()[0]
            return pg, pdc, og, odc

        state = run(state, 1)  # compile + warm
        t0 = time.perf_counter()
        state = run(state, args.iters)
        dt = (time.perf_counter() - t0) / args.iters
        mpix = bs * gt * gt / 1e6 / dt
        results[f"dcpt_step_bs{bs}_ms"] = round(dt * 1e3, 2)
        results[f"dcpt_step_bs{bs}_mpix_s"] = round(mpix, 3)
        print(f"DCPT step bs={bs} @{gt}px: {dt*1e3:.1f} ms = {mpix:.2f} MPix/s", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
