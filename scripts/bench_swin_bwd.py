"""SwinIR train-step A/B: twin-delegated backward vs the analytic Pallas
SwinBlock backward (ops/swin_block_bwd.py).

Baseline (DCPT_TPU_SWIN_BWD=0): differentiated traces compile the pure-XLA
autodiff graph of the jnp twin.
Candidate (DCPT_TPU_SWIN_BWD=1): fused whole-SwinBlock forward + the
single-pass analytic backward on every RSTB block.

Measures the DCPT SwinIR pre-training step (train_SwinIR_dcpt_5d.yml shapes:
SwinIR 180/6×6 + PromptIR_NoImg_DC on encode_layers taps, bs8 @128px) fp32
and mixed, interleaved-min ×2 (tunnel variance rules; K steps scanned inside
ONE dispatch — see bench_naf_bwd.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 4  # scanned INSIDE one jit dispatch
REPS = 2


def make_step(mixed: bool, swin_bwd: bool, rng, cpu, accel, gt=128, bs=8):
    import functools

    import jax
    import jax.numpy as jnp

    from dcpt_tpu.models import build_model

    os.environ["DCPT_TPU_SWIN_BWD"] = "1" if swin_bwd else "0"

    opt = {
        "name": "bench_swin_bwd", "model_type": "DCPTModel", "scale": 1,
        "num_gpu": 1, "manual_seed": 0, "is_train": True, "dist": False,
        "rank": 0, "world_size": 1, "hook_names": "encode_layers", "init_size": gt,
        "network_g": {"type": "SwinIR", "embed_dim": 180, "depths": [6, 6, 6, 6, 6, 6],
                      "num_heads": [6, 6, 6, 6, 6, 6], "mlp_ratio": 2.0,
                      "window_size": 8, "upscale": 1, "h": gt},
        "network_dc": {"type": "PromptIR_NoImg_DC", "feature_dims": [180, 180, 180],
                       "num_res_blocks": 2, "num_classes": 5, "downsample": True},
        "path": {},
        "train": {
            "optim_g": {"type": "AdamW", "lr": 1e-4, "weight_decay": 1e-4},
            "optim_dc": {"type": "AdamW", "lr": 1e-4, "weight_decay": 1e-4},
            "scheduler": {"type": "CosineAnnealingRestartLR", "periods": [100], "restart_weights": [1]},
            "classify_opt": {"type": "CrossEntropyLoss"},
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
            "mixed_precision": mixed,
            "total_iter": 100,
        },
        "val": {"metrics": {}},
    }
    with jax.default_device(cpu):
        model = build_model(opt)
    state = jax.device_put(
        (model.params_g, model.params_dc, model.opt_state_g, model.opt_state_dc), accel)
    lq = jax.device_put(jnp.asarray(rng.random((bs, gt, gt, 3), dtype=np.float32)), accel)
    gt_img = jax.device_put(jnp.asarray(rng.random((bs, gt, gt, 3), dtype=np.float32)), accel)
    idx = jax.device_put(jnp.asarray(rng.integers(0, 5, bs), dtype=jnp.int32), accel)
    lr = jnp.float32(1e-4)

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(6,))
    def multi(state, lq, gt_img, idx, lr_g, lr_dc, n):
        def body(st, _):
            pg, pdc, og, odc = st
            pg, pdc, og, odc, losses = model._train_step(pg, pdc, og, odc, lq, gt_img, idx, lr_g, lr_dc)
            return (pg, pdc, og, odc), losses
        st, losses = jax.lax.scan(body, state, None, length=n)
        return st, jax.tree_util.tree_map(lambda t: t[-1], losses)

    def run(state, n):
        state, losses = multi(state, lq, gt_img, idx, lr, lr, n)
        np.asarray(jax.tree_util.tree_leaves(state[0])[0]).ravel()[0]
        return state, losses

    print(f"# compiling mixed={mixed} swin_bwd={swin_bwd}", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    state, losses = run(state, ITERS)
    print(f"# compiled+first {ITERS} steps in {time.perf_counter() - t0:.1f}s "
          f"losses={jax.tree_util.tree_map(float, losses)}", file=sys.stderr, flush=True)
    return state, run


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    cpu = jax.devices("cpu")[0]
    accel = jax.devices()[0]
    rng = np.random.default_rng(0)

    only = sys.argv[1] if len(sys.argv) > 1 else None  # "fp32" | "mixed"
    out = {}
    for mixed, tag in ((False, "fp32"), (True, "mixed")):
        if only and tag != only:
            continue
        runs = {}
        for swin_bwd in (False, True):
            try:
                runs[swin_bwd] = make_step(mixed, swin_bwd, rng, cpu, accel)
            except Exception as e:  # noqa: BLE001 — record, keep the other leg
                out[f"{tag}_bwd{int(swin_bwd)}_error"] = str(e)[:300]
                print(f"# {tag} swin_bwd={swin_bwd} FAILED: {e}", file=sys.stderr, flush=True)
        best = {k: float("inf") for k in runs}
        for _ in range(REPS):
            for k in runs:
                state, run = runs[k]
                t0 = time.perf_counter()
                state, _ = run(state, ITERS)
                best[k] = min(best[k], (time.perf_counter() - t0) / ITERS)
                runs[k] = (state, run)
        for k, dt in best.items():
            out[f"{tag}_{'analytic' if k else 'twin'}_ms"] = round(dt * 1e3, 2)
        if False in best and True in best:
            out[f"{tag}_speedup"] = round(best[False] / best[True], 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
