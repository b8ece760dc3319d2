"""DCPT train-step A/B: twin-delegated backward vs the analytic Pallas
backward (VERDICT r3 item 3).

Baseline (DCPT_TPU_NAF_BWD=0): differentiated traces compile the pure-XLA
autodiff graph of the jnp twin (the round-3 winner over kernel-fwd +
twin-recompute-bwd, which lost 1.86×).
Candidate (DCPT_TPU_NAF_BWD=1): fused Pallas forward + the hand-derived
two-pass Pallas backward (ops/naf_block_bwd.py) at every stage the bwd tile
picker accepts (c ≤ 256 — the shallow stages that hold the HBM traffic).

Measures the flagship DCPT pre-training step (NAFNet-w64 + PromptIR_NoImg_DC,
bs16 @128px) fp32 and mixed, interleaved-min ×2 (tunnel variance rules).
In mixed, the arch's bf16 stage cap is lifted so the kernel path is traced
(bf16 fwd kernels measured a tie and stay opt-in by default; this A/B decides
the TRAIN routing).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 8
REPS = 2


def make_step(mixed: bool, naf_bwd: bool, rng, cpu, accel, gt=128, bs=16):
    import jax
    import jax.numpy as jnp

    from dcpt_tpu.archs import nafnet_arch
    from dcpt_tpu.models import build_model

    os.environ["DCPT_TPU_NAF_BWD"] = "1" if naf_bwd else "0"
    nafnet_arch._NAF_BLOCK_MAXC = 4096 if (mixed and naf_bwd) else 0

    opt = {
        "name": "bench_naf_bwd", "model_type": "DCPTModel", "scale": 1, "num_gpu": 1,
        "manual_seed": 0, "is_train": True, "dist": False, "rank": 0, "world_size": 1,
        "hook_names": "ups", "init_size": gt,
        "network_g": {"type": "NAFNetBaseline", "width": 64, "enc_blk_nums": [1, 1, 1, 28],
                      "middle_blk_num": 1, "dec_blk_nums": [1, 1, 1, 1], "window_size": 16},
        "network_dc": {"type": "PromptIR_NoImg_DC", "feature_dims": [64, 128, 256, 512],
                       "num_res_blocks": 2, "num_classes": 5},
        "path": {},
        "train": {
            "optim_g": {"type": "AdamW", "lr": 1e-4, "weight_decay": 1e-4},
            "optim_dc": {"type": "AdamW", "lr": 1e-4, "weight_decay": 1e-4},
            "scheduler": {"type": "CosineAnnealingRestartLR", "periods": [100], "restart_weights": [1]},
            "classify_opt": {"type": "CrossEntropyLoss"},
            "pixel_opt": {"type": "PSNRLoss", "loss_weight": 1.0, "reduction": "mean"},
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

    def run(state, n):
        pg, pdc, og, odc = state
        for _ in range(n):
            pg, pdc, og, odc, losses = model._train_step(pg, pdc, og, odc, lq, gt_img, idx, lr, lr)
        np.asarray(jax.tree_util.tree_leaves(pg)[0]).ravel()[0]
        return (pg, pdc, og, odc), losses

    print(f"# compiling mixed={mixed} naf_bwd={naf_bwd}", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    state, losses = run(state, 1)
    print(f"# compiled+first step in {time.perf_counter() - t0:.1f}s "
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

    out = {}
    for mixed, tag in ((False, "fp32"), (True, "mixed")):
        runs = {}
        for naf_bwd in (False, True):
            try:
                runs[naf_bwd] = make_step(mixed, naf_bwd, rng, cpu, accel)
            except Exception as e:  # noqa: BLE001 — record, keep the other leg
                out[f"{tag}_bwd{int(naf_bwd)}_error"] = str(e)[:300]
                print(f"# {tag} naf_bwd={naf_bwd} FAILED: {e}", file=sys.stderr, flush=True)
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
