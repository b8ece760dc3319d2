"""End-to-end A/B for the masked-dense dwconv reformulation (VERDICT r3
item 5): the DCPT mixed train-step profile blames the NAFBlocks' grouped
depthwise convs (VPU), and the dwconv microbench through the tunnel is
dispatch-dominated (scripts/bench_dwconv_mxu.py measured 10–500 ms for
sub-GFLOP ops with fwd+bwd occasionally "faster" than fwd — pure noise), so
the question is settled the only way the tunnel allows: the REAL flagship
train step, twin dwconv grouped (DCPT_TPU_DW_DENSE=0, shipped) vs masked
dense on the MXU (=1), mixed precision, interleaved-min ×2.

Usage: python scripts/bench_dw_dense_e2e.py
Prints one JSON line: {"mixed_grouped_ms", "mixed_dense_ms", "speedup"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 16  # scanned INSIDE one jit dispatch (tunnel dispatch overhead has
# been observed near 0.5 s — 8 chained dispatches would flatten the A/B)
REPS = 2


def make_step(dense: bool, rng, cpu, accel, gt=128, bs=16):
    import functools

    import jax
    import jax.numpy as jnp

    from dcpt_tpu.models import build_model

    os.environ["DCPT_TPU_DW_DENSE"] = "1" if dense else "0"

    opt = {
        "name": "bench_dw_dense", "model_type": "DCPTModel", "scale": 1, "num_gpu": 1,
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
            "mixed_precision": True,
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

    print(f"# compiling dense={dense}", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    state, losses = run(state, ITERS)  # warm with the timed executable's n
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

    out = {}
    runs = {}
    for dense in (False, True):
        try:
            runs[dense] = make_step(dense, rng, cpu, accel)
        except Exception as e:  # noqa: BLE001 — record, keep the other leg
            out[f"dense{int(dense)}_error"] = str(e)[:300]
            print(f"# dense={dense} FAILED: {e}", file=sys.stderr, flush=True)
    best = {k: float("inf") for k in runs}
    for _ in range(REPS):
        for k in runs:
            state, run = runs[k]
            t0 = time.perf_counter()
            state, _ = run(state, ITERS)
            best[k] = min(best[k], (time.perf_counter() - t0) / ITERS)
            runs[k] = (state, run)
    for k, dt in best.items():
        out[f"mixed_{'dense' if k else 'grouped'}_ms"] = round(dt * 1e3, 2)
    if False in best and True in best:
        out["speedup"] = round(best[False] / best[True], 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
