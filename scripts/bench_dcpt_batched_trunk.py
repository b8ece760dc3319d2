"""DCPT train-step A/B: two net_g trunk passes vs ONE batched 2B trunk
(VERDICT r4 item 4 — the untried lever under the "104 ms structural floor").

The DCPT step forwards net_g TWICE with the same weights (reference
semantics, basicsr/models/degradation_classification_pretrain_model.py:140
full forward on the clean gt for the pixel loss, :154 skip-tail forward on
the degraded lq for the hook taps).  Convs and LayerNorms are batch-parallel,
so concatenating the two inputs into one 2B-batch trunk call — tail
(ending conv + input residual) applied to the gt half only, taps taken from
the lq half — is numerically EXACT (parity-pinned in
tests/test_dc_models.py::test_batched_trunk_step_matches_two_pass) and
doubles MXU occupancy at exactly the under-tiled deep stages (4×4 @ c=1024)
the round-4 profile blamed for the 50.7-TFLOPS grad ceiling.

Baseline (train.batched_trunk absent/false): the shipped two-pass step.
Candidate (train.batched_trunk: true): one concat trunk.

Measures the flagship DCPT pre-training step (NAFNet-w64 + PromptIR_NoImg_DC,
bs16 @128px) fp32 and mixed, ITERS steps scanned inside one dispatch,
interleaved-min ×REPS (tunnel variance rules — CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 16
REPS = 2


def make_step(mixed: bool, batched: bool, rng, cpu, accel, gt=128, bs=16):
    import functools

    import jax
    import jax.numpy as jnp

    from dcpt_tpu.models import build_model

    opt = {
        "name": "bench_batched_trunk", "model_type": "DCPTModel", "scale": 1, "num_gpu": 1,
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
            "batched_trunk": batched,
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

    # ITERS steps scanned inside ONE dispatch (tunnel-dispatch amortization —
    # same methodology as bench.py's train sections / scripts/bench_naf_bwd.py)
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

    print(f"# compiling mixed={mixed} batched_trunk={batched}", file=sys.stderr, flush=True)
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

    out = {}
    for mixed, tag in ((True, "mixed"), (False, "fp32")):
        runs = {}
        for batched in (False, True):
            try:
                runs[batched] = make_step(mixed, batched, rng, cpu, accel)
            except Exception as e:  # noqa: BLE001 — record, keep the other leg
                out[f"{tag}_batched{int(batched)}_error"] = str(e)[:300]
                print(f"# {tag} batched={batched} FAILED: {e}", file=sys.stderr, flush=True)
        best = {k: float("inf") for k in runs}
        for _ in range(REPS):
            for k in runs:
                state, run = runs[k]
                t0 = time.perf_counter()
                state, _ = run(state, ITERS)
                best[k] = min(best[k], (time.perf_counter() - t0) / ITERS)
                runs[k] = (state, run)
        for k, dt in best.items():
            out[f"{tag}_{'batched' if k else 'twopass'}_ms"] = round(dt * 1e3, 2)
        if False in best and True in best:
            out[f"{tag}_speedup"] = round(best[False] / best[True], 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
