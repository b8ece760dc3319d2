"""Component-level profile of the DCPT pre-training step (VERDICT r2 item 3).

Decomposes the 105 ms @bs16/128px step into its pieces, each timed as its own
jitted chained loop on the real chip, with XLA-cost FLOPs for achieved-TFLOPS
accounting:

  A. net_g full forward on GT (the pixel-loss pass)
  B. net_g skip_tail forward on LQ (the hook pass)
  C. net_dc forward on the hook features
  D. value_and_grad of the COMBINED loss (the real backward)
  E. optimizer update + apply (both nets)
  F. the full fused step (reference: …pretrain_model.py:133-169)

plus targeted A/Bs: backward-only of net_g (is the dwconv backward on the
round-2 compiler cliff?), PSNRLoss vs L1 ablation, and per-precision runs.

Usage: python scripts/profile_train_step.py [--batch 16] [--gt-size 128] [--mixed]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def chain_time(fn, state, iters=6, tag=""):
    """Chained-dependency timing (CLAUDE.md: block_until_ready lies on the
    tunnel): fn(state) -> state', materialize one scalar at the end."""
    import jax

    state = fn(state)  # compile + warm
    jax.tree_util.tree_leaves(state)[0].block_until_ready()
    np.asarray(jax.tree_util.tree_leaves(state)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn(state)
    np.asarray(jax.tree_util.tree_leaves(state)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / iters
    print(f"  {tag:<46s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def flops_of(jitted, *args):
    try:
        return jitted.lower(*args).compile().cost_analysis().get("flops", 0.0)
    except Exception:
        return 0.0


# Per-arch DCPT configs — identical to the shipped train ymls / bench.py
# sections so the component numbers decompose the SAME steps the bench
# measures (bench_train_step / bench_restormer_train_step /
# bench_swinir_train_step).
ARCHS = {
    "nafnet": {
        "batch": 16,
        "hook_names": "ups",
        "network_g": {"type": "NAFNetBaseline", "width": 64, "enc_blk_nums": [1, 1, 1, 28],
                      "middle_blk_num": 1, "dec_blk_nums": [1, 1, 1, 1], "window_size": 16},
        "network_dc": {"type": "PromptIR_NoImg_DC", "feature_dims": [64, 128, 256, 512],
                       "num_res_blocks": 2, "num_classes": 5},
    },
    "restormer": {
        "batch": 8,
        "hook_names": "decoder_level",
        "network_g": {"type": "Restormer", "inp_channels": 3, "out_channels": 3, "dim": 48,
                      "num_blocks": [4, 6, 6, 8], "num_refinement_blocks": 4,
                      "heads": [1, 2, 4, 8], "ffn_expansion_factor": 2.66,
                      "bias": False, "LayerNorm_type": "BiasFree", "dual_pixel_task": False},
        "network_dc": {"type": "PromptIR_NoImg_DC", "feature_dims": [96, 96, 192, 384],
                       "num_res_blocks": 2, "num_classes": 5, "downsample": False},
    },
    "swinir": {
        "batch": 8,
        "hook_names": "encode_layers",
        "network_g": {"type": "SwinIR", "embed_dim": 180, "depths": [6, 6, 6, 6, 6, 6],
                      "num_heads": [6, 6, 6, 6, 6, 6], "mlp_ratio": 2.0,
                      "window_size": 8, "upscale": 1},
        "network_dc": {"type": "PromptIR_NoImg_DC", "feature_dims": [180, 180, 180],
                       "num_res_blocks": 2, "num_classes": 5, "downsample": True},
    },
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="nafnet", choices=sorted(ARCHS))
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--gt-size", type=int, default=128)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--mixed", action="store_true")
    args = ap.parse_args()
    arch = ARCHS[args.arch]
    if args.batch is None:
        args.batch = arch["batch"]

    import jax
    import jax.numpy as jnp

    from dcpt_tpu.models import build_model
    from dcpt_tpu.models.dc_util import select_taps
    from dcpt_tpu.ops import enable_pallas

    # profile the SHIPPED defaults (winner kernels + analytic backwards on
    # TPU) — same guard as the bench train sections (leaked-kill-switch bug)
    enable_pallas("auto")

    cpu = jax.devices("cpu")[0]
    accel = jax.devices()[0]
    bs, gt = args.batch, args.gt_size

    opt = {
        "name": "prof", "model_type": "DCPTModel", "scale": 1, "num_gpu": 1,
        "manual_seed": 0, "is_train": True, "dist": False, "rank": 0, "world_size": 1,
        "hook_names": arch["hook_names"], "init_size": gt,
        "network_g": dict(arch["network_g"]),
        "network_dc": dict(arch["network_dc"]),
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
    net_g, net_dc = model.net_g, model.net_dc
    hook_names = model.hook_names
    cri_pix, cri_cls = model.cri_pixel, model.cri_classify

    pg = jax.device_put(model.params_g, accel)
    pdc = jax.device_put(model.params_dc, accel)
    og = jax.device_put(model.opt_state_g, accel)
    odc = jax.device_put(model.opt_state_dc, accel)
    rng = np.random.default_rng(0)
    lq = jax.device_put(jnp.asarray(rng.random((bs, gt, gt, 3), dtype=np.float32)), accel)
    gti = jax.device_put(jnp.asarray(rng.random((bs, gt, gt, 3), dtype=np.float32)), accel)
    idx = jax.device_put(jnp.asarray(rng.integers(0, 5, bs), dtype=jnp.int32), accel)
    lr = jnp.float32(1e-4)
    dt = jnp.bfloat16 if args.mixed else jnp.float32
    cast = lambda tree: jax.tree_util.tree_map(lambda a: a.astype(dt), tree)  # noqa: E731

    results = {}
    print(f"DCPT train-step profile [{args.arch}] bs={bs} @{gt}px {'mixed' if args.mixed else 'fp32'}", flush=True)

    # NOTE: params must be jit ARGUMENTS, not closure captures — captured
    # arrays become inline constants and blow the axon remote-compile body
    # limit (HTTP 413) at 68M params.

    # --- A: full forward on GT ---
    @jax.jit
    def fwd_full(p, x):
        out, _ = net_g.apply({"params": cast(p)}, x.astype(dt))
        return out.astype(jnp.float32)

    results["A_fwd_full_ms"] = chain_time(lambda x: fwd_full(pg, x), gti, args.iters, "A net_g full fwd (gt)")
    results["A_gflops"] = flops_of(fwd_full, pg, gti) / 1e9

    # --- B: skip_tail forward on LQ (returns last tap to chain) ---
    @jax.jit
    def fwd_hook(p, x):
        _, taps = net_g.apply({"params": cast(p)}, x.astype(dt), skip_tail=True)
        feats = select_taps(taps, hook_names)
        # chainable x-shaped output that depends on every tap (arch-generic)
        dep = sum(jnp.mean(f).astype(jnp.float32) for f in feats)
        return x + dep * 0

    results["B_fwd_hook_ms"] = chain_time(lambda x: fwd_hook(pg, x), lq, args.iters, "B net_g skip_tail fwd (lq)")

    # --- C: classifier forward (features recomputed once, static) ---
    # select INSIDE the jit: a taps dict crossing a jit boundary is re-sorted
    # alphabetically by key (jax dict-pytree semantics), which scrambles the
    # execution-order selection for Restormer (decoder_level3 runs first but
    # sorts last) — a list return preserves order
    hook_feats = jax.jit(lambda p, x: select_taps(
        net_g.apply({"params": p}, x, skip_tail=True)[1], hook_names)[::-1])
    feats0 = [jax.lax.stop_gradient(f) for f in hook_feats(pg, lq)]

    @jax.jit
    def fwd_dc(p, feats, x):
        logits = net_dc.apply({"params": cast(p)}, x.astype(dt), [cast(f) for f in feats])
        return x + jnp.mean(logits).astype(jnp.float32) * 0

    results["C_fwd_dc_ms"] = chain_time(lambda x: fwd_dc(pdc, feats0, x), lq, args.iters, "C net_dc fwd")
    del feats0, hook_feats

    # --- F early (before grad buffers exist — HBM headroom) ---
    def full_step(state):
        a, b, c_, d = state
        a, b, c_, d, _ = model._train_step(a, b, c_, d, lq, gti, idx, lr, lr)
        return (a, b, c_, d)

    state = jax.tree_util.tree_map(lambda x: x + 0 if hasattr(x, "dtype") else x, (pg, pdc, og, odc))
    results["F_full_step_ms"] = chain_time(full_step, state, args.iters, "F full fused step")
    del state

    # --- D: combined value_and_grad (no optimizer) ---
    def loss_fn(pg_, pdc_, lq_, gt_):
        pgc, pdcc = cast(pg_), cast(pdc_)
        pix_out, _ = net_g.apply({"params": pgc}, gt_.astype(dt))
        l_pix = cri_pix(pix_out.astype(jnp.float32), gt_)
        _, taps = net_g.apply({"params": pgc}, lq_.astype(dt), skip_tail=True)
        feats = select_taps(taps, hook_names)[::-1]
        logits = net_dc.apply({"params": pdcc}, lq_.astype(dt), feats)
        return l_pix + cri_cls(logits.astype(jnp.float32), idx)

    grad_fn = jax.jit(lambda pg_, pdc_, lq_, gt_: jax.grad(loss_fn, argnums=(0, 1))(pg_, pdc_, lq_, gt_))
    results["D_grad_ms"] = chain_time(
        lambda s: (grad_fn(s[0], pdc, lq, gti)[0], ), (pg,), args.iters, "D value_and_grad(total)")
    results["D_gflops"] = flops_of(grad_fn, pg, pdc, lq, gti) / 1e9

    # --- D2: backward of net_g ALONE (cliff probe: grouped-dwconv backward) ---
    g_only = jax.jit(lambda p, x: jax.grad(
        lambda p_: jnp.mean(jnp.abs(net_g.apply({"params": cast(p_)}, x.astype(dt))[0].astype(jnp.float32))))(p))
    results["D2_grad_g_ms"] = chain_time(lambda s: (g_only(s[0], gti),), (pg,), args.iters, "D2 grad(net_g full alone)")
    results["D2_gflops"] = flops_of(g_only, pg, gti) / 1e9

    # --- E: optimizer update alone (grads precomputed, donated-free) ---
    gg, _gdc = grad_fn(pg, pdc, lq, gti)

    @jax.jit
    def opt_step(g, o, p):
        up, _ = model.optimizer_g.update(g, o, p)
        import optax

        return optax.apply_updates(p, jax.tree_util.tree_map(lambda u: -lr * u, up))

    results["E_opt_ms"] = chain_time(lambda p: opt_step(gg, og, p), pg, args.iters, "E optimizer_g update+apply")

    del gg

    mpix = bs * gt * gt / 1e6 / results["F_full_step_ms"]
    print(f"\n  full step: {mpix:.2f} MPix/s;  D grad covers "
          f"{100 * results['D_grad_ms'] / results['F_full_step_ms']:.0f}% of the step", flush=True)
    if results.get("D_gflops"):
        print(f"  grad achieved TFLOPS: {results['D_gflops'] / results['D_grad_ms'] / 1e3:.1f}"
              f"  (fwd A: {results['A_gflops'] / results['A_fwd_full_ms'] / 1e3:.1f})", flush=True)
    print(json.dumps({k: (round(v * 1e3, 2) if k.endswith("_ms") else round(v, 1)) for k, v in results.items()}))


if __name__ == "__main__":
    main()
