"""Eval-surface A/B: whole-image XLA vs 128px-tile inference with the MDTA
whole-block kernel firing (VERDICT r3 item 2).

The round-3 2.0×/1.6× Restormer/PromptIR kernel win lives at 128px-class
geometries, but the shipped 5D eval runs whole images (e.g. padded Rain100L
488×328) where the kernel is gated OFF (PARITY "MDTA big-shape A/B").  This
script measures, on the real TPU at the real eval geometry:

  * whole-image XLA (the current shipped path),
  * ``test_tile`` (infer_size=128, tile_pad=16 — all tile dims stay multiples
    of 8 so the kernel's row-tile gate fires) with the kernel ON and OFF,

wall-clock (chained-dependency timing; tunnel rules) AND the numeric cost of
tiling: PSNR / max|Δ| of the tiled output vs the whole-image output of the
SAME network.  NOTE the numeric proxy limitation: no trained 5D checkpoint is
available in this environment, so the tiling error is measured at seeded
random init — Restormer/PromptIR attention statistics are image-global, and
the tiled approximation error at trained weights may differ; recorded as such
in PARITY.md.

Usage: python scripts/bench_tile_eval.py [--iters 6]
Prints one JSON line per (arch, dtype) plus a summary verdict line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 488, 328  # padded Rain100L geometry (PARITY "MDTA big-shape A/B")
TILE = {"infer_size": 128, "tile_pad": 16, "chunk": 4}

RESTORMER = {
    "type": "Restormer", "inp_channels": 3, "out_channels": 3, "dim": 48,
    "num_blocks": [4, 6, 6, 8], "num_refinement_blocks": 4, "heads": [1, 2, 4, 8],
    "ffn_expansion_factor": 2.66, "bias": False, "LayerNorm_type": "BiasFree",
    "dual_pixel_task": False,
}
PROMPTIR = {"type": "PromptIR"}


def natural_image(rng, h, w):
    """Smooth-ish field + edges: closer to natural statistics than white noise
    so the tiling seams face realistic low-frequency content."""
    import cv2

    base = rng.random((h // 4, w // 4, 3)).astype(np.float32)
    img = cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
    img += 0.08 * rng.random((h, w, 3)).astype(np.float32)
    return np.clip(img, 0, 1)[None]


def build(arch_opt, accel, cpu):
    import jax

    from dcpt_tpu.models import build_model

    opt = {
        "name": "tile_ab", "model_type": "SRModel", "scale": 1, "num_gpu": 1,
        "manual_seed": 0, "is_train": False, "dist": False, "rank": 0, "world_size": 1,
        "network_g": dict(arch_opt), "init_size": 64, "path": {},
        "tile": dict(TILE),
        "val": {"metrics": {}},
    }
    with jax.default_device(cpu):
        model = build_model(opt)
    model.params_g = jax.device_put(model.params_g, accel)
    return model


def timed(model, x, mode, tiled, iters):
    """Chained-dependency timing of the shipped eval path under a pallas mode.

    The tile jit cache key ignores the pallas mode, so caches are cleared
    per mode; outputs feed the next iteration and a host materialization
    closes the chain (tunnel timing rules)."""
    import jax.numpy as jnp

    from dcpt_tpu.ops import enable_pallas

    model._apply_cache.clear()
    enable_pallas(mode)
    try:
        model.lq = jnp.asarray(x)
        run = model.test_tile if tiled else model.test
        run()
        np.asarray(model.output[0, 0, 0, 0])  # compile + warm
        out0 = np.asarray(model.output)
        t0 = time.perf_counter()
        for _ in range(iters):
            # clip keeps the chained inputs bounded through a random-init net
            model.lq = jnp.clip(model.output, 0, 1).astype(jnp.float32)
            run()
        np.asarray(model.output[0, 0, 0, 0])
        dt = (time.perf_counter() - t0) / iters
    finally:
        enable_pallas("off")
    return dt, out0


def psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return float("inf") if mse == 0 else 10.0 * np.log10(1.0 / mse)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    cpu = jax.devices("cpu")[0]
    accel = jax.devices()[0]
    rng = np.random.default_rng(0)
    x = natural_image(rng, H, W)
    mpix = H * W / 1e6

    results = {}
    for name, arch in (("restormer", RESTORMER), ("promptir", PROMPTIR)):
        model = build(arch, accel, cpu)
        row = {}
        print(f"# {name}: whole-image XLA", file=sys.stderr, flush=True)
        dt, out_whole = timed(model, x, "off", tiled=False, iters=args.iters)
        row["whole_xla_mpix_s"] = round(mpix / dt, 3)
        print(f"# {name}: tile XLA", file=sys.stderr, flush=True)
        dt, out_tile_xla = timed(model, x, "off", tiled=True, iters=args.iters)
        row["tile_xla_mpix_s"] = round(mpix / dt, 3)
        print(f"# {name}: tile kernel", file=sys.stderr, flush=True)
        dt, out_tile_k = timed(model, x, "auto", tiled=True, iters=args.iters)
        row["tile_kernel_mpix_s"] = round(mpix / dt, 3)

        row["tile_vs_whole_psnr_db"] = round(psnr(out_tile_xla, out_whole), 2)
        row["tile_vs_whole_maxabs"] = float(np.max(np.abs(out_tile_xla - out_whole)))
        row["kernel_vs_xla_tile_maxabs"] = float(np.max(np.abs(out_tile_k - out_tile_xla)))
        row["tile_kernel_vs_whole_xla_speedup"] = round(
            row["tile_kernel_mpix_s"] / row["whole_xla_mpix_s"], 3)
        results[name] = row
        print(json.dumps({name: row}), flush=True)

    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
