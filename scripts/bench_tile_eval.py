"""Eval-surface A/B: whole-image XLA vs 128px-tile inference with the MDTA
whole-block kernel firing (VERDICT r3 item 2; REDONE round 5 per VERDICT r4
item 6 with the dispatch-amortized methodology).

The round-3 2.0×/1.6× Restormer/PromptIR kernel win lives at 128px-class
geometries, but the shipped 5D eval runs whole images (e.g. padded Rain100L
488×328) where the kernel is gated OFF (PARITY "MDTA big-shape A/B").  This
script measures, on the real TPU at the real eval geometry:

  * whole-image XLA (the current shipped path),
  * the device-resident tiler (infer_size=128, tile_pad=16 — all tile dims
    stay multiples of 8 so the kernel's row-tile gate fires) with the kernel
    ON and OFF,

with ``--iters`` chained applications SCANNED INSIDE ONE JIT DISPATCH per
leg (the bench.py train-section methodology): the round-4 measurement ran
one Python dispatch per forward and the degraded tunnel's 0.5–12 s
per-dispatch overhead made *whole-image* eval measure 0.013 MPix/s — 110×
below the same leg's round-3 number — so the 3.3× "tiling loses" was pure
dispatch pathology (VERDICT r4 weak #6).  Legs are timed interleaved and the
per-leg MIN is kept (tunnel variance rules).

Numerics: PSNR / max|Δ| of the tiled output vs the whole-image output of the
SAME network, at seeded random init (no trained 5D checkpoint in this
environment; recorded as such in PARITY.md).

Usage: python scripts/bench_tile_eval.py [--iters 8] [--reps 2]
Prints one JSON line per arch plus a summary line.
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


def build_leg(model, x, mode, tiled, iters):
    """Trace the per-image program UNDER ``mode``, then wrap ``iters`` chained
    applications in one scanned jit program (dispatch amortization).  Returns
    (scanned_fn_with_args_bound, single_apply_output)."""
    import jax
    import jax.numpy as jnp

    from dcpt_tpu.ops import enable_pallas

    model._apply_cache.clear()  # pallas mode is baked at trace time
    enable_pallas(mode)
    try:
        model.lq = jnp.asarray(x)
        if tiled:
            model.test_tile()
            inner = next(f for k, f in model._apply_cache.items()
                         if isinstance(k, tuple) and k[0] == "tile")
        else:
            model.test()
            inner = model._apply_cache["fwd"]
        params = model._infer_params()
        out0 = np.asarray(model.output)

        @jax.jit
        def loop(p, x0):
            def body(y, _):
                # clip keeps the chained inputs bounded through a random-init net
                return jnp.clip(inner(p, y), 0, 1).astype(jnp.float32), None
            y, _ = jax.lax.scan(body, x0, None, length=iters)
            return y

        x_dev = model.lq

        def run():
            np.asarray(loop(params, x_dev)[0, 0, 0, 0])

        run()  # compile + warm the scanned program itself
    finally:
        enable_pallas("auto")
    return run, out0


def psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return float("inf") if mse == 0 else 10.0 * np.log10(1.0 / mse)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
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
        legs, outs = {}, {}
        for leg, (mode, tiled) in (("whole_xla", ("off", False)),
                                   ("tile_xla", ("off", True)),
                                   ("tile_kernel", ("auto", True))):
            print(f"# {name}: building {leg}", file=sys.stderr, flush=True)
            legs[leg], outs[leg] = build_leg(model, x, mode, tiled, args.iters)

        best = {leg: float("inf") for leg in legs}
        for _ in range(args.reps):
            for leg, run in legs.items():  # interleaved min across reps
                t0 = time.perf_counter()
                run()
                best[leg] = min(best[leg], (time.perf_counter() - t0) / args.iters)

        row = {f"{leg}_mpix_s": round(mpix / dt, 3) for leg, dt in best.items()}
        row["tile_vs_whole_psnr_db"] = round(psnr(outs["tile_xla"], outs["whole_xla"]), 2)
        row["tile_vs_whole_maxabs"] = float(np.max(np.abs(outs["tile_xla"] - outs["whole_xla"])))
        row["kernel_vs_xla_tile_maxabs"] = float(np.max(np.abs(outs["tile_kernel"] - outs["tile_xla"])))
        row["tile_kernel_vs_whole_xla_speedup"] = round(
            row["tile_kernel_mpix_s"] / row["whole_xla_mpix_s"], 3)
        results[name] = row
        print(json.dumps({name: row}), flush=True)

    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
