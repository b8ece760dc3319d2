"""SwinIR kernel A/B matrix on the real chip (VERDICT r2 item 4 + v3).

Contenders on the verbatim test_SwinIR_5d network, min-of-interleaved passes
(the PARITY methodology):

  1. xla_bf16      (round-2's best bf16 path)
  2. attn_bf16     (v2 attention kernel: bf16 HBM I/O, fp32 VMEM math)
  3. attn_fp32     (the shipped fp32 default)
  4. block_fp32    (v3 whole-block kernel: attn + residuals + MLP, one pass)
  5. block_bf16    (v3 with bf16 I/O)

Run: python scripts/bench_swin_bf16.py [--bs 4] [--size 128]
(the script toggles the module gates itself, so one process measures all).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
os.environ.setdefault("DCPT_TPU_SWIN_BF16", "1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dcpt_tpu.archs import build_network
    from dcpt_tpu.archs import swinir_arch
    from dcpt_tpu.ops import enable_pallas

    swinir_arch._SWIN_BF16_KERNEL = True

    cpu = jax.devices("cpu")[0]
    accel = jax.devices()[0]
    rng = np.random.default_rng(0)
    bs, size = args.bs, args.size

    net = build_network({
        "type": "SwinIR", "embed_dim": 180, "depths": [6] * 6, "num_heads": [6] * 6,
        "mlp_ratio": 2.0, "window_size": 8, "upscale": 1,
    })
    enable_pallas("off")  # init must not trace kernels for the CPU device
    with jax.default_device(cpu):
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))["params"]

    cases = {}  # name -> (mode, dtype, block_kernel)
    for name, (mode, dtype, block) in {
        "xla_bf16": ("off", jnp.bfloat16, False),
        "attn_bf16": ("auto", jnp.bfloat16, False),
        "attn_fp32": ("auto", jnp.float32, False),
        "block_fp32": ("auto", jnp.float32, True),
        "block_bf16": ("auto", jnp.bfloat16, True),
    }.items():
        p = jax.device_put(jax.tree.map(lambda a: a.astype(dtype), params), accel)
        x = jax.device_put(jnp.asarray(rng.random((bs, size, size, 3), dtype=np.float32), dtype=dtype), accel)
        enable_pallas(mode)
        swinir_arch._SWIN_BLOCK_KERNEL = block
        f = jax.jit(lambda p, x, _n=net, _d=dtype: _n.apply({"params": p}, x)[0].astype(_d))
        t0 = time.perf_counter()
        np.asarray(f(p, x)[0, 0, 0, 0])  # trace+compile under this mode
        print(f"{name}: compiled+warm in {time.perf_counter() - t0:.1f}s", flush=True)
        cases[name] = (f, p, x)
    enable_pallas("off")
    swinir_arch._SWIN_BLOCK_KERNEL = False

    best = {name: float("inf") for name in cases}
    for rep in range(args.reps):
        for name, (f, p, x) in cases.items():
            t0 = time.perf_counter()
            y = x
            for _ in range(args.iters):
                y = f(p, y)
            np.asarray(y[0, 0, 0, 0])
            dt = (time.perf_counter() - t0) / args.iters
            best[name] = min(best[name], dt)
    out = {name: {"ms": round(dt * 1e3, 2), "mpix_s": round(bs * size * size / 1e6 / dt, 3)}
           for name, dt in best.items()}
    for name, d in out.items():
        print(f"{name:<14s} {d['ms']:8.2f} ms  {d['mpix_s']:6.3f} MPix/s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
