"""SwinIR bf16 A/B on the real chip (VERDICT r2 item 4).

Three contenders on the verbatim test_SwinIR_5d network, min-of-interleaved
passes (the PARITY methodology):

  1. XLA bf16              (round-2's best bf16 path)
  2. Pallas-kernel bf16    (round-3 kernel: bf16 HBM I/O, fp32 VMEM math)
  3. Pallas-kernel fp32    (the shipped fp32 default, for reference)

Run: DCPT_TPU_SWIN_BF16=1 python scripts/bench_swin_bf16.py [--bs 4] [--size 128]
(the env var routes bf16 through the kernel; the script A/Bs against XLA by
toggling the pallas mode, so one process measures all three).
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

    assert swinir_arch._SWIN_BF16_KERNEL, "set DCPT_TPU_SWIN_BF16=1 before import"

    cpu = jax.devices("cpu")[0]
    accel = jax.devices()[0]
    rng = np.random.default_rng(0)
    bs, size = args.bs, args.size

    net = build_network({
        "type": "SwinIR", "embed_dim": 180, "depths": [6] * 6, "num_heads": [6] * 6,
        "mlp_ratio": 2.0, "window_size": 8, "upscale": 1,
    })
    with jax.default_device(cpu):
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))["params"]

    cases = {}  # name -> (mode, dtype)
    for name, (mode, dtype) in {
        "xla_bf16": ("off", jnp.bfloat16),
        "pallas_bf16": ("auto", jnp.bfloat16),
        "pallas_fp32": ("auto", jnp.float32),
    }.items():
        p = jax.device_put(jax.tree.map(lambda a: a.astype(dtype), params), accel)
        x = jax.device_put(jnp.asarray(rng.random((bs, size, size, 3), dtype=np.float32), dtype=dtype), accel)
        enable_pallas(mode)
        f = jax.jit(lambda p, x, _n=net, _d=dtype: _n.apply({"params": p}, x)[0].astype(_d))
        t0 = time.perf_counter()
        np.asarray(f(p, x)[0, 0, 0, 0])  # trace+compile under this mode
        print(f"{name}: compiled+warm in {time.perf_counter() - t0:.1f}s", flush=True)
        cases[name] = (f, p, x)
    enable_pallas("off")

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
