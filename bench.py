"""Benchmark: flagship DCPT-NAFNet (width 64, enc [1,1,1,28]) inference
throughput on one chip, reported as Megapixels/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no throughput numbers (BASELINE.md) — the baseline
here is our own v5e target of 4.0 MPix/s/chip for this config; vs_baseline > 1
beats it.
"""

from __future__ import annotations

import json
import time

import numpy as np

# Round-1 measurement on v5e established 129 MPix/s/chip (≈128 GFLOPs/forward,
# effectively MXU-saturated); baseline pinned at 100 so vs_baseline tracks
# regressions/improvements against the established number.
BASELINE_MPIX_PER_S = 100.0
SIZE = 256
ITERS = 10


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dcpt_tpu.archs import build_network

    net = build_network(
        {
            "type": "NAFNetBaseline",
            "width": 64,
            "enc_blk_nums": [1, 1, 1, 28],
            "middle_blk_num": 1,
            "dec_blk_nums": [1, 1, 1, 1],
            "window_size": 16,
        }
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, SIZE, SIZE, 3), dtype=np.float32))
    params = net.init(jax.random.PRNGKey(0), x)["params"]

    @jax.jit
    def forward(p, x):
        out, _ = net.apply({"params": p}, x)
        return out

    # compile + warm up
    forward(params, x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = forward(params, x)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS

    mpix = SIZE * SIZE / 1e6 / dt
    print(
        json.dumps(
            {
                "metric": "nafnet_w64_256px_inference_throughput",
                "value": round(mpix, 3),
                "unit": "Megapixels/sec/chip",
                "vs_baseline": round(mpix / BASELINE_MPIX_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
