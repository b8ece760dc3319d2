"""Whole-TransformerBlock kernel A/B at REAL eval geometries.

The round-3 column-slab extension exists so the kernel fires beyond the
128px bench shapes: padded Rain100L/BSD68 whole images (488×328, full-width
rule at th=4) and 384px inference tiles (column slabs at level 1).
Min-of-interleaved passes on the shipped Restormer 5D config.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    import os

    import jax
    import jax.numpy as jnp

    os.environ["DCPT_TPU_MDTA_SLABS"] = "1"  # A/B the opt-in slab shapes
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dcpt_tpu.archs import build_network, restormer_arch
    from dcpt_tpu.ops import enable_pallas

    cpu = jax.devices("cpu")[0]
    accel = jax.devices()[0]
    rng = np.random.default_rng(0)

    net = build_network({"type": "Restormer", "dim": 48, "num_blocks": [4, 6, 6, 8],
                         "num_refinement_blocks": 4, "heads": [1, 2, 4, 8],
                         "ffn_expansion_factor": 2.66, "bias": False,
                         "LayerNorm_type": "BiasFree"})
    enable_pallas("off")
    with jax.default_device(cpu):
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]

    cases = {}
    for name, (kern, h, w, bs, dtype) in {
        "xla_488x328_fp32_bs1": (False, 488, 328, 1, jnp.float32),
        "mdta_488x328_fp32_bs1": (True, 488, 328, 1, jnp.float32),
        "xla_384_fp32_bs2": (False, 384, 384, 2, jnp.float32),
        "mdta_384_fp32_bs2": (True, 384, 384, 2, jnp.float32),
        "xla_488x328_bf16_bs1": (False, 488, 328, 1, jnp.bfloat16),
        "mdta_488x328_bf16_bs1": (True, 488, 328, 1, jnp.bfloat16),
        "xla_256_fp32_bs2": (False, 256, 256, 2, jnp.float32),
        "mdta_256_fp32_bs2": (True, 256, 256, 2, jnp.float32),
        "xla_256_bf16_bs2": (False, 256, 256, 2, jnp.bfloat16),
        "mdta_256_bf16_bs2": (True, 256, 256, 2, jnp.bfloat16),
    }.items():
        p = jax.device_put(jax.tree.map(lambda a: a.astype(dtype), params), accel)
        x = jax.device_put(jnp.asarray(rng.random((bs, h, w, 3), dtype=np.float32), dtype=dtype), accel)
        restormer_arch._MDTA_BLOCK_ENV = "1" if kern else "0"
        restormer_arch._MDTA_BLOCK_KERNEL = kern
        enable_pallas("auto" if kern else "off")
        f = jax.jit(lambda p, x, _n=net, _d=dtype: _n.apply({"params": p}, x)[0].astype(_d))
        t0 = time.perf_counter()
        np.asarray(f(p, x)[0, 0, 0, 0])
        print(f"{name}: compiled+warm in {time.perf_counter() - t0:.1f}s", flush=True)
        cases[name] = (f, p, x, bs * h * w)
    restormer_arch._MDTA_BLOCK_ENV = "auto"
    restormer_arch._MDTA_BLOCK_KERNEL = True
    enable_pallas("off")

    best = {name: float("inf") for name in cases}
    for _ in range(3):
        for name, (f, p, x, _) in cases.items():
            t0 = time.perf_counter()
            y = x
            for _ in range(6):
                y = f(p, y)
            np.asarray(y[0, 0, 0, 0])
            best[name] = min(best[name], (time.perf_counter() - t0) / 6)
    out = {n: {"ms": round(dt * 1e3, 2), "mpix_s": round(cases[n][3] / 1e6 / dt, 3)}
           for n, dt in best.items()}
    for n, d in out.items():
        print(f"{n:<26s} {d['ms']:8.2f} ms  {d['mpix_s']:7.3f} MPix/s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
