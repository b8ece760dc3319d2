"""NAFNet whole-block kernel A/B on the real chip (the roofline lever).

Cases on the flagship NAFNet-w64 @128px, min-of-interleaved passes:
  xla_bf16 / xla_fp32            — the pure XLA paths
  v1*/v2* bf16/fp32              — the two-phase fused NAFBlock (v1:
                                   overlap-copy + g spill; v2: halo-pairs +
                                   recompute-prefix) at all stages (maxc
                                   4096) / shallow-only (maxc 256)
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dcpt_tpu.archs import build_network, nafnet_arch
    from dcpt_tpu.ops import enable_pallas

    cpu = jax.devices("cpu")[0]
    accel = jax.devices()[0]
    rng = np.random.default_rng(0)
    size = 128

    net = build_network({"type": "NAFNetBaseline", "width": 64, "enc_blk_nums": [1, 1, 1, 28],
                         "middle_blk_num": 1, "dec_blk_nums": [1, 1, 1, 1], "window_size": 16})
    enable_pallas("off")
    with jax.default_device(cpu):
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))["params"]

    from dcpt_tpu.ops import naf_block as nb

    cases = {}
    for name, (flag, maxc, variant, dtype, bs) in {
        "xla_bf16_bs32": (False, 0, "v2", jnp.bfloat16, 32),
        "v2all_bf16_bs32": (True, 4096, "v2", jnp.bfloat16, 32),
        "v2shallow_bf16_bs32": (True, 256, "v2", jnp.bfloat16, 32),
        "xla_fp32_bs16": (False, 0, "v2", jnp.float32, 16),
        "v1all_fp32_bs16": (True, 4096, "v1", jnp.float32, 16),
        "v2all_fp32_bs16": (True, 4096, "v2", jnp.float32, 16),
    }.items():
        p = jax.device_put(jax.tree.map(lambda a: a.astype(dtype), params), accel)
        x = jax.device_put(jnp.asarray(rng.random((bs, size, size, 3), dtype=np.float32), dtype=dtype), accel)
        nafnet_arch._NAF_BLOCK_KERNEL = flag
        nafnet_arch._NAF_BLOCK_MAXC = maxc
        nb._VARIANT = variant
        enable_pallas("auto" if flag else "off")
        f = jax.jit(lambda p, x, _n=net, _d=dtype: _n.apply({"params": p}, x)[0].astype(_d))
        t0 = time.perf_counter()
        np.asarray(f(p, x)[0, 0, 0, 0])
        print(f"{name}: compiled+warm in {time.perf_counter() - t0:.1f}s", flush=True)
        cases[name] = (f, p, x, bs)
    enable_pallas("off")
    nafnet_arch._NAF_BLOCK_KERNEL = True
    nafnet_arch._NAF_BLOCK_MAXC = 0
    nb._VARIANT = "v2"

    best = {name: float("inf") for name in cases}
    for _ in range(3):
        for name, (f, p, x, bs) in cases.items():
            t0 = time.perf_counter()
            y = x
            for _ in range(8):
                y = f(p, y)
            np.asarray(y[0, 0, 0, 0])
            best[name] = min(best[name], (time.perf_counter() - t0) / 8)
    out = {n: {"ms": round(dt * 1e3, 2), "mpix_s": round(cases[n][3] * size * size / 1e6 / dt, 3)}
           for n, dt in best.items()}
    for n, d in out.items():
        print(f"{n:<24s} {d['ms']:8.2f} ms  {d['mpix_s']:7.3f} MPix/s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
