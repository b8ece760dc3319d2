"""Whole-TransformerBlock (MDTA+GDFN) kernel A/B on the real chip.

Cases on the shipped 5D configs @128px, min-of-interleaved passes:
  rest_xla_*  / rest_mdta_*    — Restormer (BiasFree, ReLU attention)
  prompt_xla_* / prompt_mdta_* — PromptIR (WithBias LN, softmax attention)
in fp32 bs8 and bf16 bs8 (the two driver-bench legs).
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

    from dcpt_tpu.archs import build_network, restormer_arch
    from dcpt_tpu.ops import enable_pallas

    cpu = jax.devices("cpu")[0]
    accel = jax.devices()[0]
    rng = np.random.default_rng(0)
    size = 128

    nets, params0 = {}, {}
    for key, opt in {
        "rest": {"type": "Restormer", "dim": 48, "num_blocks": [4, 6, 6, 8],
                 "num_refinement_blocks": 4, "heads": [1, 2, 4, 8],
                 "ffn_expansion_factor": 2.66, "bias": False,
                 "LayerNorm_type": "BiasFree"},
        "prompt": {"type": "PromptIR"},
    }.items():
        net = build_network(dict(opt))
        enable_pallas("off")
        with jax.default_device(cpu):
            params0[key] = net.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))["params"]
        nets[key] = net

    cases = {}
    for name, (arch, kern, dtype, bs) in {
        "rest_xla_fp32_bs8": ("rest", False, jnp.float32, 8),
        "rest_mdta_fp32_bs8": ("rest", True, jnp.float32, 8),
        "rest_xla_bf16_bs8": ("rest", False, jnp.bfloat16, 8),
        "rest_mdta_bf16_bs8": ("rest", True, jnp.bfloat16, 8),
        "prompt_xla_fp32_bs8": ("prompt", False, jnp.float32, 8),
        "prompt_mdta_fp32_bs8": ("prompt", True, jnp.float32, 8),
        "prompt_xla_bf16_bs8": ("prompt", False, jnp.bfloat16, 8),
        "prompt_mdta_bf16_bs8": ("prompt", True, jnp.bfloat16, 8),
        "rest_xla_fp32_bs1": ("rest", False, jnp.float32, 1),
        "rest_mdta_fp32_bs1": ("rest", True, jnp.float32, 1),
        "prompt_xla_fp32_bs1": ("prompt", False, jnp.float32, 1),
        "prompt_mdta_fp32_bs1": ("prompt", True, jnp.float32, 1),
    }.items():
        net = nets[arch]
        p = jax.device_put(jax.tree.map(lambda a: a.astype(dtype), params0[arch]), accel)
        x = jax.device_put(jnp.asarray(rng.random((bs, size, size, 3), dtype=np.float32), dtype=dtype), accel)
        restormer_arch._MDTA_BLOCK_ENV = "1" if kern else "0"
        restormer_arch._MDTA_BLOCK_KERNEL = kern
        enable_pallas("auto" if kern else "off")
        f = jax.jit(lambda p, x, _n=net, _d=dtype: _n.apply({"params": p}, x)[0].astype(_d))
        t0 = time.perf_counter()
        np.asarray(f(p, x)[0, 0, 0, 0])
        print(f"{name}: compiled+warm in {time.perf_counter() - t0:.1f}s", flush=True)
        cases[name] = (f, p, x, bs, kern)
    restormer_arch._MDTA_BLOCK_ENV = "auto"
    restormer_arch._MDTA_BLOCK_KERNEL = True

    best = {name: float("inf") for name in cases}
    for _ in range(3):
        for name, (f, p, x, bs, kern) in cases.items():
            restormer_arch._MDTA_BLOCK_ENV = "1" if kern else "0"
            restormer_arch._MDTA_BLOCK_KERNEL = kern
            enable_pallas("auto" if kern else "off")
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
