"""On-TPU numeric parity of the DEFAULT (kernel) inference paths vs pure XLA.

The kernels' interpret-mode twins are bit-verified in the suite, but Mosaic
compiles real silicon code — this script runs every default-on fused path on
the actual chip against `enable_pallas("off")` on identical inputs and fails
loudly on divergence.  Run after any kernel change once the accelerator is
reachable (the channel-chunked MDTA path in particular must be validated on
silicon, not only in interpret mode).

    python scripts/check_kernels_tpu.py        # exits 1 on any mismatch
"""

from __future__ import annotations

import sys

import numpy as np

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CASES = [
    # (name, network_g opt, size, bs, dtype name, atol)
    ("nafnet_fp32", {"type": "NAFNetBaseline", "width": 64, "enc_blk_nums": [1, 1, 1, 28],
                     "middle_blk_num": 1, "dec_blk_nums": [1, 1, 1, 1]}, 128, 2, "float32", 3e-4),
    ("restormer_fp32", {"type": "Restormer"}, 128, 2, "float32", 3e-4),
    ("restormer_bf16", {"type": "Restormer"}, 128, 2, "bfloat16", 3e-2),
    ("promptir_fp32", {"type": "PromptIR"}, 128, 2, "float32", 3e-4),
    ("promptir_bf16", {"type": "PromptIR"}, 128, 2, "bfloat16", 3e-2),
    ("swinir_fp32", {"type": "SwinIR", "upscale": 1, "img_size": 64, "window_size": 8,
                     "depths": [6, 6, 6, 6, 6, 6], "embed_dim": 180, "num_heads": [6, 6, 6, 6, 6, 6],
                     "mlp_ratio": 2, "upsampler": "", "resi_connection": "1conv"}, 128, 1, "float32", 3e-4),
    ("swinir_bf16", {"type": "SwinIR", "upscale": 1, "img_size": 64, "window_size": 8,
                     "depths": [6, 6, 6, 6, 6, 6], "embed_dim": 180, "num_heads": [6, 6, 6, 6, 6, 6],
                     "mlp_ratio": 2, "upsampler": "", "resi_connection": "1conv"}, 128, 1, "bfloat16", 3e-2),
]


def main() -> int:
    import jax
    import jax.numpy as jnp

    from dcpt_tpu.archs import build_network
    from dcpt_tpu.ops import enable_pallas

    cpu = jax.devices("cpu")[0]
    accel = jax.devices()[0]
    print(f"device: {accel}", flush=True)
    rng = np.random.default_rng(0)
    failures = 0

    for name, net_opt, size, bs, dtype_name, atol in CASES:
        dtype = jnp.dtype(dtype_name)
        net = build_network(dict(net_opt))
        with jax.default_device(cpu):
            params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))["params"]
        p = jax.device_put(jax.tree.map(lambda a: a.astype(dtype), params), accel)
        x = jax.device_put(jnp.asarray(rng.random((bs, size, size, 3), np.float32), dtype), accel)
        outs = {}
        for mode in ("off", "auto"):
            enable_pallas(mode)
            try:
                f = jax.jit(lambda p, x, _n=net: _n.apply({"params": p}, x)[0])
                outs[mode] = np.asarray(f(p, x), np.float32)
            except Exception as e:  # noqa: BLE001
                print(f"FAIL {name} [{mode}]: {type(e).__name__}: {str(e)[:300]}", flush=True)
                failures += 1
                outs = None
                break
            finally:
                enable_pallas("off")
        if not outs:
            continue
        diff = float(np.max(np.abs(outs["auto"] - outs["off"])))
        status = "ok" if diff <= atol else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{status:4s} {name:16s} max|kernel-xla| = {diff:.3e} (atol {atol:g})", flush=True)

    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
