"""Depthwise-conv roofline: grouped (VPU) vs masked-dense (MXU) 3×3 convs at
every DCPT NAFNet stage geometry (VERDICT r3 item 5).

The DCPT mixed train-step profile blames the NAFBlocks' grouped depthwise
convs: XLA lowers feature_group_count=C convs to the VPU (9 shifted
multiply-adds per map), while the MXU sits idle.  A depthwise conv can be
reformulated as a DENSE 3×3 conv whose (3,3,C,C) kernel is the depthwise
weights scattered onto the channel diagonal — C× more FLOPs, but on the MXU.
At bf16 the v5e MXU:VPU rate ratio is ~50×, so the dense form could win for
C ≲ 50 and must lose for the deep stages … unless XLA's grouped lowering is
far off VPU peak.  This script measures instead of guessing:

for each NAFBlock dwconv geometry (channels 2C after the 1×1 expand, at the
stage's resolution, bs16 — the bench train-step shapes):
  * grouped dwconv: forward and forward+backward (input+weight grads),
  * masked-dense:   same, weights scattered fresh each call (the train-path
    cost: the scatter is differentiated through, grads land on the diagonal),
both fp32 and bf16, chained-dependency timing.

Prints one JSON line per geometry and a summary; results go to PARITY.md's
roofline table either way (ship the winner, or close the question).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (dw_channels, spatial) of every NAFBlock dwconv in the flagship DCPT step:
# width-64 enc [1,1,1,28] @128px → stages 64@128,128@64,256@32,512@16, middle
# 1024@8; dwconv runs at 2C after the expand.
GEOMS = [(128, 128), (256, 64), (512, 32), (1024, 16), (2048, 8)]
BS = 16
ITERS = 20


def dw_grouped(x, w, b):
    import jax

    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    ) + b


def dw_masked_dense(x, w, b):
    """Depthwise weights (3,3,1,C) scattered onto the (3,3,C,C) diagonal, then
    a dense conv — the MXU form.  The scatter is traced/differentiated, so
    weight grads land back on the diagonal automatically."""
    import jax
    import jax.numpy as jnp

    c = x.shape[-1]
    eye = jnp.eye(c, dtype=w.dtype)
    wd = w.reshape(3, 3, 1, c) * eye.reshape(1, 1, c, c)
    return jax.lax.conv_general_dilated(
        x, wd, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    accel = jax.devices()[0]
    rng = np.random.default_rng(0)

    def timeit(f, *args):
        y = f(*args)
        first = y[0] if isinstance(y, tuple) else y
        np.asarray(jax.tree_util.tree_leaves(first)[0]).ravel()[0]  # compile+warm
        t0 = time.perf_counter()
        x = args[0]
        for _ in range(ITERS):
            y = f(x, *args[1:])
            x = (y[0] if isinstance(y, tuple) else y).astype(x.dtype)  # chain
        np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]
        return (time.perf_counter() - t0) / ITERS

    results = {}
    for c, hw in GEOMS:
        for dtype, tag in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
            x = jax.device_put(jnp.asarray(rng.random((BS, hw, hw, c), np.float32), dtype), accel)
            w = jax.device_put(jnp.asarray(rng.random((3, 3, 1, c), np.float32) * 0.1, dtype), accel)
            b = jax.device_put(jnp.asarray(rng.random(c, np.float32) * 0.1, dtype), accel)
            row = {}
            for name, fn in (("grouped", dw_grouped), ("dense", dw_masked_dense)):
                fwd = jax.jit(fn)

                def fwd_bwd(x, w, b, _fn=fn):
                    out, vjp = jax.vjp(_fn, x, w, b)
                    dx, dw_, db = vjp(out)
                    return dx, dw_, db

                fb = jax.jit(fwd_bwd)
                row[f"{name}_fwd_ms"] = round(timeit(fwd, x, w, b) * 1e3, 3)
                row[f"{name}_fwdbwd_ms"] = round(timeit(fb, x, w, b) * 1e3, 3)
            # useful depthwise FLOPs (dense does c× more, all waste)
            gflop = 2 * BS * hw * hw * c * 9 / 1e9
            row["useful_gflop"] = round(gflop, 3)
            row["grouped_fwd_tflops"] = round(gflop / row["grouped_fwd_ms"], 2)
            row["dense_fwd_tflops_useful"] = round(gflop / row["dense_fwd_ms"], 2)
            key = f"c{c}_hw{hw}_{tag}"
            results[key] = row
            print(json.dumps({key: row}), flush=True)
    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
