"""Feature dumps for KNN / t-SNE degradation-separability analysis.

Port of the reference's ``knn_gen.py`` (reference root), fixed by design: the
reference requires hand-editing the arch's forward to return 6 intermediate
tensors (knn_gen.py:56-57); our archs return explicit taps, so feature levels
are selected by tap name.  Kaiming-uniform(a=2) random init (knn_gen.py:86-95),
center-crop 128, pad to window multiple, 100 images per degradation dir.

Usage::

    python knn_gen.py --arch PromptIR --out knns/promptir \
        --data dehaze=/path/hazy deblur=/path/input ...
"""

from __future__ import annotations

import argparse
import math
import os

import cv2
import numpy as np

import jax

# honor JAX_PLATFORMS even where a sitecustomize pins another backend at
# import time (this env's axon shim) — the env-var route alone is overridden,
# and a dead remote backend otherwise hangs device init forever
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp

from dcpt_tpu.archs import build_network
from dcpt_tpu.data.transforms import center_crop

DEFAULT_ARCH = {
    "NAFNetBaseline": {"type": "NAFNetBaseline", "width": 32, "middle_blk_num": 12, "enc_blk_nums": [2, 4, 8], "dec_blk_nums": [2, 2, 2]},
    "PromptIR": {"type": "PromptIR"},
    "Restormer": {"type": "Restormer"},
    "SwinIR": {"type": "SwinIR"},
}


def kaiming_uniform_a2_init(params, rng):
    """Re-initialize conv/dense kernels with kaiming_uniform(a=2), zero biases
    (reference: knn_gen.py:86-95)."""
    leaves = []

    def reinit(path, x):
        nonlocal rng
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        rng, key = jax.random.split(rng)
        if name == "kernel":
            fan_in = int(np.prod(x.shape[:-1]))
            gain = math.sqrt(2.0 / (1 + 2**2))
            bound = math.sqrt(3.0) * gain / math.sqrt(fan_in)
            return jax.random.uniform(key, x.shape, x.dtype, -bound, bound)
        if name == "bias":
            return jnp.zeros_like(x)
        return x

    return jax.tree_util.tree_map_with_path(reinit, params)


def pre_test(img: jnp.ndarray, window_size: int = 8) -> jnp.ndarray:
    _, h, w, _ = img.shape
    mod_pad_h = (window_size - h % window_size) % window_size
    mod_pad_w = (window_size - w % window_size) % window_size
    return jnp.pad(img, ((0, 0), (0, mod_pad_h), (0, mod_pad_w), (0, 0)), mode="reflect")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--arch", default="PromptIR", choices=list(DEFAULT_ARCH))
    parser.add_argument("--out", default="knns/run")
    parser.add_argument("--data", nargs="+", required=True, help="name=/path pairs, label ids assigned in order (1-based)")
    parser.add_argument("--levels", type=int, default=6, help="number of feature levels to dump")
    parser.add_argument("--max-images", type=int, default=100)
    parser.add_argument("--window-size", type=int, default=8)
    args = parser.parse_args()

    net = build_network(dict(DEFAULT_ARCH[args.arch]))
    rng = jax.random.PRNGKey(0)
    params = net.init(rng, jnp.zeros((1, 128, 128, 3)))["params"]
    params = kaiming_uniform_a2_init(params, jax.random.PRNGKey(1))

    # Tap EXECUTION order, captured at trace time: a taps dict returned
    # through a jit boundary is re-sorted alphabetically by key (jax
    # dict-pytree semantics), which would scramble "first N levels" for any
    # arch whose module names don't sort in forward order (PromptIR's
    # decoder_level2.* sorts before every encoder tap).  The reference dumps
    # hook outputs in forward order (knn_gen.py:56-66), so capture the order
    # inside the trace and return an order-preserving LIST from the jit.
    tap_order: list[str] = []

    def _probe(p, x):
        _, taps = net.apply({"params": p}, x, skip_tail=True)
        tap_order.extend(taps.keys())
        return 0.0

    jax.eval_shape(_probe, params, jnp.zeros((1, 128, 128, 3)))

    @jax.jit
    def taps_fn(p, x):
        _, taps = net.apply({"params": p}, x, skip_tail=True)
        return [taps[k] for k in tap_order[: args.levels]]

    features: list[list[np.ndarray]] = [[] for _ in range(args.levels)]
    labels: list[int] = []

    for label_id, spec in enumerate(args.data, start=1):
        name, path = spec.split("=", 1)
        print(f"begin {name}")
        files = sorted(os.listdir(path))[: args.max_images]
        for fname in files:
            img = cv2.imread(os.path.join(path, fname))
            img = center_crop(img, 128)
            x = jnp.asarray(img[None].astype(np.float32) / 255.0)
            x = pre_test(x, args.window_size)
            for lvl, tap in enumerate(taps_fn(params, x)):
                f = np.asarray(tap)
                assert np.isnan(f).sum() == 0
                features[lvl].append(f.reshape(1, -1))
            labels.append(label_id)

    os.makedirs(args.out, exist_ok=True)
    for lvl in range(args.levels):
        if features[lvl]:
            arr = np.concatenate(features[lvl], axis=0)
            print(f"lr_features_{lvl + 1}: {arr.shape}")
            np.save(os.path.join(args.out, f"lr_features_{lvl + 1}.npy"), arr)
    np.save(os.path.join(args.out, "lr_labels.npy"), np.array(labels))


if __name__ == "__main__":
    main()
