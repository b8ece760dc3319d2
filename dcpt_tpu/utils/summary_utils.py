"""FLOPs / activation / complexity reporting (reference: basicsr/utils/summary_utils.py).

The reference monkey-patches per-module hook counters onto torch modules
(summary_utils.py:162-482).  TPU-native, the compiler already knows: FLOPs and
bytes come from XLA cost analysis of the lowered computation, activations from
flax's ``capture_intermediates``, params from the pytree.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def count_params(params) -> int:
    return sum(int(np.prod(np.shape(x))) for x in jax.tree_util.tree_leaves(params))


def get_model_flops(net, params, input_shape, as_string: bool = True):
    """FLOPs of one forward via XLA cost analysis (the reference's
    get_model_flops, summary_utils.py:12-33)."""
    x = jnp.zeros((1, *input_shape))

    def fwd(p, x):
        out = net.apply({"params": p}, x)
        return out[0] if isinstance(out, tuple) else out

    cost = jax.jit(fwd).lower(params, x).compile().cost_analysis()
    flops = float(cost.get("flops", 0.0)) if cost else 0.0
    if as_string:
        return f"{flops / 1e9:.2f} GFLOPs"
    return flops


def get_model_activation(net, params, input_shape):
    """Total activation element count + number of conv/dense applications
    (the reference's get_model_activation, summary_utils.py:35-52)."""
    x = jnp.zeros((1, *input_shape))
    _, state = net.apply({"params": params}, x, capture_intermediates=True, mutable=["intermediates"])

    total = 0
    count = 0
    for leaf in jax.tree_util.tree_leaves(state["intermediates"]):
        if hasattr(leaf, "shape"):
            total += int(np.prod(leaf.shape))
            count += 1
    return total, count


def get_model_complexity_info(net, params, input_shape, as_string: bool = True):
    """(flops, params) pair like the reference's complexity report."""
    flops = get_model_flops(net, params, input_shape, as_string=False)
    n_params = count_params(params)
    if as_string:
        return f"{flops / 1e9:.2f} GFLOPs", f"{n_params / 1e6:.2f} M"
    return flops, n_params
