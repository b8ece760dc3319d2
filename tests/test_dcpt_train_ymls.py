"""Shape-consistency guard for the shipped DCPT pre-train recipes.

The reference never shipped train configs (SURVEY §7) — ours are invented —
and the hook→probe contract is easy to get silently wrong: the pretrain model
feeds ``select_taps(...)[::-1]`` into ``PromptIR_NoImg_DC``, whose stages
expect a spatially-SHRINKING pyramid with ``feature_dims[i]`` channels at
level i (reference arch: degrad_classify_arch.py:623-641).  Reversed ENCODER
taps grow spatially and can never satisfy it (the round-4 bug this test
pins); reversed decoder taps (Restormer), per-block same-resolution taps +
``downsample`` (PromptIR decoder_level2, SwinIR encode_layers) do.  PromptIR
additionally exits its hook forward EARLY (reference promptir_arch.py:
463-506 = our ``skip_tail=True``), so decoder_level1/refinement taps never
exist on this path.

Everything runs through ``jax.eval_shape`` — full-width archs at the real
``gt_size``, zero FLOPs — so the whole contract (net_g tap shapes → reversed
selection → probe init) is checked for every shipped recipe in seconds.
"""

import os

import jax
import jax.numpy as jnp
import pytest

from dcpt_tpu.archs import build_network
from dcpt_tpu.models.dc_util import select_taps
from dcpt_tpu.utils.options import parse_options

TRAIN_DIR = os.path.join(os.path.dirname(__file__), "..", "options", "all_in_one", "train")

YMLS = [
    "train_Restormer_dcpt_5d.yml",
    "train_PromptIR_dcpt_5d.yml",
    "train_SwinIR_dcpt_5d.yml",
    "train_NAFNet_dcpt_5d.yml",
    "train_NAFNet_dcpt_10d.yml",
]


@pytest.mark.parametrize("yml", YMLS)
def test_dcpt_train_yml_hook_probe_contract(yml):
    opt, _ = parse_options(
        ".", is_train=True,
        args=["-opt", os.path.join(TRAIN_DIR, yml), "--force_yml", "num_gpu=0"],
    )
    gt = int(opt["datasets"]["train"].get("gt_size", 128))
    net_g = build_network({k: v for k, v in opt["network_g"].items() if k != "h"})
    net_dc = build_network(opt["network_dc"])
    x = jnp.zeros((1, gt, gt, 3), jnp.float32)
    key = jax.random.PRNGKey(0)

    params = jax.eval_shape(net_g.init, key, x)["params"]

    # the selection must happen INSIDE the traced fn: eval_shape (like any
    # jit boundary) returns dicts key-SORTED, destroying the tap dict's
    # insertion order (= hook firing order) that select_taps relies on;
    # a list crosses the boundary order-preserved.  skip_tail stays a
    # closure constant — as a traced arg it would hit `if skip_tail:`.
    def reversed_feats(p, x):
        try:
            _, taps = net_g.apply(p, x, skip_tail=True)
        except TypeError:  # arch without a skip_tail arg
            _, taps = net_g.apply(p, x)
        return select_taps(taps, opt["hook_names"])[::-1]

    feats = jax.eval_shape(reversed_feats, {"params": params}, x)
    assert feats, f"{yml}: hook_names={opt['hook_names']!r} selected no taps"

    dims = list(opt["network_dc"]["feature_dims"])
    assert len(feats) <= len(dims), (
        f"{yml}: {len(feats)} reversed taps but only {len(dims)} feature_dims "
        "— the probe's mixing/stage lists cannot consume them")
    for i, f in enumerate(feats):
        assert f.shape[-1] == dims[i], (
            f"{yml}: reversed tap {i} has {f.shape[-1]} channels, "
            f"feature_dims[{i}] = {dims[i]}")

    # the probe itself must init against these taps (catches spatial
    # mismatches: pooling vs pyramid, downsample-resize bottoming out at 0)
    shapes = jax.eval_shape(net_dc.init, key, x, list(feats))
    assert shapes["params"]
