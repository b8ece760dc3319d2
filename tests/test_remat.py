"""remat (gradient checkpointing) across the training archs: numerically
identical forward, differentiable, no new params — so checkpoints stay
interchangeable (NAFNet's flag is covered in test_nafnet.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


CASES = {
    "Restormer": (
        "dcpt_tpu.archs.restormer_arch",
        "Restormer",
        dict(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1, heads=(1, 1, 2, 2)),
        (1, 16, 16, 3),
    ),
    "PromptIR": (
        "dcpt_tpu.archs.promptir_arch",
        "PromptIR",
        dict(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1, heads=(1, 1, 2, 2)),
        (1, 16, 16, 3),
    ),
    "SwinIR": (
        "dcpt_tpu.archs.swinir_arch",
        "SwinIR",
        dict(img_size=16, embed_dim=8, depths=(1, 1), num_heads=(2, 2), window_size=4, mlp_ratio=2.0, upsampler=""),
        (1, 16, 16, 3),
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_remat_matches_and_differentiates(rng, name):
    module, cls_name, kw, shape = CASES[name]
    mod = __import__(module, fromlist=[cls_name])
    cls = getattr(mod, cls_name)

    x = jnp.asarray(rng.random(shape).astype(np.float32))
    net = cls(**kw)
    net_r = cls(**kw, remat=True)
    params = net.init(jax.random.PRNGKey(0), x)
    params_r = net_r.init(jax.random.PRNGKey(0), x)
    # param-free option: identical pytree structure
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_r)

    out, _ = net.apply(params, x)
    out_r, _ = net_r.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out), atol=1e-6)

    g = jax.grad(lambda p: jnp.sum(net_r.apply(p, x)[0] ** 2))(params)
    assert all(np.isfinite(np.asarray(t)).all() for t in jax.tree_util.tree_leaves(g))
