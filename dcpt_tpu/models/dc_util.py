"""Shared helpers for the degradation-classification model family.

Feature-tap selection replaces the reference's forward hooks: archs return
``taps`` dicts keyed by the reference's ``count('.')==1`` module names, and the
models filter them by substring exactly as the hook registration loops did
(``…pretrain_model.py:64-68``, ``…distillation_model.py:84-93``).  Dict
insertion order = forward execution order = hook firing order, so the
``[::-1]`` reversal semantics carry over unchanged.
"""

from __future__ import annotations

import re


def select_taps(taps: dict, hook_names: str | None) -> list:
    """Ordered features whose tap name contains ``hook_names``."""
    if hook_names is None:
        return []
    return [v for k, v in taps.items() if hook_names in k]


_LEVEL_IDX = re.compile(r"^(\w+?)(\d)\.(\d+)$")


def select_taps_restormer_origin(taps: dict, hook_names: str | None) -> list:
    """DCDistModel's hard-coded Restormer_origin block selection
    (…distillation_model.py:88-93): last block of encoder levels —
    (block 5 of levels 2, 3) or (block 3 of level 1)."""
    out = []
    for k, v in taps.items():
        if hook_names is None or hook_names not in k:
            continue
        m = _LEVEL_IDX.match(k)
        if not m:
            continue
        level, idx = int(m.group(2)), int(m.group(3))
        if (idx == 5 and level in (2, 3)) or (idx == 3 and level == 1):
            out.append(v)
    return out


def accuracy_topk(logits, labels, topk=(1,)):
    """timm-style top-k accuracy in percent (reference: timm.utils.accuracy)."""
    import jax.numpy as jnp

    maxk = max(topk)
    top = jnp.argsort(logits, axis=-1)[:, ::-1][:, :maxk]
    correct = top == labels[:, None]
    return [100.0 * jnp.mean(jnp.any(correct[:, :k], axis=1).astype(jnp.float32)) for k in topk]
