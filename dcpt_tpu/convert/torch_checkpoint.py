"""Convert reference ``.pth`` checkpoints (pickle zips of torch tensors) into
flax parameter pytrees.

The reference saves ``{param_key: state_dict}`` with keys ``params`` /
``params_ema`` and a possible ``module.`` DDP prefix (``base_model.py:249-298``).
Layout translation:

* conv weight  (O, I/g, kh, kw)  → kernel (kh, kw, I/g, O)   [OIHW → HWIO]
* linear weight (O, I)           → kernel (I, O)
* 1-D norm weight/bias           → unchanged
* NCHW-broadcast params (1, C, 1, 1) → (1, 1, 1, C)          [β/γ residual scales]

Module-path renames (torch dotted names → flax collapsed names) are provided by
each arch class as ``torch_key_map`` (e.g. ``nafnet_arch.torch_key_map``).
"""

from __future__ import annotations

from typing import Callable

import numpy as np


def load_torch_state_dict(path: str, param_key: str | None = "params_ema") -> dict[str, np.ndarray]:
    """Load a reference checkpoint file to a flat {torch_key: ndarray} dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if param_key is not None and isinstance(ckpt, dict):
        if param_key in ckpt:
            ckpt = ckpt[param_key]
        elif param_key == "params_ema" and "params" in ckpt:
            # EMA fallback, mirrors base_model.py:353-356
            ckpt = ckpt["params"]
        elif "params" in ckpt or "params_ema" in ckpt:
            ckpt = ckpt.get("params", ckpt.get("params_ema"))
    state = {}
    for k, v in ckpt.items():
        if k.startswith("module."):  # strip DDP prefix
            k = k[len("module.") :]
        state[k] = v.detach().cpu().numpy()
    return state


def translate_tensor(name_leaf: str, value: np.ndarray) -> tuple[str, np.ndarray]:
    """Map one torch tensor to its flax (leaf-name, layout)."""
    if name_leaf == "weight":
        if value.ndim == 4:
            return "kernel", value.transpose(2, 3, 1, 0)
        if value.ndim == 2:
            return "kernel", value.transpose(1, 0)
        return "weight", value  # norm scale
    if name_leaf == "bias":
        return "bias", value
    # parameter leaves like beta/gamma: translate NCHW broadcast shape to NHWC
    if value.ndim == 4 and value.shape[0] == 1 and value.shape[2] == 1 and value.shape[3] == 1:
        return name_leaf, value.transpose(0, 2, 3, 1)
    return name_leaf, value


def state_dict_to_params(
    state: dict[str, np.ndarray],
    key_map: Callable[[str], str] | None = None,
    dtype=None,
) -> dict:
    """Flat torch state dict → nested flax params dict."""
    params: dict = {}
    for torch_key, value in state.items():
        key = key_map(torch_key) if key_map is not None else torch_key
        *path, leaf = key.split(".")
        leaf, value = translate_tensor(leaf, value)
        if dtype is not None:
            value = value.astype(dtype)
        node = params
        for p in path:
            node = node.setdefault(p, {})
        if leaf in node:
            raise KeyError(f"duplicate parameter path {key} (from {torch_key})")
        node[leaf] = value
    return params


def load_network_params(net, path: str, param_key: str | None = "params_ema", dtype=None) -> dict:
    """One-call load: reference .pth → flax params for arch instance ``net``."""
    key_map = getattr(type(net), "torch_key_map", None)
    state = load_torch_state_dict(path, param_key)
    return {"params": state_dict_to_params(state, key_map=key_map, dtype=dtype)}


def verify_params_match(converted: dict, initialized: dict, prefix: str = "") -> list[str]:
    """Compare two nested param trees; returns a list of mismatch descriptions."""
    problems = []
    ck = set(converted.keys())
    ik = set(initialized.keys())
    for k in sorted(ck - ik):
        problems.append(f"extra in checkpoint: {prefix}{k}")
    for k in sorted(ik - ck):
        problems.append(f"missing from checkpoint: {prefix}{k}")
    for k in sorted(ck & ik):
        c, i = converted[k], initialized[k]
        if isinstance(c, dict) and isinstance(i, dict):
            problems += verify_params_match(c, i, prefix=f"{prefix}{k}.")
        elif isinstance(c, dict) != isinstance(i, dict):
            problems.append(f"structure mismatch at {prefix}{k}")
        elif tuple(np.shape(c)) != tuple(np.shape(i)):
            problems.append(f"shape mismatch at {prefix}{k}: ckpt {np.shape(c)} vs init {np.shape(i)}")
    return problems
