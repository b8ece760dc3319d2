"""Flat-npz serialization for nested parameter pytrees.

Network snapshots are saved as ``.npz`` with ``/``-joined key paths — a
portable, dependency-free format (the reference's ``.pth`` role,
``base_model.py:249-298``).  Training state (optimizer pytrees) goes through
orbax instead (see base_model.save_training_state).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np


def flatten_tree(tree: dict, prefix: str = "", sep: str = "/") -> dict[str, np.ndarray]:
    flat: dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}{sep}{k}" if prefix else str(k)
        if isinstance(v, dict):
            flat.update(flatten_tree(v, key, sep))
        else:
            flat[key] = np.asarray(v)
    return flat


def unflatten_tree(flat: dict, sep: str = "/") -> dict:
    tree: dict = {}
    for key, v in flat.items():
        *path, leaf = key.split(sep)
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = v
    return tree


def save_tree_npz(path: str, trees: dict[str, dict]) -> None:
    """Save {param_key: tree} dicts, e.g. {'params': …, 'params_ema': …}.

    Written atomically (tmp file + rename) and retried like the reference's
    save (base_model.py:281-298).
    """
    flat: dict[str, np.ndarray] = {}
    for param_key, tree in trees.items():
        for k, v in flatten_tree(tree).items():
            flat[f"{param_key}::{k}"] = v
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(path)), suffix=".npz.tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **flat)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def load_tree_npz(path: str) -> dict[str, dict]:
    """Inverse of :func:`save_tree_npz` → {param_key: tree}."""
    data = np.load(path)
    by_key: dict[str, dict] = {}
    for full_key in data.files:
        param_key, flat_key = full_key.split("::", 1)
        by_key.setdefault(param_key, {})[flat_key] = data[full_key]
    return {k: unflatten_tree(v) for k, v in by_key.items()}
