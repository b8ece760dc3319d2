"""Convert pytorch-fid / torchvision InceptionV3 weights → dcpt_tpu npz.

The reference's FID extractor (``basicsr/metrics/fid.py:11-18``) loads the
pytorch-fid ``pt_inception-2015-12-05`` checkpoint (its ``inception.py`` is
missing from the snapshot; upstream BasicSR ships the pytorch-fid port).  In a
zero-egress environment the weights can't be fetched, so this script converts
a locally provided ``.pth`` state_dict into the flax pytree consumed by
``dcpt_tpu.archs.inception_arch.InceptionV3Features``:

* conv kernels OIHW → HWIO;
* BatchNorm (weight γ, bias β, running_mean μ, running_var σ², eps=1e-3) is
  FOLDED into per-channel ``bn_scale = γ/√(σ²+eps)`` and
  ``bn_shift = β − μ·bn_scale`` — inference-exact, one fused multiply-add;
* fc / AuxLogits keys are dropped (FID uses pool3 features only).

Usage::

    python scripts/convert_inception_weights.py pt_inception-2015-12-05.pth \
        inception_fid.npz
"""

from __future__ import annotations

import sys

import numpy as np

BN_EPS = 1e-3


def convert_state_dict(sd: dict) -> dict:
    """torch state_dict (tensor or ndarray values) → nested flax params dict."""
    tree: dict = {}
    convs = {}
    bns = {}
    for key, val in sd.items():
        val = np.asarray(val.detach().cpu().numpy() if hasattr(val, "detach") else val)
        if key.startswith(("fc.", "AuxLogits.")) or key.endswith("num_batches_tracked"):
            continue
        mod, leaf = key.rsplit(".", 1)
        if mod.endswith(".conv"):
            convs[mod[: -len(".conv")]] = val.transpose(2, 3, 1, 0)  # OIHW→HWIO
        elif mod.endswith(".bn"):
            bns.setdefault(mod[: -len(".bn")], {})[leaf] = val
        else:
            raise KeyError(f"unexpected key {key}")

    for name, kernel in convs.items():
        bn = bns[name]
        scale = bn["weight"] / np.sqrt(bn["running_var"] + BN_EPS)
        shift = bn["bias"] - bn["running_mean"] * scale
        node = tree
        for part in name.split("."):
            node = node.setdefault(part, {})
        node["conv"] = {"kernel": kernel.astype(np.float32)}
        node["bn_scale"] = scale.astype(np.float32)
        node["bn_shift"] = shift.astype(np.float32)
    return tree


def main() -> None:
    import torch

    from dcpt_tpu.utils.tree_io import save_tree_npz

    src, dst = sys.argv[1], sys.argv[2]
    sd = torch.load(src, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    params = convert_state_dict(sd)
    save_tree_npz(dst, {"params": params})
    n = sum(np.asarray(v).size for v in _leaves(params))
    print(f"wrote {dst}: {n:,} parameters")


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    main()
