"""Load the upstream PyTorch reference (read-only at /root/reference) as a numeric oracle.

The reference environment pins several packages that are absent here (skimage, lmdb,
torchvision, torchinfo, timm, fvcore).  We stub just enough of them for the *arch*
modules to import; the stubs are only ever used in tests, never in dcpt_tpu itself.

Tests that need the oracle should call ``load_reference()`` and skip when it returns
None (reference tree not mounted / torch missing).
"""

from __future__ import annotations

import itertools
import sys
import types

REF_PATH = "/root/reference"

_loaded = None


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _install_stubs() -> None:
    import torch
    import torch.nn as nn

    sk = _stub("skimage")
    skio = _stub("skimage.io", imsave=lambda *a, **k: None)
    sk.io = skio

    _stub("lmdb")

    tv = _stub("torchvision")
    tv.__path__ = []
    tv.__version__ = "0.0-stub"
    tvu = _stub("torchvision.utils", make_grid=lambda *a, **k: None)
    tv.utils = tvu

    def _normalize(tensor, mean, std, inplace=False):
        if not inplace:
            tensor = tensor.clone()
        mean = torch.as_tensor(mean, dtype=tensor.dtype).view(-1, 1, 1)
        std = torch.as_tensor(std, dtype=tensor.dtype).view(-1, 1, 1)
        return tensor.sub_(mean).div_(std)

    def _rgb_to_grayscale(img, num_output_channels=1):
        # ITU-R 601-2 luma transform, matching torchvision
        w = torch.tensor([0.2989, 0.587, 0.114], dtype=img.dtype).view(3, 1, 1)
        gray = (img * w).sum(dim=-3, keepdim=True)
        if num_output_channels == 3:
            gray = gray.expand(img.shape)
        return gray

    tvt = _stub("torchvision.transforms")
    tvt.__path__ = []
    tvtf = _stub(
        "torchvision.transforms.functional", normalize=_normalize, rgb_to_grayscale=_rgb_to_grayscale
    )
    tv.transforms = tvt
    tvt.functional = tvtf

    _stub("torchinfo", summary=lambda *a, **k: "stub-summary")

    # timm.models.layers: DropPath / to_2tuple / trunc_normal_
    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = x.new_empty(shape).bernoulli_(keep)
            return x * mask / keep

    def to_2tuple(x):
        if isinstance(x, (tuple, list)):
            return tuple(itertools.islice(itertools.chain(x, itertools.repeat(x[-1])), 2))
        return (x, x)

    timm = _stub("timm")
    timm.__path__ = []  # mark as package so `timm.models.layers` import resolves
    timm_models = _stub("timm.models")
    timm_models.__path__ = []
    layers = _stub(
        "timm.models.layers",
        DropPath=DropPath,
        to_2tuple=to_2tuple,
        trunc_normal_=torch.nn.init.trunc_normal_,
    )
    timm.models = timm_models
    timm_models.layers = layers

    def _accuracy(output, target, topk=(1,)):
        maxk = max(topk)
        _, pred = output.topk(maxk, 1, True, True)
        pred = pred.t()
        correct = pred.eq(target.reshape(1, -1).expand_as(pred))
        return [correct[:k].reshape(-1).float().sum(0) * 100.0 / target.size(0) for k in topk]

    timm_utils = _stub("timm.utils", accuracy=_accuracy)
    timm_utils.__path__ = []
    timm.utils = timm_utils
    timm_utils.metrics = _stub("timm.utils.metrics", accuracy=_accuracy)

    fv = _stub("fvcore")
    fv.__path__ = []
    fvnn = _stub("fvcore.nn")
    fvnn.__path__ = []
    fv.nn = fvnn

    def c2_msra_fill(module):
        nn.init.kaiming_normal_(module.weight, mode="fan_out", nonlinearity="relu")
        if getattr(module, "bias", None) is not None:
            nn.init.constant_(module.bias, 0)

    wi = _stub("fvcore.nn.weight_init", c2_msra_fill=c2_msra_fill)
    fvnn.weight_init = wi


def load_reference():
    """Import and return the reference ``basicsr`` package, or None if unavailable."""
    global _loaded
    if _loaded is not None:
        return _loaded
    import os

    if not os.path.isdir(REF_PATH):
        return None
    try:
        import torch  # noqa: F401
    except ImportError:
        return None
    _install_stubs()
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    import basicsr  # noqa: F401

    _loaded = basicsr
    return _loaded
