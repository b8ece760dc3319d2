"""Pallas TPU kernels — the fused fast path.

The reference ships three optional CUDA/C++ ops gated by ``BASICSR_JIT``
(``basicsr/ops/``: channel LayerNorm, StyleGAN2 fused bias+LeakyReLU, Swin
fused window roll/partition — SURVEY §2.2).  Their TPU-native equivalents live
here as Pallas kernels with custom VJPs, numerically matched to the pure-jnp
compositions in the archs and gated the same way: set ``DCPT_TPU_PALLAS=1``
(or call ``enable_pallas(True)``) to route the archs' hot ops through them.

Each kernel also has an ``interpret=True`` test against its jnp twin, the
analog of keeping the CUDA op API-compatible with the PyTorch fallback.
"""

import os

_USE_PALLAS = os.environ.get("DCPT_TPU_PALLAS", "0") == "1"


def pallas_enabled() -> bool:
    return _USE_PALLAS


def enable_pallas(flag: bool = True) -> None:
    global _USE_PALLAS
    _USE_PALLAS = flag


from .fused_act import fused_bias_leaky_relu  # noqa: E402,F401
from .layernorm2d import layer_norm_2d  # noqa: E402,F401
from .ln_proj import fused_ln_proj  # noqa: E402,F401
from .mdta import mdta_attention  # noqa: E402,F401
from .naf_ffn import naf_expand  # noqa: E402,F401
from .naf_ffn import naf_ffn as fused_naf_ffn  # aliased: `naf_ffn` must stay the submodule attr
from .window_attention import fused_window_attention  # noqa: E402,F401
from .window_process import window_partition_fused, window_reverse_fused  # noqa: E402,F401
from . import naf_ffn  # noqa: E402,F401  (restore the submodule binding)

__all__ = [
    "pallas_enabled",
    "enable_pallas",
    "layer_norm_2d",
    "fused_bias_leaky_relu",
    "fused_ln_proj",
    "mdta_attention",
    "naf_expand",
    "fused_naf_ffn",
    "fused_window_attention",
    "window_partition_fused",
    "window_reverse_fused",
]
