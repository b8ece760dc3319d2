"""Pallas TPU kernels — the fused fast path.

The reference ships three optional CUDA/C++ ops gated by ``BASICSR_JIT``
(``basicsr/ops/``: channel LayerNorm, StyleGAN2 fused bias+LeakyReLU, Swin
fused window roll/partition — SURVEY §2.2), and its README *instructs* that
fast path for testing (``BASICSR_JIT=True python basicsr/test.py`` —
reference README.md:79).  Their TPU-native equivalents live here as Pallas
kernels with custom VJPs, numerically matched to the pure-jnp compositions in
the archs.

Gating policy (``DCPT_TPU_PALLAS``) — three states:

* unset (**default**, ``"auto"``): kernels that WON their end-to-end A/B on
  real v5e hardware fire automatically on TPU backends (currently the SwinIR
  fused window attention, 1.37–1.78× — PARITY.md "Pallas kernels"); kernels
  that tied or lost stay off.  This matches the reference's instructed
  default usage while keeping measured losers out of the hot path.
* ``"0"`` (or ``enable_pallas(False)``): kill-switch — every kernel off.
* ``"1"`` (or ``enable_pallas(True)``): everything on, including the
  tie/lose-by-measurement kernels (the NAFNet c=512 fusions) — for A/B runs.

Each kernel also has an ``interpret=True`` test against its jnp twin, the
analog of keeping the CUDA op API-compatible with the PyTorch fallback.
"""

import os

_MODE_BY_ENV = {"0": "off", "1": "all", "auto": "auto"}
_PALLAS_MODE = _MODE_BY_ENV.get(os.environ.get("DCPT_TPU_PALLAS", "auto"), "auto")


def pallas_mode() -> str:
    return _PALLAS_MODE


def pallas_enabled() -> bool:
    """True only in ``all`` mode — gates the opt-in (tied/losing) kernels."""
    return _PALLAS_MODE == "all"


def pallas_winner_enabled() -> bool:
    """Gates the measured-winner kernels: on unless kill-switched.

    In ``auto`` mode winners fire only on a TPU backend (Pallas TPU kernels
    can't run un-interpreted on CPU — tests force them via enable_pallas)."""
    if _PALLAS_MODE == "off":
        return False
    if _PALLAS_MODE == "all":
        return True
    try:
        import jax

        # param-init idiom `with jax.default_device(cpu): net.init(...)`
        # traces for the CPU backend even on a TPU host — un-interpreted
        # Pallas can't lower there, so auto mode stands down in that context
        dev = getattr(jax.config, "jax_default_device", None)
        if dev is not None and getattr(dev, "platform", "") != "tpu":
            return False
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False


def enable_pallas(flag=True) -> None:
    """``True`` → "all", ``False`` → "off"; also accepts the mode strings."""
    global _PALLAS_MODE
    if isinstance(flag, str):
        assert flag in ("off", "auto", "all"), flag
        _PALLAS_MODE = flag
    else:
        _PALLAS_MODE = "all" if flag else "off"


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
