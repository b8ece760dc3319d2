"""Exact-erf GELU usable inside Pallas TPU kernel bodies.

Pallas TPU lowers neither ``erf`` nor ``erfc``, so the fused-block kernels
(mdta_block, window_attention) evaluate the Abramowitz–Stegun 7.1.26 rational
erf instead: |err| ≤ 1.5e-7, below the fp32 noise floor, so numerically
identical to the torch exact GELU the reference archs use
(/root/reference/basicsr/archs/restormer_arch.py GDFN,
swinir_arch.py Mlp).
"""

import jax.numpy as jnp


def gelu_exact(x):
    """0.5·x·(1+erf(x/√2)) with a rational-polynomial erf (fp32 inputs)."""
    z = x * 0.7071067811865476
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf_abs = 1.0 - poly * jnp.exp(-az * az)
    erf = jnp.where(z >= 0, erf_abs, -erf_abs)
    return 0.5 * x * (1.0 + erf)
