"""Fused MDTA (transposed channel attention) — the Restormer/PromptIR hot op.

Beyond-reference fusion (SURVEY §7.6d): L2-normalise(q,k along pixels) →
C×C Gram → per-head temperature → ReLU/softmax → ·V in ONE VMEM-resident
kernel per (batch·head).  The normalisation folds into the Gram
(gram[i,j]/(‖q_i‖‖k_j‖)), so q/k are read once and no normalised copies or
attention matrix ever hit HBM.  The Gram and PV are MXU matmuls.

Backward recomputes through the jnp reference composition (custom_vjp), so the
kernel accelerates inference and the forward of training without a
hand-written backward.

Falls back to the jnp path when the per-head q/k/v blocks exceed the VMEM
budget (large images route through the eval tiler anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-(batch·head) VMEM footprint guard for the single-shot kernel: q,k,v,out
# at f32 PLUS normalised temporaries and the (c,c) attn live on the same
# ~16 MB scoped stack, so leave real slack (12 MB let (48,16384)@bs8 request
# 18 MB and OOM at compile time; the tiled path handles those shapes anyway)
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def mdta_ref(q, k, v, temperature, use_softmax: bool = False):
    """jnp reference: q,k,v (BH, c, L); temperature (BH,) or (BH, 1, 1)."""
    t = temperature.reshape(q.shape[0], 1, 1)
    qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    kn = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
    attn = jnp.einsum("bcl,bdl->bcd", qn, kn) * t
    attn = jax.nn.softmax(attn, axis=-1) if use_softmax else jax.nn.relu(attn)
    return jnp.einsum("bcd,bdl->bcl", attn, v)


def _kernel(q_ref, k_ref, v_ref, t_ref, out_ref, *, use_softmax: bool):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    qn2 = jnp.sum(q * q, axis=1, keepdims=True)  # (c, 1)
    kn2 = jnp.sum(k * k, axis=1, keepdims=True)
    inv_q = jax.lax.rsqrt(jnp.maximum(qn2, 1e-24))
    inv_k = jax.lax.rsqrt(jnp.maximum(kn2, 1e-24))
    gram = jnp.dot(q, k.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    attn = gram * inv_q * inv_k.T * t_ref[0, 0, 0]
    attn = jax.nn.softmax(attn, axis=-1) if use_softmax else jax.nn.relu(attn)
    out_ref[0] = jnp.dot(
        attn.astype(v.dtype), v, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    ).astype(v.dtype)


def _mdta_pallas(q, k, v, temperature, use_softmax: bool, interpret: bool):
    bh, c, l = q.shape
    t = jnp.broadcast_to(temperature.reshape(bh, 1, 1), (bh, 1, 1))
    return pl.pallas_call(
        functools.partial(_kernel, use_softmax=use_softmax),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, c, l), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, l), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, l), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, c, l), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, c, l), q.dtype),
        interpret=interpret,
    )(q, k, v, t)


def _gram_kernel(q_ref, k_ref, gram_ref, qn2_ref, kn2_ref):
    """Accumulate Gram + squared norms over L tiles (flash-style pass 1)."""
    l_idx = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]

    @pl.when(l_idx == 0)
    def _():
        gram_ref[0] = jnp.zeros_like(gram_ref[0])
        qn2_ref[0] = jnp.zeros_like(qn2_ref[0])
        kn2_ref[0] = jnp.zeros_like(kn2_ref[0])

    gram_ref[0] += jnp.dot(q, k.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    qn2_ref[0] += jnp.sum(q * q, axis=1, keepdims=True)
    kn2_ref[0] += jnp.sum(k * k, axis=1, keepdims=True)


def _pv_kernel(attn_ref, v_ref, out_ref):
    out_ref[0] = jnp.dot(
        attn_ref[0], v_ref[0], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    ).astype(out_ref.dtype)


def _pick_l_tile(l: int, c: int) -> int:
    """Largest L tile whose q/k/v blocks stay within a ~6 MB double-buffered
    VMEM footprint (3 input specs × 2 buffers × c×t×4B)."""
    budget = 6 * 1024 * 1024
    for t in (8192, 4096, 2048, 1024, 512, 256, 128):
        if l % t == 0 and 6 * c * t * 4 <= budget:
            return t
    return 128


def _mdta_pallas_tiled(q, k, v, temperature, use_softmax: bool, interpret: bool):
    """Two-pass L-tiled variant for maps too large to keep per-head in VMEM."""
    bh, c, l = q.shape
    tl = _pick_l_tile(l, c)
    grid = (bh, l // tl)
    spec_in = pl.BlockSpec((1, c, tl), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)
    gram, qn2, kn2 = pl.pallas_call(
        _gram_kernel,
        grid=grid,
        in_specs=[spec_in, spec_in],
        out_specs=[
            pl.BlockSpec((1, c, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, c, c), jnp.float32),
            jax.ShapeDtypeStruct((bh, c, 1), jnp.float32),
            jax.ShapeDtypeStruct((bh, c, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q, k)

    inv_q = jax.lax.rsqrt(jnp.maximum(qn2, 1e-24))
    inv_k = jax.lax.rsqrt(jnp.maximum(kn2, 1e-24))
    attn = gram * inv_q * jnp.swapaxes(inv_k, 1, 2) * temperature.reshape(bh, 1, 1)
    attn = (jax.nn.softmax(attn, axis=-1) if use_softmax else jax.nn.relu(attn)).astype(v.dtype)

    return pl.pallas_call(
        _pv_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, c, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            spec_in,
        ],
        out_specs=pl.BlockSpec((1, c, tl), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, c, l), v.dtype),
        interpret=interpret,
    )(attn, v)


def _fits_vmem(q) -> bool:
    _, c, l = q.shape
    per_head = 4 * c * l * q.dtype.itemsize  # q,k,v,out blocks (double-buffered pairs)
    return per_head <= _VMEM_BUDGET_BYTES and l % 128 == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def mdta_attention(q, k, v, temperature, use_softmax: bool = False, interpret: bool = False):
    """Fused MDTA over (BH, c, L) tensors; differentiable (bwd via jnp recompute)."""
    if q.shape[-1] % 128 != 0:
        return mdta_ref(q, k, v, temperature, use_softmax)
    if not interpret and not _fits_vmem(q):
        return _mdta_pallas_tiled(q, k, v, temperature, use_softmax, interpret)
    return _mdta_pallas(q, k, v, temperature, use_softmax, interpret)


def _fwd(q, k, v, temperature, use_softmax, interpret):
    # Differentiated path: hand XLA the jnp twin outright (see naf_block.py);
    # temperature keeps its caller shape so its cotangent needs no reshape
    out, vjp = jax.vjp(
        lambda q, k, v, t: mdta_ref(q, k, v, t.reshape(q.shape[0], 1, 1), use_softmax),
        q, k, v, temperature,
    )
    return out, vjp


def _bwd(use_softmax, interpret, vjp, g):
    return vjp(g)


mdta_attention.defvjp(_fwd, _bwd)
