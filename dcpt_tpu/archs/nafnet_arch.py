"""NAFNet — Nonlinear Activation Free network for image restoration, TPU-native.

Numerically matches the reference (``basicsr/archs/nafnet_arch.py:83-288``) in
NHWC: NAFBlock = LN → 1×1 expand → 3×3 depthwise → SimpleGate → simplified
channel attention → 1×1, plus a gated FFN branch, with learnable residual
scales β, γ.  The U-Net body mirrors the reference's module names (``encoders``,
``downs``, ``middle_blks``, ``ups``, ``decoder{i}``) so torch checkpoints map
1:1 (see ``dcpt_tpu/convert/torch_checkpoint.py``).

Differences by design (TPU-first):
* NHWC layout; channel ops act on the last axis.
* No forward hooks: ``__call__`` returns ``(out, taps)`` where ``taps`` is a
  dict keyed by the reference's top-level module names (``encoders.0`` …), so
  the DCPT hook-selection semantics (name filter + ``count('.')==1``,
  reference ``…pretrain_model.py:64-68``) are reproduced by dict-key filtering.
* TLSC (the ``NAFNet`` local variant, reference nafnet_arch.py:278-288 +
  arch_util.py:313-455) is a static config flag switching the SCA pooling to a
  cumsum integral-image local mean — no module mutation.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import ARCH_REGISTRY
from .arch_util import LayerNorm2d, conv2d, local_avg_pool, pixel_shuffle, tlsc_kernel_size

import os as _os

# whole-NAFBlock two-phase kernel (ops/naf_block.py — the roofline's
# shallow-stage bandwidth lever).  Two round-3 A/Bs on the real chip
# (scripts/bench_naf_block.py, min of 3 interleaved passes, flagship w64
# @128px): fp32 bs16 all-stage kernel 17.97 / 18.04 MPix/s vs 15.26 /
# 15.34 XLA across runs (+18%, reproducible); bf16 bs32 shallow-only is a
# TIE (+2% run 1, −1% run 2) and all-stage bf16 LOSES for the v2 variant
# (the deep c=512 stage already runs at 78% bf16 MXU under XLA).  Winner
# policy: fp32 ON by default at every stage, bf16 stays on the XLA path
# (measured ties stay opt-in).  DCPT_TPU_NAF_BLOCK=0 kill-switch, =1
# forces every stage in both dtypes (A/B), DCPT_TPU_NAF_BLOCK_MAXC
# overrides the cap.
_NAF_BLOCK_ENV = _os.environ.get("DCPT_TPU_NAF_BLOCK", "auto")
_NAF_BLOCK_KERNEL = _NAF_BLOCK_ENV != "0"
_NAF_BLOCK_MAXC = int(_os.environ.get("DCPT_TPU_NAF_BLOCK_MAXC", "0"))


def _naf_block_maxc(dtype) -> int:
    """Per-dtype stage cap for the whole-NAFBlock kernel (A/B above)."""
    if _NAF_BLOCK_MAXC:
        return _NAF_BLOCK_MAXC
    if _NAF_BLOCK_ENV == "1":
        return 4096
    return 4096 if dtype == jnp.float32 else 0


def simple_gate(x: jax.Array) -> jax.Array:
    """Channel-halving gate: x1 * x2 (reference: nafnet_arch.py:77-80)."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    return x1 * x2


class NAFBlock(nn.Module):
    c: int
    dw_expand: int = 2
    ffn_expand: int = 2
    drop_out_rate: float = 0.0
    # TLSC: when local_stats is true, SCA's global mean becomes a local window mean
    local_stats: bool = False
    base_size: tuple[int, int] | None = None
    train_size: tuple[int, int] | None = None
    # context parallelism: (mesh axis, halo rows at THIS stage's resolution).
    # Under spatial_sharded_apply the SCA global mean becomes an
    # interior-masked psum — globally exact despite the H-sharding (the
    # analog of restormer MDTA.cp), modulo the halo machinery's outer-border
    # convention: shards reflect-pad the global top/bottom where the full
    # image zero-pads, and the unnormalized mean sees those edge rows
    # (~1e-4 uniform residual, measured fp64-stable; seams carry no extra
    # error — tests/test_spatial.py).  Mutually exclusive with local_stats.
    cp: tuple | None = None

    @nn.compact
    def __call__(self, inp: jax.Array, deterministic: bool = True) -> jax.Array:
        c = self.c
        dw = c * self.dw_expand
        ffn = c * self.ffn_expand

        from ..ops import pallas_enabled, pallas_winner_enabled
        from ..ops.naf_prefix import naf_prefix, prefix_fits

        _, bh, bw, _ = inp.shape

        if (_NAF_BLOCK_KERNEL and c <= _naf_block_maxc(inp.dtype) and pallas_winner_enabled()
                and self.drop_out_rate == 0 and self.cp is None and not self.local_stats):
            # whole block in two VMEM passes + a micro SCA matmul: the map is
            # read twice and written twice instead of XLA's ~12 traversals
            from ..ops.naf_block import naf_block_fused, pick_row_tile
            from .arch_util import _ConvParamHolder, _NormParamHolder

            th = pick_row_tile(bh, bw, c)
            if th is not None:
                n1w, n1b = _NormParamHolder(c, name="norm1")()
                w1, b1 = _ConvParamHolder(c, dw, name="conv1")()
                w2, b2 = _ConvParamHolder(1, dw, kernel_size=3, name="conv2")()
                wsca, bsca = _ConvParamHolder(dw // 2, dw // 2, name="sca_1")()
                w3, b3 = _ConvParamHolder(dw // 2, c, name="conv3")()
                beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, c))
                n2w, n2b = _NormParamHolder(c, name="norm2")()
                w4, b4 = _ConvParamHolder(c, ffn, name="conv4")()
                w5, b5 = _ConvParamHolder(ffn // 2, c, name="conv5")()
                gamma = self.param("gamma", nn.initializers.zeros, (1, 1, 1, c))
                return naf_block_fused(
                    inp, n1w, n1b, w1.reshape(c, dw), b1, w2.reshape(3, 3, dw), b2,
                    wsca.reshape(dw // 2, dw // 2), bsca, w3.reshape(dw // 2, c), b3,
                    beta.reshape(c), n2w, n2b, w4.reshape(c, ffn), b4,
                    w5.reshape(ffn // 2, c), b5, gamma.reshape(c), 1e-6, th,
                )
        # Fused LN+expand+dwconv+gate, one VMEM pass — the dwconv must stay
        # INSIDE the kernel: on v5e any dot/custom-call producer in front of
        # a grouped depthwise conv falls off a ~10× compiler cliff (67.5 vs
        # 7.2 ms on the bs16 c=512 stage; even a pure-XLA einsum expand does
        # — PARITY.md "NAFNet kernel A/B"), which is what sank the round-1
        # LN+expand-only fusion.  Gated to the deep stage where kernels
        # measurably win and the whole (H, W, 2C) map fits VMEM.
        if pallas_enabled() and c == 512 and prefix_fits(bh, bw, c, dw):
            from .arch_util import _ConvParamHolder, _NormParamHolder

            n1_w, n1_b = _NormParamHolder(c, name="norm1")()
            w1, b1 = _ConvParamHolder(c, dw, name="conv1")()
            w2, b2 = _ConvParamHolder(1, dw, kernel_size=3, name="conv2")()
            x = naf_prefix(inp, n1_w, n1_b, w1.reshape(c, dw), b1, w2.reshape(3, 3, dw), b2)
        else:
            x = LayerNorm2d(c, name="norm1")(inp)
            x = conv2d(dw, 1, name="conv1", in_features=c)(x)
            x = conv2d(dw, 3, groups=dw, name="conv2", in_features=dw)(x)
            x = simple_gate(x)

        # Simplified Channel Attention: pooled stats → 1×1 conv → scale
        if self.cp is not None:
            # exact global mean under H-sharding: sum the non-halo interior
            # rows and psum over the spatial axis (halo rows would otherwise
            # be double-counted between neighbouring shards)
            axis, halo = self.cp
            hh = x.shape[1]
            interior = x[:, halo : hh - halo] if halo > 0 else x
            s = jax.lax.psum(jnp.sum(interior, axis=(1, 2), keepdims=True), axis)
            cnt = jax.lax.psum(jnp.float32(interior.shape[1] * interior.shape[2]), axis)
            pooled = s / cnt
        elif self.local_stats:
            k = tlsc_kernel_size(x.shape, self.base_size, self.train_size)
            pooled = local_avg_pool(x, k)
        else:
            pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        att = conv2d(dw // 2, 1, name="sca_1", in_features=dw // 2)(pooled)
        x = x * att

        x = conv2d(c, 1, name="conv3", in_features=dw // 2)(x)
        if self.drop_out_rate > 0:
            x = nn.Dropout(self.drop_out_rate, name="dropout1")(x, deterministic=deterministic)

        beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, c))
        y = inp + x * beta

        gamma = self.param("gamma", nn.initializers.zeros, (1, 1, 1, c))

        from ..ops import pallas_enabled

        # c == 512 only (the flagship's 30-block deep stage): measured wins
        # 13% there at bs16 but loses at c ≤ 256 (PARITY.md "NAFNet kernel A/B")
        if pallas_enabled() and self.drop_out_rate == 0 and c % 128 == 0 and c == 512:
            # fused FFN branch (LN → expand → gate → project → residual) in one
            # VMEM pass; param tree identical to the module path below
            from ..ops.naf_ffn import naf_ffn
            from .arch_util import _ConvParamHolder, _NormParamHolder

            ln_w, ln_b = _NormParamHolder(c, name="norm2")()
            w4, b4 = _ConvParamHolder(c, ffn, name="conv4")()
            w5, b5 = _ConvParamHolder(ffn // 2, c, name="conv5")()
            return naf_ffn(
                y, ln_w, ln_b, w4.reshape(c, ffn), b4, w5.reshape(ffn // 2, c), b5, gamma.reshape(c)
            )

        x = conv2d(ffn, 1, name="conv4", in_features=c)(LayerNorm2d(c, name="norm2")(y))
        x = simple_gate(x)
        x = conv2d(c, 1, name="conv5", in_features=ffn // 2)(x)
        if self.drop_out_rate > 0:
            x = nn.Dropout(self.drop_out_rate, name="dropout2")(x, deterministic=deterministic)

        return y + x * gamma


@ARCH_REGISTRY.register()
class NAFNetBaseline(nn.Module):
    """U-Net of NAFBlocks (reference: nafnet_arch.py:190-274)."""

    img_channel: int = 3
    width: int = 16
    middle_blk_num: int = 1
    enc_blk_nums: Sequence[int] = ()
    dec_blk_nums: Sequence[int] = ()
    window_size: int = 8  # used by the eval harness for pad-to-multiple
    drop_out_rate: float = 0.0
    # TLSC config (NAFNet variant); inert for the baseline
    local_stats: bool = False
    train_size: tuple[int, int] = (128, 128)
    tlsc_ratio: float = 1.5
    # gradient checkpointing: rematerialize each NAFBlock in the backward pass,
    # trading FLOPs for HBM (enables larger batches/crops on one chip)
    remat: bool = False
    # context-parallel inference (see NAFBlock.cp): shard H over cp_axis via
    # parallel.spatial.spatial_sharded_apply with halo=cp_halo; every SCA
    # keeps its GLOBAL statistics exactly.  cp_halo must divide by
    # 2**len(enc_blk_nums) (one halving per down).  Param-free, so
    # checkpoints stay interchangeable with the plain model.
    cp_axis: str | None = None
    cp_halo: int = 0

    def _cp(self, factor: int):
        if self.cp_axis is None:
            return None
        assert self.cp_halo % (2 ** len(self.enc_blk_nums)) == 0, (
            "cp_halo must divide by 2**len(enc_blk_nums)")
        assert not self.local_stats, "cp (exact global stats) and TLSC local_stats are exclusive"
        return (self.cp_axis, self.cp_halo // factor)

    def _block_cfg(self) -> dict[str, Any]:
        base = (int(self.train_size[0] * self.tlsc_ratio), int(self.train_size[1] * self.tlsc_ratio))
        return dict(
            drop_out_rate=self.drop_out_rate,
            local_stats=self.local_stats,
            base_size=base if self.local_stats else None,
            train_size=self.train_size if self.local_stats else None,
        )

    @nn.compact
    def __call__(self, inp: jax.Array, skip_tail: bool = False, deterministic: bool = True,
                 tail_count: int | None = None):
        """Returns ``(out, taps)``; ``out`` is None when ``skip_tail`` (the
        reference's ``hook=True`` feature-only pass, nafnet_arch.py:250-274).

        ``taps`` keys are exactly the reference's module names with
        ``name.count('.') == 1`` — the set the DCPT hook filter selects from
        (``…pretrain_model.py:64-68``): ``encoders.{i}``, ``downs.{i}``,
        ``middle_blks.{j}``, ``ups.{i}``, ``decoder{i}.{j}``.

        ``tail_count``: batched-trunk DCPT mode (VERDICT r4 #4) — the trunk
        runs on a concatenated ``[pixel-input; lq]`` 2B batch and the tail
        (``ending`` conv + input residual) applies to the first ``tail_count``
        samples only; ``taps`` keep the FULL batch so the caller slices the
        lq half.  Every block is batch-parallel (LayerNorm2d and SCA
        statistics are per-sample), so this is numerically exact vs two
        separate passes.
        """
        cfg = self._block_cfg()
        taps: dict[str, jax.Array] = {}
        Block = nn.remat(NAFBlock, static_argnums=(2,)) if self.remat else NAFBlock

        x = conv2d(self.width, 3, name="intro", in_features=self.img_channel)(inp)

        encs = []
        chan = self.width
        for i, num in enumerate(self.enc_blk_nums):
            for j in range(num):
                x = Block(chan, name=f"encoders_{i}_{j}", cp=self._cp(2**i), **cfg)(x, deterministic)
            taps[f"encoders.{i}"] = x
            encs.append(x)
            x = conv2d(2 * chan, 2, stride=2, padding=0, name=f"downs_{i}", in_features=chan)(x)
            taps[f"downs.{i}"] = x
            chan *= 2

        mid_factor = 2 ** len(self.enc_blk_nums)
        for j in range(self.middle_blk_num):
            x = Block(chan, name=f"middle_blks_{j}", cp=self._cp(mid_factor), **cfg)(x, deterministic)
            taps[f"middle_blks.{j}"] = x

        for i, num in enumerate(self.dec_blk_nums):
            x = conv2d(chan * 2, 1, bias=False, name=f"ups_{i}", in_features=chan)(x)
            x = pixel_shuffle(x, 2)
            taps[f"ups.{i}"] = x
            chan //= 2
            x = x + encs[-(i + 1)]
            dec_factor = 2 ** (len(self.enc_blk_nums) - 1 - i)
            for j in range(num):
                x = Block(chan, name=f"decoder_{i}_{j}", cp=self._cp(dec_factor), **cfg)(x, deterministic)
                taps[f"decoder{i}.{j}"] = x

        if skip_tail:
            return None, taps

        if tail_count is not None:
            x = x[:tail_count]
            inp = inp[:tail_count]
        x = conv2d(self.img_channel, 3, name="ending", in_features=self.width)(x)
        x = x + inp
        return x, taps


@ARCH_REGISTRY.register()
class NAFNet(NAFNetBaseline):
    """TLSC test-time variant (reference: nafnet_arch.py:278-288): identical
    parameters, but SCA pooling uses local windows of 1.5× the train size."""

    local_stats: bool = True


# ---------------------------------------------------------------------------
# torch-checkpoint key mapping (consumed by convert/torch_checkpoint.py)
# ---------------------------------------------------------------------------

import re as _re

_NAFNET_RENAMES = [
    (_re.compile(r"^encoders\.(\d+)\.(\d+)\."), r"encoders_\1_\2."),
    (_re.compile(r"^middle_blks\.(\d+)\."), r"middle_blks_\1."),
    (_re.compile(r"^downs\.(\d+)\."), r"downs_\1."),
    (_re.compile(r"^ups\.(\d+)\.0\."), r"ups_\1."),
    (_re.compile(r"^decoder(\d+)\.(\d+)\."), r"decoder_\1_\2."),
    (_re.compile(r"\.sca\.1\."), r".sca_1."),
]


def torch_key_map(key: str) -> str:
    """Rename a reference NAFNet state-dict key into our flax module path."""
    for pat, repl in _NAFNET_RENAMES:
        key = pat.sub(repl, key)
    return key


NAFNetBaseline.torch_key_map = staticmethod(torch_key_map)
NAFNet.torch_key_map = staticmethod(torch_key_map)
