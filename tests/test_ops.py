"""Pallas kernel parity vs jnp compositions (interpret mode on CPU)."""

import math
import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestLayerNorm2d:
    def _jnp_ln(self, x, w, b, eps=1e-6):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + eps) * w + b

    def test_forward_matches(self, rng):
        from dcpt_tpu.ops import layer_norm_2d

        x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal(16).astype(np.float32))
        b = jnp.asarray(rng.standard_normal(16).astype(np.float32))
        out = layer_norm_2d(x, w, b, 1e-6, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(self._jnp_ln(x, w, b)), atol=1e-5)

    def test_gradient_matches(self, rng):
        from dcpt_tpu.ops import layer_norm_2d

        x = jnp.asarray(rng.standard_normal((1, 4, 4, 8)).astype(np.float32))
        w = jnp.asarray(1 + 0.1 * rng.standard_normal(8).astype(np.float32))
        b = jnp.asarray(0.1 * rng.standard_normal(8).astype(np.float32))

        def f_pallas(x, w, b):
            return jnp.sum(jnp.sin(layer_norm_2d(x, w, b, 1e-6, True)))

        def f_jnp(x, w, b):
            return jnp.sum(jnp.sin(self._jnp_ln(x, w, b)))

        g1 = jax.grad(f_pallas, argnums=(0, 1, 2))(x, w, b)
        g2 = jax.grad(f_jnp, argnums=(0, 1, 2))(x, w, b)
        for a, c in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-4)

    def test_matches_reference_layernorm_ext(self, reference, rng):
        """Against the reference's ATen layernorm op (CPU-runnable)."""
        import torch

        # the compiled layernorm_ext is unavailable on CPU; its pure-torch twin
        # in nafnet_arch implements identical math (nafnet_arch.py:25-64)
        from basicsr.archs.nafnet_arch import LayerNormFunction

        from dcpt_tpu.ops import layer_norm_2d

        x = rng.standard_normal((1, 8, 6, 6)).astype(np.float32)  # NCHW for torch
        w = rng.standard_normal(8).astype(np.float32)
        b = rng.standard_normal(8).astype(np.float32)
        tx = torch.from_numpy(x).requires_grad_(True)
        tw = torch.from_numpy(w).requires_grad_(True)
        tb = torch.from_numpy(b).requires_grad_(True)
        t_out = LayerNormFunction.apply(tx, tw, tb, 1e-6)
        t_out.sum().backward()

        x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
        out = layer_norm_2d(x_nhwc, jnp.asarray(w), jnp.asarray(b), 1e-6, True)
        np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), t_out.detach().numpy(), atol=1e-5)

        gx, gw, gb = jax.grad(lambda x, w, b: jnp.sum(layer_norm_2d(x, w, b, 1e-6, True)), argnums=(0, 1, 2))(
            x_nhwc, jnp.asarray(w), jnp.asarray(b)
        )
        np.testing.assert_allclose(np.asarray(gx).transpose(0, 3, 1, 2), tx.grad.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw), tw.grad.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gb), tb.grad.numpy(), atol=1e-4)


class TestFusedAct:
    def test_matches_reference_semantics(self, rng):
        """out = √2·leaky_relu(x+b); grad matches jnp autodiff."""
        from dcpt_tpu.ops import fused_bias_leaky_relu

        x = jnp.asarray(rng.standard_normal((2, 4, 4, 8)).astype(np.float32))
        b = jnp.asarray(0.2 * rng.standard_normal(8).astype(np.float32))

        def ref(x, b):
            return jax.nn.leaky_relu(x + b, 0.2) * (2**0.5)

        out = fused_bias_leaky_relu(x, b, 0.2, 2**0.5, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref(x, b)), atol=1e-6)

        g1 = jax.grad(lambda x, b: jnp.sum(jnp.cos(fused_bias_leaky_relu(x, b, 0.2, 2**0.5, True))), argnums=(0, 1))(x, b)
        g2 = jax.grad(lambda x, b: jnp.sum(jnp.cos(ref(x, b))), argnums=(0, 1))(x, b)
        for a, c in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-5)


class TestWindowProcess:
    @pytest.mark.parametrize("shift", [0, 2])
    def test_partition_matches_roll_compose(self, rng, shift):
        from dcpt_tpu.archs.swinir_arch import window_partition
        from dcpt_tpu.ops import window_partition_fused

        x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
        expected = window_partition(jnp.roll(x, (-shift, -shift), (1, 2)) if shift else x, 4)
        got = window_partition_fused(x, 4, shift, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=0)

    @pytest.mark.parametrize("shift", [0, 2])
    def test_reverse_roundtrip(self, rng, shift):
        from dcpt_tpu.ops import window_partition_fused, window_reverse_fused

        x = jnp.asarray(rng.standard_normal((1, 8, 8, 16)).astype(np.float32))
        win = window_partition_fused(x, 4, shift, interpret=True)
        back = window_reverse_fused(win, 4, 8, 8, shift, interpret=True)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=0)


class TestMDTA:
    @pytest.mark.parametrize("use_softmax", [False, True])
    def test_fused_matches_reference(self, rng, use_softmax):
        from dcpt_tpu.ops.mdta import mdta_attention, mdta_ref

        q = jnp.asarray(rng.standard_normal((4, 16, 128)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((4, 16, 128)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((4, 16, 128)).astype(np.float32))
        t = jnp.asarray(rng.random(4).astype(np.float32) + 0.5)
        fused = mdta_attention(q, k, v, t, use_softmax, True)
        ref = mdta_ref(q, k, v, t.reshape(4, 1, 1), use_softmax)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-5)

    def test_gradients_flow(self, rng):
        from dcpt_tpu.ops.mdta import mdta_attention, mdta_ref

        q = jnp.asarray(rng.standard_normal((2, 8, 128)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((2, 8, 128)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((2, 8, 128)).astype(np.float32))
        t = jnp.ones(2)
        g1 = jax.grad(lambda q: jnp.sum(mdta_attention(q, k, v, t, False, True) ** 2))(q)
        g2 = jax.grad(lambda q: jnp.sum(mdta_ref(q, k, v, t.reshape(2, 1, 1), False) ** 2))(q)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)

    def test_restormer_with_pallas_mdta_matches(self, rng, monkeypatch):
        """Restormer forward identical with/without the fused MDTA path.

        The round-3 whole-block kernel (default-on) is pinned OFF here so the
        opt-in per-op MDTA kernel is exercised in isolation."""
        from dcpt_tpu.archs import restormer_arch
        from dcpt_tpu.archs.restormer_arch import Restormer
        from dcpt_tpu.ops import enable_pallas
        from dcpt_tpu.ops import mdta as mdta_mod

        net = Restormer(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1, heads=(1, 2, 2, 4))
        x = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
        params = net.init(jax.random.PRNGKey(0), x)
        base, _ = net.apply(params, x)
        # interpret mode so the kernel runs on CPU
        orig = mdta_mod._mdta_pallas
        mdta_mod_interp = lambda q, k, v, t, s, i: orig(q, k, v, t, s, True)
        monkeypatch.setattr(mdta_mod, "_mdta_pallas", mdta_mod_interp)
        monkeypatch.setattr(restormer_arch, "_mdta_block_on", lambda dtype: False)
        enable_pallas(True)
        try:
            fused, _ = net.apply(params, x)
        finally:
            enable_pallas(False)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(base), atol=1e-4)

    def test_tiled_variant_matches(self, rng):
        from dcpt_tpu.ops.mdta import _mdta_pallas_tiled, mdta_ref

        q = jnp.asarray(rng.standard_normal((2, 16, 512)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((2, 16, 512)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((2, 16, 512)).astype(np.float32))
        t = jnp.asarray(rng.random(2).astype(np.float32) + 0.5)
        # force multiple L tiles by monkeypatching the tile picker
        import dcpt_tpu.ops.mdta as m

        orig = m._pick_l_tile
        m._pick_l_tile = lambda l, c: 128
        try:
            fused = _mdta_pallas_tiled(q, k, v, t, False, True)
        finally:
            m._pick_l_tile = orig
        ref = mdta_ref(q, k, v, t, False)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=3e-5)


class TestNafFFN:
    def test_fused_matches_reference(self, rng):
        from dcpt_tpu.ops.naf_ffn import naf_ffn, naf_ffn_ref

        c = 128
        y = jnp.asarray(rng.standard_normal((2, 8, 8, c)).astype(np.float32))
        ln_w = jnp.asarray(1 + 0.1 * rng.standard_normal(c).astype(np.float32))
        ln_b = jnp.asarray(0.1 * rng.standard_normal(c).astype(np.float32))
        w4 = jnp.asarray(rng.standard_normal((c, 2 * c)).astype(np.float32) * 0.05)
        b4 = jnp.asarray(rng.standard_normal(2 * c).astype(np.float32) * 0.05)
        w5 = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * 0.05)
        b5 = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.05)
        gamma = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)

        fused = naf_ffn(y, ln_w, ln_b, w4, b4, w5, b5, gamma, 1e-6, True)
        ref = naf_ffn_ref(y.reshape(-1, c), ln_w, ln_b, w4, b4, w5, b5, gamma).reshape(y.shape)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-5)

        g1 = jax.grad(lambda y: jnp.sum(naf_ffn(y, ln_w, ln_b, w4, b4, w5, b5, gamma, 1e-6, True) ** 2))(y)
        g2 = jax.grad(lambda y: jnp.sum(naf_ffn_ref(y.reshape(-1, c), ln_w, ln_b, w4, b4, w5, b5, gamma) ** 2))(y)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-3)

    def test_naf_prefix_matches(self, rng):
        """Fused LN+expand+dwconv+gate kernel == jnp reference (fwd + grads)."""
        from dcpt_tpu.ops.naf_prefix import naf_prefix, naf_prefix_ref

        b, h, w, c = 2, 8, 8, 128
        dw = 2 * c
        x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32) * 0.3)
        ln_w = jnp.asarray(1 + 0.1 * rng.standard_normal(c).astype(np.float32))
        ln_b = jnp.asarray(0.1 * rng.standard_normal(c).astype(np.float32))
        w1 = jnp.asarray(rng.standard_normal((c, dw)).astype(np.float32) * 0.05)
        b1 = jnp.asarray(rng.standard_normal(dw).astype(np.float32) * 0.02)
        wdw = jnp.asarray(rng.standard_normal((3, 3, dw)).astype(np.float32) * 0.1)
        bdw = jnp.asarray(rng.standard_normal(dw).astype(np.float32) * 0.02)
        fused = naf_prefix(x, ln_w, ln_b, w1, b1, wdw, bdw, 1e-6, True)
        ref = naf_prefix_ref(x, ln_w, ln_b, w1, b1, wdw, bdw)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-5)
        g1 = jax.grad(lambda x: jnp.sum(naf_prefix(x, ln_w, ln_b, w1, b1, wdw, bdw, 1e-6, True) ** 2))(x)
        g2 = jax.grad(lambda x: jnp.sum(naf_prefix_ref(x, ln_w, ln_b, w1, b1, wdw, bdw) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)

    def test_naf_prefix_dw_dense_matches_grouped(self, rng, monkeypatch):
        """DCPT_TPU_DW_DENSE=1 (masked-dense dwconv on the MXU, the r4 train-
        graph A/B lever) == grouped dwconv, forward and grads."""
        from dcpt_tpu.ops.naf_prefix import naf_prefix_ref

        b, h, w, c = 2, 8, 8, 32
        dw = 2 * c
        x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32) * 0.3)
        ln_w = jnp.asarray(1 + 0.1 * rng.standard_normal(c).astype(np.float32))
        ln_b = jnp.asarray(0.1 * rng.standard_normal(c).astype(np.float32))
        w1 = jnp.asarray(rng.standard_normal((c, dw)).astype(np.float32) * 0.05)
        b1 = jnp.asarray(rng.standard_normal(dw).astype(np.float32) * 0.02)
        wdw = jnp.asarray(rng.standard_normal((3, 3, dw)).astype(np.float32) * 0.1)
        bdw = jnp.asarray(rng.standard_normal(dw).astype(np.float32) * 0.02)

        loss = lambda x, wdw: jnp.sum(  # noqa: E731
            naf_prefix_ref(x, ln_w, ln_b, w1, b1, wdw, bdw) ** 2)
        monkeypatch.setenv("DCPT_TPU_DW_DENSE", "0")
        ref = naf_prefix_ref(x, ln_w, ln_b, w1, b1, wdw, bdw)
        gx_ref, gw_ref = jax.grad(loss, argnums=(0, 1))(x, wdw)
        monkeypatch.setenv("DCPT_TPU_DW_DENSE", "1")
        dense = naf_prefix_ref(x, ln_w, ln_b, w1, b1, wdw, bdw)
        gx_d, gw_d = jax.grad(loss, argnums=(0, 1))(x, wdw)
        np.testing.assert_allclose(np.asarray(dense), np.asarray(ref), atol=2e-5)
        np.testing.assert_allclose(np.asarray(gx_d), np.asarray(gx_ref), atol=1e-4)
        # weight grads must land back on the diagonal with nothing lost
        np.testing.assert_allclose(np.asarray(gw_d), np.asarray(gw_ref), atol=1e-3)

    def test_nafblock_fused_ffn_matches(self, rng):
        """NAFNet forward identical with the fused FFN path (interpret mode)."""
        from dcpt_tpu.archs.nafnet_arch import NAFNetBaseline
        from dcpt_tpu.ops import enable_pallas
        import dcpt_tpu.ops.naf_ffn as nf
        import dcpt_tpu.ops.naf_prefix as npf
        import dcpt_tpu.ops.layernorm2d as ln_mod
        import dcpt_tpu.ops.mdta as mdta_mod

        # width 256 → middle stage c=512, the only stage the fused FFN + LN
        # + attention-prefix kernels fire at after the measured c≥512 gating
        net = NAFNetBaseline(width=256, enc_blk_nums=(1,), middle_blk_num=1, dec_blk_nums=(1,))
        x = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
        params = net.init(jax.random.PRNGKey(0), x)
        base, _ = net.apply(params, x)

        from dcpt_tpu.archs import nafnet_arch as _na

        block_was = _na._NAF_BLOCK_KERNEL
        _na._NAF_BLOCK_KERNEL = False  # pin the per-op kernel path under test
        orig_ffn = nf._ffn_pallas
        orig_exp = nf._expand_pallas
        orig_pref = npf._prefix_pallas
        npf._prefix_pallas = lambda *a: orig_pref(*a[:-1], True)
        orig_ln_fwd, orig_ln_bwd = ln_mod._fwd_call, ln_mod._bwd_call
        orig_ln_primal = ln_mod._fwd_call_primal
        nf._ffn_pallas = lambda *a: orig_ffn(*a[:-1], True)
        nf._expand_pallas = lambda *a: orig_exp(*a[:-1], True)
        ln_mod._fwd_call = lambda *a: orig_ln_fwd(*a[:-1], True)
        ln_mod._bwd_call = lambda *a: orig_ln_bwd(*a[:-1], True)
        ln_mod._fwd_call_primal = lambda *a: orig_ln_primal(*a[:-1], True)
        enable_pallas(True)
        try:
            fused, _ = net.apply(params, x)
        finally:
            enable_pallas(False)
            _na._NAF_BLOCK_KERNEL = block_was
            nf._ffn_pallas = orig_ffn
            nf._expand_pallas = orig_exp
            npf._prefix_pallas = orig_pref
            ln_mod._fwd_call, ln_mod._bwd_call = orig_ln_fwd, orig_ln_bwd
            ln_mod._fwd_call_primal = orig_ln_primal
        np.testing.assert_allclose(np.asarray(fused), np.asarray(base), atol=2e-5)


class TestWindowAttention:
    def test_fused_matches_reference(self, rng):
        from dcpt_tpu.ops.window_attention import fused_window_attention, window_attention_ref

        nw, n, c, heads = 8, 64, 128, 4
        x = jnp.asarray(rng.standard_normal((nw, n, c)).astype(np.float32) * 0.2)
        wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)).astype(np.float32) * 0.05)
        bqkv = jnp.asarray(rng.standard_normal(3 * c).astype(np.float32) * 0.02)
        wproj = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * 0.05)
        bproj = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.02)
        fused = fused_window_attention(x, wqkv, bqkv, wproj, bproj, heads, True)
        ref = window_attention_ref(x, wqkv, bqkv, wproj, bproj, heads)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-5)

    def test_fused_matches_reference_c180(self, rng):
        """The shipped SwinIR's lane-unaligned dims: embed_dim 180, 6×30 heads."""
        from dcpt_tpu.ops.window_attention import fused_window_attention, window_attention_ref

        nw, n, c, heads = 6, 64, 180, 6
        x = jnp.asarray(rng.standard_normal((nw, n, c)).astype(np.float32) * 0.2)
        wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)).astype(np.float32) * 0.05)
        bqkv = jnp.asarray(rng.standard_normal(3 * c).astype(np.float32) * 0.02)
        wproj = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * 0.05)
        bproj = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.02)
        fused = fused_window_attention(x, wqkv, bqkv, wproj, bproj, heads, True)
        ref = window_attention_ref(x, wqkv, bqkv, wproj, bproj, heads)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-5)

    def test_fused_bf16_matches_reference(self, rng):
        """bf16 I/O with fp32 in-kernel compute (VERDICT r2 item 4): the
        kernel upcasts at the VMEM load, so its output matches the fp32
        reference on the bf16-rounded inputs to fp32-accumulate tolerance."""
        from dcpt_tpu.ops.window_attention import fused_window_attention, window_attention_ref

        nw, n, c, heads = 6, 64, 180, 6
        x = jnp.asarray(rng.standard_normal((nw, n, c)).astype(np.float32) * 0.2).astype(jnp.bfloat16)
        wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)).astype(np.float32) * 0.05).astype(jnp.bfloat16)
        bqkv = jnp.asarray(rng.standard_normal(3 * c).astype(np.float32) * 0.02).astype(jnp.bfloat16)
        wproj = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * 0.05).astype(jnp.bfloat16)
        bproj = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.02).astype(jnp.bfloat16)
        fused = fused_window_attention(x, wqkv, bqkv, wproj, bproj, heads, True)
        assert fused.dtype == jnp.bfloat16
        ref = window_attention_ref(
            *(a.astype(jnp.float32) for a in (x, wqkv, bqkv, wproj, bproj)), heads
        )
        # output rounds to bf16 once at the store; inputs share the same
        # bf16 rounding → only the final store differs from the fp32 math
        np.testing.assert_allclose(
            np.asarray(fused, dtype=np.float32), np.asarray(ref), atol=1e-2, rtol=1e-2
        )

    def test_fused_swin_block_matches_reference(self, rng):
        """v3 whole-block kernel == jnp composition at the shipped dims."""
        from dcpt_tpu.ops.window_attention import fused_swin_block, swin_block_ref

        nw, n, c, heads = 6, 64, 180, 6
        hid = int(c * 2.0)
        x = jnp.asarray(rng.standard_normal((nw, n, c)).astype(np.float32) * 0.2)
        a = lambda *shape: jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.05)
        args = (x, jnp.ones(c), jnp.zeros(c), a(c, 3 * c), a(3 * c), a(c, c), a(c),
                jnp.ones(c), jnp.zeros(c), a(c, hid), a(hid), a(hid, c), a(c))
        fused = fused_swin_block(*args, heads, 1e-5, True)
        ref = swin_block_ref(*args, heads, 1e-5)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-5)

    def _swin_block_args(self, rng, nw=4, n=16, c=16, heads=4):
        hid = 2 * c
        a = lambda *shape: jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.1)
        x = jnp.asarray(rng.standard_normal((nw, n, c)).astype(np.float32) * 0.2)
        return x, (a(c) + 1.0, a(c), a(c, 3 * c), a(3 * c), a(c, c), a(c),
                   a(c) + 1.0, a(c), a(c, hid), a(hid), a(hid, c), a(c))

    @pytest.mark.parametrize("t", [1, 2, 4])
    def test_swin_analytic_backward_matches_vjp(self, rng, t):
        """Single-pass analytic Pallas backward == jax.vjp of the twin on all
        13 cotangents (interpret), incl. the per-head masked-lane softmax
        backward and the degenerate one-tile grid."""
        from dcpt_tpu.ops.swin_block_bwd import swin_block_bwd
        from dcpt_tpu.ops.window_attention import swin_block_ref

        x, rest = self._swin_block_args(rng)
        args = (x,) + rest
        out, vjp = jax.vjp(lambda *a: swin_block_ref(*a, 4, 1e-5), *args)
        dz = jnp.asarray(rng.standard_normal(out.shape).astype(np.float32))
        ref = vjp(dz)
        got = swin_block_bwd(*args, dz, 4, 1e-5, t, interpret=True)
        assert len(got) == len(ref) == 13
        for i, (a, b) in enumerate(zip(got, ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4,
                err_msg=f"cotangent {i} mismatch")

    def test_swin_analytic_backward_bf16(self, rng):
        """bf16 inputs (the mixed train path, auto-on per the A/B): the
        analytic kernel upcasts to fp32 internally, so its bf16 cotangents
        must equal the EXACT fp32 gradient evaluated at the bf16-rounded
        inputs (to bf16 output rounding) — the property that makes the
        mixed-precision auto default safe (PARITY 'Analytic Pallas SwinBlock
        backward')."""
        from dcpt_tpu.ops.swin_block_bwd import swin_block_bwd
        from dcpt_tpu.ops.window_attention import swin_block_ref

        x, rest = self._swin_block_args(rng)
        bargs = tuple(a.astype(jnp.bfloat16) for a in ((x,) + rest))
        rargs = tuple(a.astype(jnp.float32) for a in bargs)  # exact rounded point
        out, vjp = jax.vjp(lambda *a: swin_block_ref(*a, 4, 1e-5), *rargs)
        dz = jnp.asarray(rng.standard_normal(out.shape).astype(np.float32))
        bdz = dz.astype(jnp.bfloat16)
        ref = [np.asarray(r) for r in vjp(bdz.astype(jnp.float32))]

        got = swin_block_bwd(*bargs, bdz, 4, 1e-5, 2, interpret=True)
        assert len(got) == len(ref) == 13
        for i, (a, b) in enumerate(zip(got, ref)):
            scale = max(np.abs(b).max(), 1e-3)
            err = np.abs(np.asarray(a, np.float32) - b).max() / scale
            assert err < 1e-2, f"cotangent {i}: analytic bf16 err {err}"

    def test_swin_fused_vjp_env_flag_routes_analytic(self, rng, monkeypatch):
        """DCPT_TPU_SWIN_BWD=1: grads through fused_swin_block come from the
        analytic kernel and still match the twin's autodiff."""
        from dcpt_tpu.ops.window_attention import fused_swin_block, swin_block_ref

        monkeypatch.setenv("DCPT_TPU_SWIN_BWD", "1")
        monkeypatch.setenv("DCPT_TPU_SWIN_BWD_T", "2")
        x, rest = self._swin_block_args(rng)

        def loss(fn, x, wqkv, wfc1):
            a = (x,) + rest[:2] + (wqkv,) + rest[3:8] + (wfc1,) + rest[9:]
            return jnp.sum(fn(*a) ** 2)

        fused = lambda *a: fused_swin_block(*a, 4, 1e-5, True)
        ref = lambda *a: swin_block_ref(*a, 4, 1e-5)
        g1 = jax.grad(lambda *v: loss(fused, *v), argnums=(0, 1, 2))(x, rest[2], rest[8])
        g2 = jax.grad(lambda *v: loss(ref, *v), argnums=(0, 1, 2))(x, rest[2], rest[8])
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4)

    def test_swinir_with_block_kernel_matches(self, rng, monkeypatch):
        """Whole SwinIR forward identical with the v3 block-kernel path."""
        from dcpt_tpu.archs import swinir_arch
        from dcpt_tpu.archs.swinir_arch import SwinIR
        from dcpt_tpu.ops import enable_pallas
        import dcpt_tpu.ops.window_attention as wa

        net = SwinIR(img_size=16, embed_dim=128, depths=(2, 2), num_heads=(4, 4),
                     window_size=8, mlp_ratio=2.0, upscale=1, upsampler="")
        x = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
        params = net.init(jax.random.PRNGKey(0), x)
        base, _ = net.apply(params, x)

        orig = wa._swin_block_pallas
        monkeypatch.setattr(
            wa, "_swin_block_pallas",
            lambda *a: orig(*a[:-1], True),  # force interpret on CPU
        )
        monkeypatch.setattr(swinir_arch, "_SWIN_BLOCK_KERNEL", True)
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        import dcpt_tpu.ops as ops_mod
        enable_pallas("auto")
        try:
            fused, _ = net.apply(params, x)
        finally:
            enable_pallas(False)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(base), atol=2e-5)

    def test_swinir_with_fused_attention_matches(self, rng):
        from dcpt_tpu.archs.swinir_arch import SwinIR
        from dcpt_tpu.ops import enable_pallas
        import dcpt_tpu.ops.window_attention as wa
        import dcpt_tpu.ops.layernorm2d as ln_mod

        net = SwinIR(img_size=16, embed_dim=128, depths=(1, 1, 1, 1, 1, 1), num_heads=(4,) * 6, window_size=8, mlp_ratio=2.0, upscale=1, upsampler="")
        x = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
        params = net.init(jax.random.PRNGKey(0), x)
        base, _ = net.apply(params, x)

        from dcpt_tpu.archs import swinir_arch as _sa

        orig = wa._wa_pallas
        wa._wa_pallas = lambda *a, **kw: orig(*a[:-1], True, **kw)
        block_was = _sa._SWIN_BLOCK_KERNEL
        _sa._SWIN_BLOCK_KERNEL = False  # pin the v2 attention path under test
        enable_pallas(True)
        try:
            fused, _ = net.apply(params, x)
        finally:
            enable_pallas(False)
            wa._wa_pallas = orig
            _sa._SWIN_BLOCK_KERNEL = block_was
        np.testing.assert_allclose(np.asarray(fused), np.asarray(base), atol=2e-5)

    def test_swinir_fused_attention_unaligned_dims(self, rng):
        """Masked-head path through the arch: embed_dim 24, 3×8 heads (neither
        lane-aligned) — the same code path the shipped c=180 model takes."""
        from dcpt_tpu.archs.swinir_arch import SwinIR
        from dcpt_tpu.ops import enable_pallas
        import dcpt_tpu.ops.window_attention as wa

        net = SwinIR(img_size=16, embed_dim=24, depths=(2, 2), num_heads=(3, 3), window_size=8, mlp_ratio=2.0, upscale=1, upsampler="")
        x = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
        params = net.init(jax.random.PRNGKey(0), x)
        base, _ = net.apply(params, x)

        from dcpt_tpu.archs import swinir_arch as _sa

        orig = wa._wa_pallas
        wa._wa_pallas = lambda *a, **kw: orig(*a[:-1], True, **kw)
        block_was = _sa._SWIN_BLOCK_KERNEL
        _sa._SWIN_BLOCK_KERNEL = False
        enable_pallas(True)
        try:
            fused, _ = net.apply(params, x)
        finally:
            enable_pallas(False)
            _sa._SWIN_BLOCK_KERNEL = block_was
            wa._wa_pallas = orig
        np.testing.assert_allclose(np.asarray(fused), np.asarray(base), atol=2e-5)

    def test_naf_expand_matches(self, rng):
        from dcpt_tpu.ops.naf_ffn import naf_expand, naf_expand_ref

        c, dw = 128, 256
        x = jnp.asarray(rng.standard_normal((2, 8, 8, c)).astype(np.float32))
        ln_w = jnp.asarray(1 + 0.1 * rng.standard_normal(c).astype(np.float32))
        ln_b = jnp.asarray(0.1 * rng.standard_normal(c).astype(np.float32))
        w1 = jnp.asarray(rng.standard_normal((c, dw)).astype(np.float32) * 0.05)
        b1 = jnp.asarray(rng.standard_normal(dw).astype(np.float32) * 0.05)
        fused = naf_expand(x, ln_w, ln_b, w1, b1, 1e-6, True)
        ref = naf_expand_ref(x.reshape(-1, c), ln_w, ln_b, w1, b1).reshape(2, 8, 8, dw)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-5)

        g1 = jax.grad(lambda x: jnp.sum(naf_expand(x, ln_w, ln_b, w1, b1, 1e-6, True) ** 2))(x)
        g2 = jax.grad(lambda x: jnp.sum(naf_expand_ref(x.reshape(-1, c), ln_w, ln_b, w1, b1) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-3)


class TestLnProj:
    @pytest.mark.parametrize("biasfree", [True, False])
    def test_fused_matches_reference(self, rng, biasfree):
        from dcpt_tpu.ops.ln_proj import fused_ln_proj, ln_proj_ref

        c, cout = 48, 144
        x = jnp.asarray(rng.standard_normal((2, 8, 8, c)).astype(np.float32))
        ln_w = jnp.asarray(1 + 0.1 * rng.standard_normal(c).astype(np.float32))
        ln_b = jnp.zeros(c) if biasfree else jnp.asarray(0.1 * rng.standard_normal(c).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((c, cout)).astype(np.float32) * 0.05)
        fused = fused_ln_proj(x, ln_w, ln_b, w, 1e-5, biasfree, True)
        ref = ln_proj_ref(x.reshape(-1, c), ln_w, ln_b, w, 1e-5, biasfree).reshape(2, 8, 8, cout)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-5)

        g1 = jax.grad(lambda x: jnp.sum(fused_ln_proj(x, ln_w, ln_b, w, 1e-5, biasfree, True) ** 2))(x)
        g2 = jax.grad(lambda x: jnp.sum(ln_proj_ref(x.reshape(-1, c), ln_w, ln_b, w, 1e-5, biasfree) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-3)

    @pytest.mark.parametrize("biasfree_mode", [True, False])
    def test_mdta_pre_norm_path_matches(self, rng, biasfree_mode):
        """MDTA(pre_norm=...) on raw input == MDTA(ChannelLayerNorm(x))."""
        from dcpt_tpu.archs.restormer_arch import MDTA, ChannelLayerNorm
        import dcpt_tpu.ops.ln_proj as lp

        c = 32
        x = jnp.asarray(rng.random((1, 8, 8, c)).astype(np.float32))
        mdta = MDTA(c, 2)
        norm = ChannelLayerNorm(c, bias=not biasfree_mode)
        nv = norm.init(jax.random.PRNGKey(0), x)
        mv = mdta.init(jax.random.PRNGKey(1), norm.apply(nv, x))
        base = mdta.apply(mv, norm.apply(nv, x))

        ln_w = nv["params"]["weight"]
        ln_b = nv["params"].get("bias", jnp.zeros(c))
        orig = lp._lp_pallas
        lp._lp_pallas = lambda *a: orig(*a[:-1], True)
        try:
            # pre_norm fuses the same params; qkv params shared via the tree
            fused = mdta.apply(mv, x, pre_norm=(ln_w, ln_b, 1e-6, biasfree_mode))
        finally:
            lp._lp_pallas = orig
        np.testing.assert_allclose(np.asarray(fused), np.asarray(base), atol=3e-5)


class TestPallasGatingPolicy:
    def test_tri_state_modes(self, monkeypatch):
        """DCPT_TPU_PALLAS: unset→auto (winners on TPU), 0→kill-switch, 1→all."""
        import jax

        import dcpt_tpu.ops as ops

        orig = ops.pallas_mode()
        try:
            ops.enable_pallas("auto")
            assert not ops.pallas_enabled()  # opt-in kernels stay off
            monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
            assert ops.pallas_winner_enabled()
            monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
            assert not ops.pallas_winner_enabled()

            ops.enable_pallas(False)
            assert not ops.pallas_enabled() and not ops.pallas_winner_enabled()
            ops.enable_pallas(True)
            assert ops.pallas_enabled() and ops.pallas_winner_enabled()
        finally:
            ops.enable_pallas(orig)


class TestNafBlockFused:
    @pytest.mark.parametrize("variant", ["v1", "v2"])
    def test_matches_reference_kernel(self, rng, variant):
        """Two-phase whole-NAFBlock kernel == jnp composition (interpret) —
        both the v1 (overlap-copy + g spill) and v2 (halo-pairs +
        recompute-prefix) implementations, incl. the n_t==1 degenerate tile."""
        import dcpt_tpu.ops.naf_block as nb

        b, h, w, c = 2, 16, 8, 8
        dw, ffn = 2 * c, 2 * c
        a = lambda *shape: jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.1)
        x = a(b, h, w, c)
        args = (x, jnp.ones(c), jnp.zeros(c), a(c, dw), a(dw), a(3, 3, dw), a(dw),
                a(dw // 2, dw // 2), a(dw // 2), a(dw // 2, c), a(c), a(c) + 0.5,
                jnp.ones(c), jnp.zeros(c), a(c, ffn), a(ffn), a(ffn // 2, c), a(c), a(c) + 0.5)
        impl = nb._block_pallas_v1 if variant == "v1" else nb._block_pallas_v2
        ref = nb.naf_block_ref(*args, 1e-6)
        for th in (8, h):
            fused = impl(*args, 1e-6, th, True)
            np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-5)

    def test_matches_reference_kernel_grads(self, rng):
        from dcpt_tpu.ops.naf_block import naf_block_fused, naf_block_ref

        b, h, w, c = 1, 8, 8, 8
        dw, ffn = 2 * c, 2 * c
        a = lambda *shape: jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.1)
        x = a(b, h, w, c)
        rest = (jnp.ones(c), jnp.zeros(c), a(c, dw), a(dw), a(3, 3, dw), a(dw),
                a(dw // 2, dw // 2), a(dw // 2), a(dw // 2, c), a(c), a(c) + 0.5,
                jnp.ones(c), jnp.zeros(c), a(c, ffn), a(ffn), a(ffn // 2, c), a(c), a(c) + 0.5)
        g1 = jax.grad(lambda x: jnp.sum(naf_block_fused(x, *rest, 1e-6, 8, True) ** 2))(x)
        g2 = jax.grad(lambda x: jnp.sum(naf_block_ref(x, *rest, 1e-6) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)

    def _block_args(self, rng, b=2, h=16, w=8, c=8):
        dw, ffn = 2 * c, 2 * c
        a = lambda *shape: jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.1)
        x = a(b, h, w, c)
        return (x, a(c) + 1.0, a(c), a(c, dw), a(dw), a(3, 3, dw), a(dw),
                a(dw // 2, dw // 2), a(dw // 2), a(dw // 2, c), a(c), a(c) + 0.5,
                a(c) + 1.0, a(c), a(c, ffn), a(ffn), a(ffn // 2, c), a(c), a(c) + 0.5)

    @pytest.mark.parametrize("th", [8, 16])
    def test_analytic_backward_matches_vjp(self, rng, th):
        """Hand-derived two-pass Pallas backward == jax.vjp of the twin on all
        19 cotangents (interpret), incl. the n_t==1 degenerate tile and the
        SCA global-coupling path."""
        from dcpt_tpu.ops.naf_block import naf_block_ref
        from dcpt_tpu.ops.naf_block_bwd import naf_block_bwd
        from dcpt_tpu.ops.naf_prefix import naf_prefix_ref

        args = self._block_args(rng)
        x, n1w, n1b, w1, b1, wdw, bdw, wsca, bsca = args[:9]
        out, vjp = jax.vjp(lambda *a: naf_block_ref(*a, 1e-6), *args)
        dz = jnp.asarray(rng.standard_normal(out.shape).astype(np.float32))
        ref = vjp(dz)
        g = naf_prefix_ref(x, n1w, n1b, w1, b1, wdw, bdw, 1e-6)
        pooled = jnp.mean(g, axis=(1, 2))
        att = pooled @ wsca + bsca
        got = naf_block_bwd(*args, pooled, att, dz, 1e-6, th, interpret=True)
        assert len(got) == len(ref) == 19
        for i, (a, b) in enumerate(zip(got, ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4,
                err_msg=f"cotangent {i} mismatch")

    def test_fused_vjp_env_flag_routes_analytic(self, rng, monkeypatch):
        """DCPT_TPU_NAF_BWD=1: grads through naf_block_fused come from the
        analytic kernel and still match the twin's autodiff."""
        from dcpt_tpu.ops.naf_block import naf_block_fused, naf_block_ref

        monkeypatch.setenv("DCPT_TPU_NAF_BWD", "1")
        args = self._block_args(rng)

        def loss_fused(x, w1, beta):
            a = (x,) + args[1:3] + (w1,) + args[4:11] + (beta,) + args[12:]
            return jnp.sum(naf_block_fused(*a, 1e-6, 8, True) ** 2)

        def loss_ref(x, w1, beta):
            a = (x,) + args[1:3] + (w1,) + args[4:11] + (beta,) + args[12:]
            return jnp.sum(naf_block_ref(*a, 1e-6) ** 2)

        g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(args[0], args[3], args[11])
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(args[0], args[3], args[11])
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4)

    def test_nafnet_with_block_kernel_matches(self, rng, monkeypatch):
        """Whole NAFNet forward identical with the fused-block path — same
        param tree, checkpoint-interchangeable."""
        from dcpt_tpu.archs import nafnet_arch
        from dcpt_tpu.archs.nafnet_arch import NAFNetBaseline
        from dcpt_tpu.ops import enable_pallas
        import dcpt_tpu.ops.naf_block as nb

        net = NAFNetBaseline(width=8, enc_blk_nums=(1, 1), middle_blk_num=1, dec_blk_nums=(1, 1), window_size=4)
        x = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
        params = net.init(jax.random.PRNGKey(0), x)["params"]
        # beta/gamma init to ZERO (identity blocks) — perturb so the fused
        # path is actually distinguishable
        params = jax.tree_util.tree_map_with_path(
            lambda path, a: jnp.full_like(a, 0.6) if path[-1].key in ("beta", "gamma") else a, params)
        base, _ = net.apply({"params": params}, x)

        orig = nb._block_pallas
        monkeypatch.setattr(nb, "_block_pallas", lambda *a: orig(*a[:-1], True))
        monkeypatch.setattr(nafnet_arch, "_NAF_BLOCK_KERNEL", True)
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        enable_pallas("auto")
        try:
            fused, _ = net.apply({"params": params}, x)
        finally:
            enable_pallas(False)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(base), atol=3e-5)


class TestMDTABlockFused:
    def _args(self, rng, b=2, h=16, w=8, c=12, heads=3):
        hidden = int(c * 2.66)
        a = lambda *shape: jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.1)
        x = a(b, h, w, c)
        rest = (a(c) + 1.0, a(c), a(c, 3 * c), a(3, 3, 3 * c), a(heads, 1, 1) + 1.0,
                a(c, c), a(c) + 1.0, a(c), a(c, 2 * hidden), a(3, 3, 2 * hidden), a(hidden, c))
        return x, rest

    @pytest.mark.parametrize("use_softmax,ln_bias,eps", [(False, False, 1e-6), (True, True, 1e-5)])
    def test_matches_ref(self, rng, use_softmax, ln_bias, eps):
        """Two-phase whole-TransformerBlock kernel == jnp twin (interpret),
        both the Restormer (ReLU/BiasFree) and PromptIR (softmax/WithBias)
        flavours, incl. the n_t==1 degenerate tile."""
        from dcpt_tpu.ops.mdta_block import _block_pallas, mdta_block_ref

        x, rest = self._args(rng)
        ref = mdta_block_ref(x, *rest, 3, use_softmax, ln_bias, eps)
        for th in (8, 16):
            fused = _block_pallas(x, *rest, 3, use_softmax, ln_bias, eps, th, True)
            np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=5e-5)
        # column slabs (W=8 split 2/4-wide): slab-edge dwconv halos + border
        # zero-pad must reproduce the full-width result exactly
        for sw in (2, 4):
            fused = _block_pallas(x, *rest, 3, use_softmax, ln_bias, eps, 8, True, sw)
            np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=5e-5)

    def test_pick_tiles_real_shapes(self, monkeypatch):
        """128px keeps its measured full-width tiling; the measured-loser
        column slabs (PARITY "MDTA column-slab A/B") need the opt-in env."""
        from dcpt_tpu.ops.mdta_block import pick_tiles

        assert pick_tiles(128, 128, 48, 127) == (8, 128)  # measured A/B config
        assert pick_tiles(64, 64, 96, 255)[0] >= 8  # level-2, winner region
        # measured-loser shapes (256px th=4 full width; 488×328 slabs —
        # PARITY "MDTA big-shape A/B") default to the XLA path
        assert pick_tiles(256, 256, 48, 127) is None
        assert pick_tiles(488, 328, 48, 127) is None
        # ... and are reachable via the opt-in env for re-measurement
        monkeypatch.setenv("DCPT_TPU_MDTA_SLABS", "1")
        assert pick_tiles(256, 256, 48, 127) == (4, 256)
        for h, w, c, f2 in ((488, 328, 48, 127), (384, 384, 48, 127),
                            (122, 82, 192, 510), (360, 640, 96, 255)):
            th, sw = pick_tiles(h, w, c, f2)
            assert h % th == 0 and w % sw == 0 and sw < w, (h, w, th, sw)
        monkeypatch.delenv("DCPT_TPU_MDTA_SLABS")
        for h, w, c, f2 in ((488, 328, 48, 127), (384, 384, 48, 127),
                            (122, 82, 192, 510), (360, 640, 96, 255)):
            assert pick_tiles(h, w, c, f2) is None, (h, w)

    def test_grads_delegate_to_twin(self, rng):
        from dcpt_tpu.ops.mdta_block import mdta_block_fused, mdta_block_ref

        x, rest = self._args(rng, b=1, h=8)
        g1 = jax.grad(lambda x: jnp.sum(mdta_block_fused(x, *rest, 3, False, False, 1e-6, 8, True) ** 2))(x)
        g2 = jax.grad(lambda x: jnp.sum(mdta_block_ref(x, *rest, 3, False, False, 1e-6) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)

    @pytest.mark.parametrize("use_softmax,ln_bias,eps,th",
                             [(False, False, 1e-6, 4), (True, True, 1e-5, 8),
                              (False, False, 1e-6, 16)])
    def test_analytic_backward_matches_vjp(self, rng, use_softmax, ln_bias, eps, th):
        """Hand-derived two-pass Pallas backward == jax.vjp of the twin on all
        12 cotangents (interpret), both flavours (Restormer ReLU/BiasFree and
        PromptIR softmax/WithBias), incl. the n_t==1 degenerate tile and the
        global attention/L2-norm coupling paths."""
        from dcpt_tpu.ops.mdta_block import _block_pallas, mdta_block_ref
        from dcpt_tpu.ops.mdta_block_bwd import mdta_block_bwd

        x, rest = self._args(rng)
        args = (x,) + rest
        out, vjp = jax.vjp(lambda *a: mdta_block_ref(*a, 3, use_softmax, ln_bias, eps), *args)
        dz = jnp.asarray(rng.standard_normal(out.shape).astype(np.float32))
        ref = vjp(dz)
        _, v, gram, qn2, kn2, attn = _block_pallas(
            *args, 3, use_softmax, ln_bias, eps, 8, True, None, with_res=True)
        got = mdta_block_bwd(*args, v, gram, qn2, kn2, attn, dz,
                             3, use_softmax, ln_bias, eps, th, interpret=True)
        assert len(got) == len(ref) == 12
        for i, (a, b) in enumerate(zip(got, ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4,
                err_msg=f"cotangent {i} mismatch")

    def test_analytic_backward_bf16(self, rng):
        """bf16 inputs (the mixed train path, auto-on per the A/B): the
        analytic kernel upcasts to fp32 internally, so its bf16 cotangents
        must equal the EXACT fp32 gradient evaluated at the bf16-rounded
        inputs (to bf16 output rounding) — measured identical to 4 decimals;
        comparing against the unrounded oracle instead only bounds the
        block's own gradient sensitivity to input rounding, not kernel
        correctness."""
        from dcpt_tpu.ops.mdta_block import _block_pallas, mdta_block_ref
        from dcpt_tpu.ops.mdta_block_bwd import mdta_block_bwd

        x, rest = self._args(rng)
        bargs = tuple(a.astype(jnp.bfloat16) for a in ((x,) + rest))
        rargs = tuple(a.astype(jnp.float32) for a in bargs)  # exact rounded point
        out, vjp = jax.vjp(lambda *a: mdta_block_ref(*a, 3, False, False, 1e-6), *rargs)
        dz = jnp.asarray(rng.standard_normal(out.shape).astype(np.float32))
        bdz = dz.astype(jnp.bfloat16)
        ref = [np.asarray(r) for r in vjp(bdz.astype(jnp.float32))]

        _, v, gram, qn2, kn2, attn = _block_pallas(
            *bargs, 3, False, False, 1e-6, 8, True, None, with_res=True)
        got = mdta_block_bwd(*bargs, v, gram, qn2, kn2, attn, bdz,
                             3, False, False, 1e-6, 8, interpret=True)
        assert len(got) == len(ref) == 12
        for i, (a, b) in enumerate(zip(got, ref)):
            scale = max(np.abs(b).max(), 1e-3)
            err = np.abs(np.asarray(a, np.float32) - b).max() / scale
            assert err < 1e-2, f"cotangent {i}: analytic bf16 err {err}"

    def test_fused_vjp_env_flag_routes_analytic(self, rng, monkeypatch):
        """DCPT_TPU_MDTA_BWD=1: grads through mdta_block_fused come from the
        analytic kernel and still match the twin's autodiff."""
        from dcpt_tpu.ops.mdta_block import mdta_block_fused, mdta_block_ref

        monkeypatch.setenv("DCPT_TPU_MDTA_BWD", "1")
        monkeypatch.setenv("DCPT_TPU_MDTA_BWD_TH", "8")
        x, rest = self._args(rng)

        def loss(fn, x, wqkv, temp):
            a = (x,) + rest[:2] + (wqkv, rest[3], temp) + rest[5:]
            return jnp.sum(fn(*a) ** 2)

        fused = lambda *a: mdta_block_fused(*a, 3, True, True, 1e-5, 8, True)
        ref = lambda *a: mdta_block_ref(*a, 3, True, True, 1e-5)
        g1 = jax.grad(lambda *v: loss(fused, *v), argnums=(0, 1, 2))(x, rest[2], rest[4])
        g2 = jax.grad(lambda *v: loss(ref, *v), argnums=(0, 1, 2))(x, rest[2], rest[4])
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4)

    @pytest.mark.parametrize("variant", ["restormer", "promptir"])
    def test_ref_matches_module(self, rng, variant):
        """The jnp twin == the flax TransformerBlock module forward, with the
        module's own initialized params — validates the twin's LN eps /
        ReLU-vs-softmax / exact-erf GELU semantics against the parity-tested
        module path (reference basicsr/archs/restormer_arch.py:75-145)."""
        from dcpt_tpu.archs.promptir_arch import PromptTransformerBlock
        from dcpt_tpu.archs.restormer_arch import TransformerBlock
        from dcpt_tpu.ops.mdta_block import mdta_block_ref

        c, heads, hidden = 12, 3, int(12 * 2.66)
        if variant == "restormer":
            blk = TransformerBlock(c, heads, layernorm_bias=False, use_softmax=False)
            use_softmax, ln_bias, eps = False, False, 1e-6
        else:
            blk = PromptTransformerBlock(c, heads, layernorm_bias=True)
            use_softmax, ln_bias, eps = True, True, 1e-5
        x = jnp.asarray(rng.standard_normal((2, 16, 8, c)).astype(np.float32) * 0.3)
        params = blk.init(jax.random.PRNGKey(7), x)["params"]
        base = blk.apply({"params": params}, x)

        p = params
        zeros = jnp.zeros((c,), jnp.float32)
        args = (
            x,
            p["norm1"]["weight"], p["norm1"].get("bias", zeros),
            p["attn"]["qkv"]["kernel"].reshape(c, 3 * c),
            p["attn"]["qkv_dwconv"]["kernel"].reshape(3, 3, 3 * c),
            p["attn"]["temperature"],
            p["attn"]["project_out"]["kernel"].reshape(c, c),
            p["norm2"]["weight"], p["norm2"].get("bias", zeros),
            p["ffn"]["project_in"]["kernel"].reshape(c, 2 * hidden),
            p["ffn"]["dwconv"]["kernel"].reshape(3, 3, 2 * hidden),
            p["ffn"]["project_out"]["kernel"].reshape(hidden, c),
        )
        got = mdta_block_ref(*args, heads, use_softmax, ln_bias, eps)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=3e-5)

    @pytest.mark.parametrize("variant", ["restormer", "promptir"])
    def test_arch_with_block_kernel_matches(self, rng, monkeypatch, variant):
        """Whole Restormer/PromptIR forward identical with the fused-block
        path — same param tree, checkpoint-interchangeable."""
        from dcpt_tpu.archs import restormer_arch
        from dcpt_tpu.ops import enable_pallas
        import dcpt_tpu.ops.mdta_block as mb

        if variant == "restormer":
            from dcpt_tpu.archs.restormer_arch import Restormer

            net = Restormer(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1, heads=(1, 2, 4, 8))
        else:
            from dcpt_tpu.archs.promptir_arch import PromptIR

            net = PromptIR(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1, heads=(1, 2, 4, 8))
        x = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
        params = net.init(jax.random.PRNGKey(0), x)["params"]
        base, _ = net.apply({"params": params}, x)

        orig = mb._block_pallas
        monkeypatch.setattr(mb, "_block_pallas", lambda *a: orig(*a[:-2], True, a[-1]))
        monkeypatch.setattr(restormer_arch, "_mdta_block_on", lambda dtype: True)
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        enable_pallas("auto")
        try:
            fused, _ = net.apply({"params": params}, x)
        finally:
            enable_pallas(False)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(base), atol=5e-5)


class TestBf16LayerNormStats:
    """Mixed-precision LN contract: statistics are computed in fp32 even for
    bf16 tensors — in the arch LayerNorm modules AND in the kernels' jnp
    twins (the twins ARE the bf16 train-step graph via custom-VJP _fwd
    delegation).  The probe uses mean-8 inputs: a bf16 mean carries ~ulp(8)/2
    = 0.016 rounding, i.e. ~6% of the 0.25 feature scale after
    normalisation, while the fp32-stat path is exact to ~1e-3."""

    OFFSET, SCALE = 8.0, 0.25

    def _probe(self, rng, shape):
        x64 = self.OFFSET + self.SCALE * rng.standard_normal(shape)
        xb = jnp.asarray(x64, jnp.float32).astype(jnp.bfloat16)
        return xb, np.asarray(xb.astype(jnp.float32), np.float64)

    @staticmethod
    def _ln64(x64, eps, centred_out=True):
        mu = x64.mean(-1, keepdims=True)
        var = ((x64 - mu) ** 2).mean(-1, keepdims=True)
        top = (x64 - mu) if centred_out else x64
        return top / np.sqrt(var + eps)

    @pytest.mark.parametrize(
        "make",
        [
            pytest.param(lambda c: ("arch_util", "LayerNorm2d", dict(channels=c), 1e-6, True), id="LayerNorm2d"),
            pytest.param(lambda c: ("swinir_arch", "TorchLayerNorm", dict(dim=c), 1e-5, True), id="TorchLayerNorm"),
            # (the biasfree branches share these classes' mu/var code path but
            # return UN-centred ~offset/std-scale outputs whose bf16 store
            # rounding alone exceeds any stats-sensitive tolerance — the
            # centred variants are the meaningful probe)
            pytest.param(lambda c: ("restormer_arch", "ChannelLayerNorm", dict(dim=c, bias=True), 1e-6, True), id="ChannelLayerNorm"),
            pytest.param(lambda c: ("promptir_arch", "ChannelLayerNorm5", dict(dim=c, bias=True), 1e-5, True), id="ChannelLayerNorm5"),
        ],
    )
    def test_arch_layernorms_fp32_stats(self, rng, make):
        import importlib

        c = 24
        modname, clsname, kwargs, eps, centred = make(c)
        cls = getattr(importlib.import_module(f"dcpt_tpu.archs.{modname}"), clsname)
        ln = cls(**kwargs)
        xb, x64 = self._probe(rng, (2, 4, 6, c))
        params = ln.init(jax.random.PRNGKey(0), xb)  # weight=1, bias=0 init
        got = np.asarray(ln.apply(params, xb).astype(jnp.float32), np.float64)
        want = self._ln64(x64, eps, centred)
        # fp32 stats: only the output's bf16 store rounds (≲0.5% of unit
        # scale); bf16 stats would sit at ~6% — an order of magnitude out
        assert np.abs(got - want).max() < 2e-2

    def test_swin_block_twin_fp32_stats(self, rng):
        """swin_block_ref with identity MLP and zeroed attention reduces to
        x + GELU(LN2(x)) — exposing the twin's LN numerics directly."""
        from dcpt_tpu.ops.window_attention import swin_block_ref

        nw, n, c = 2, 16, 24
        xb, x64 = self._probe(rng, (nw, n, c))
        zc, ic = jnp.zeros((c,), jnp.bfloat16), jnp.eye(c, dtype=jnp.bfloat16)
        out = swin_block_ref(
            xb, jnp.ones((c,), jnp.bfloat16), zc,          # ln1
            jnp.zeros((c, 3 * c), jnp.bfloat16), jnp.zeros((3 * c,), jnp.bfloat16),  # qkv -> 0
            jnp.zeros((c, c), jnp.bfloat16), zc,            # proj -> attn == 0
            jnp.ones((c,), jnp.bfloat16), zc,               # ln2
            ic, zc, ic, zc,                                  # identity MLP
            num_heads=4,
        )
        got = np.asarray(out.astype(jnp.float32), np.float64) - x64
        ln = self._ln64(x64, 1e-5)
        want = 0.5 * ln * (1.0 + np.vectorize(math.erf)(ln / np.sqrt(2.0)))
        # the twin's final residual add stores in bf16 at the offset-8 scale
        # (ulp 0.0625 > the stats signal) — push the expectation through the
        # same store, then allow one-ulp tie-rounding from the intermediate
        # bf16 stores on a tiny fraction of elements.  bf16 STATISTICS would
        # shift most elements by 1–3 grid steps (mean error ~0.17 σ), so this
        # still discriminates.
        want_q = np.asarray(
            jnp.asarray(x64 + want, jnp.float32).astype(jnp.bfloat16).astype(jnp.float32),
            np.float64) - x64
        diff = np.abs(got - want_q)
        assert diff.max() <= 0.0625 + 1e-9
        assert (diff > 1e-9).mean() < 0.02

    def test_naf_twin_fp32_stats(self, rng):
        """naf_prefix_ref with [I;I] expand and a centre-tap dwconv reduces to
        LN(x)² — exposing the twin's LN numerics."""
        from dcpt_tpu.ops.naf_prefix import naf_prefix_ref

        c = 16
        xb, x64 = self._probe(rng, (1, 4, 6, c))
        w1 = jnp.concatenate([jnp.eye(c), jnp.eye(c)], axis=1).astype(jnp.bfloat16)
        wdw = jnp.zeros((3, 3, 2 * c), jnp.float32).at[1, 1].set(1.0).astype(jnp.bfloat16)
        g = naf_prefix_ref(xb, jnp.ones((c,), jnp.bfloat16), jnp.zeros((c,), jnp.bfloat16),
                           w1, jnp.zeros((2 * c,), jnp.bfloat16), wdw, jnp.zeros((2 * c,), jnp.bfloat16))
        got = np.asarray(g.astype(jnp.float32), np.float64)
        ln = self._ln64(x64, 1e-6)
        assert np.abs(got - ln**2).max() < 6e-2  # ln² doubles the relative error
