"""Kernel-delegation guard (VERDICT r3 item 6).

The winner Pallas kernels are routed so that

* PRIMAL-ONLY traces (inference) run the fused kernel, but
* DIFFERENTIATED traces compile to exactly the pure-XLA autodiff graph of
  the jnp twin — the custom-VJP ``_fwd`` delegates to ``jax.vjp(twin)``
  (kernel-in-diff-path measured 1.86× slower end-to-end on the DCPT train
  step: PARITY.md "NAFNet kernel A/B (round 3)"),
* EXCEPT the measured analytic backwards: the NAF auto default
  (``DCPT_TPU_NAF_BWD`` tri-state) routes fp32 differentiated traces through
  the fused forward + the hand-derived Pallas backward and NO twin (measured
  1.102× train-step winner, PARITY "Analytic Pallas NAFBlock backward"); bf16
  keeps the twin delegation (measured tie); the MDTA auto default
  (``DCPT_TPU_MDTA_BWD``) routes BOTH dtypes through the analytic backward
  (measured 1.147× fp32 / 1.117× mixed on the DCPT Restormer step, PARITY
  "Analytic Pallas MDTA backward"); and the Swin auto default
  (``DCPT_TPU_SWIN_BWD``) routes BOTH dtypes through the analytic backward
  (measured 1.82× mixed on the DCPT SwinIR step; the fp32 twin autodiff
  graph reproducibly fails remote compile, so in fp32 the analytic path is
  the only one that compiles — PARITY "Analytic Pallas SwinBlock backward").
  "0"/"1" force the two paths for A/B.

bench.py's ``restormer_train_step_mixed_ms`` / ``dcpt_train_step_mixed_ms``
perf-guard this on silicon; these tests pin the same property structurally
(jaxpr inspection — backend-independent, no TPU needed) so a refactor that
leaks a kernel into a train graph fails fast in CI, not at the next bench.

Reference analog: the BASICSR_JIT CUDA ops always differentiate through
their own backward kernels (/root/reference/basicsr/ops/layernorm/
src/layernorm_kernel.cpp); the delegation rule is a measured TPU-side
deviation, so it gets its own guard.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcpt_tpu.archs import build_network
from dcpt_tpu.ops import enable_pallas


@pytest.fixture()
def pallas_all():
    # "all" makes the winner gates pass on the CPU test backend; we only
    # TRACE (make_jaxpr) here, never execute, so un-interpreted Pallas is fine
    enable_pallas("all")
    yield
    enable_pallas("off")


RESTORMER_TINY = {
    "type": "Restormer", "inp_channels": 3, "out_channels": 3, "dim": 48,
    "num_blocks": [1, 1, 1, 1], "num_refinement_blocks": 1, "heads": [1, 2, 4, 8],
    "ffn_expansion_factor": 2.66, "bias": False, "LayerNorm_type": "BiasFree",
    "dual_pixel_task": False,
}
NAFNET_TINY = {
    "type": "NAFNetBaseline", "width": 16, "enc_blk_nums": [1, 1],
    "middle_blk_num": 1, "dec_blk_nums": [1, 1], "window_size": 16,
}


def _net_and_jaxprs(arch_opt, size, dtype=jnp.float32):
    net = build_network(dict(arch_opt))
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    # init EXECUTES the forward (not a trace) — un-interpreted Pallas can't
    # run on the CPU test backend, so params are built with kernels off
    enable_pallas("off")
    try:
        params = net.init(jax.random.PRNGKey(0), x)["params"]
    finally:
        enable_pallas("all")
    # the mixed train path casts params AND input (sr_model.py:164-165)
    params = jax.tree_util.tree_map(lambda t: t.astype(dtype), params)
    x = x.astype(dtype)

    fwd = lambda p, x: net.apply({"params": p}, x)[0]  # noqa: E731
    loss = lambda p, x: jnp.sum(fwd(p, x).astype(jnp.float32) ** 2)  # noqa: E731
    fwd_jaxpr = str(jax.make_jaxpr(fwd)(params, x))
    grad_jaxpr = str(jax.make_jaxpr(jax.grad(loss))(params, x))
    return fwd_jaxpr, grad_jaxpr


@pytest.mark.parametrize("arch_opt,size,dtype", [
    (RESTORMER_TINY, 64, jnp.float32),
    (RESTORMER_TINY, 64, jnp.bfloat16),
])
def test_mdta_analytic_bwd_auto_both_dtypes(pallas_all, monkeypatch, arch_opt, size, dtype):
    """The MDTA auto default routes BOTH precisions' differentiated traces
    through the fused forward + analytic Pallas backward — the measured
    1.147× fp32 / 1.117× mixed DCPT-Restormer train-step winner (PARITY
    'Analytic Pallas MDTA backward')."""
    monkeypatch.delenv("DCPT_TPU_MDTA_BWD", raising=False)
    fwd_jaxpr, grad_jaxpr = _net_and_jaxprs(arch_opt, size, dtype)
    assert "pallas_call" in fwd_jaxpr, (
        f"{arch_opt['type']}: winner kernel did not fire on the primal trace "
        "— the gate or tile picker regressed")
    assert "pallas_call" in grad_jaxpr, (
        f"{arch_opt['type']}: auto default must carry the analytic Pallas "
        "backward in the differentiated graph (measured winner)")


def test_mdta_bwd_force_off_delegates(pallas_all, monkeypatch):
    """DCPT_TPU_MDTA_BWD=0 forces twin delegation (the A/B baseline leg):
    the differentiated graph must compile to pure-XLA autodiff of the twin,
    with no Pallas anywhere (PARITY 'NAFNet kernel A/B': kernel-in-diff-path
    without an analytic backward is the 1.86× regression)."""
    monkeypatch.setenv("DCPT_TPU_MDTA_BWD", "0")
    fwd_jaxpr, grad_jaxpr = _net_and_jaxprs(RESTORMER_TINY, 64, jnp.float32)
    assert "pallas_call" in fwd_jaxpr
    assert "pallas_call" not in grad_jaxpr


# NB: depths needs an EVEN length — SwinIR splits layers into encode/decode
# halves (num_layers // 2 each), so a single entry runs zero RSTBs.
SWINIR_TINY = {
    "type": "SwinIR", "embed_dim": 32, "depths": [2, 2], "num_heads": [4, 4],
    "mlp_ratio": 2.0, "window_size": 8, "upscale": 1,
}


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_swin_analytic_bwd_auto_both_dtypes(pallas_all, monkeypatch, dtype):
    """The Swin auto default routes BOTH precisions' differentiated traces
    through the fused forward + analytic Pallas backward — 1.82× mixed
    winner, and the only fp32 path that compiles at the shipped SwinIR-180
    size (PARITY 'Analytic Pallas SwinBlock backward')."""
    monkeypatch.delenv("DCPT_TPU_SWIN_BWD", raising=False)
    fwd_jaxpr, grad_jaxpr = _net_and_jaxprs(SWINIR_TINY, 32, dtype)
    assert "pallas_call" in fwd_jaxpr, (
        "SwinIR: winner kernel did not fire on the primal trace")
    assert "pallas_call" in grad_jaxpr, (
        "SwinIR: auto default must carry the analytic Pallas backward "
        "in the differentiated graph (measured winner)")


def test_swin_bwd_force_off_delegates(pallas_all, monkeypatch):
    """DCPT_TPU_SWIN_BWD=0 forces twin delegation (the A/B baseline leg)."""
    monkeypatch.setenv("DCPT_TPU_SWIN_BWD", "0")
    fwd_jaxpr, grad_jaxpr = _net_and_jaxprs(SWINIR_TINY, 32, jnp.float32)
    assert "pallas_call" in fwd_jaxpr
    assert "pallas_call" not in grad_jaxpr


def test_naf_bf16_stays_xla(pallas_all, monkeypatch):
    """NAFNet bf16: the whole-block kernel measured a TIE in both directions
    (fwd A/B and the analytic-backward A/B), so bf16 graphs stay pure XLA —
    no Pallas on either the primal or the differentiated trace."""
    monkeypatch.delenv("DCPT_TPU_NAF_BWD", raising=False)
    fwd_jaxpr, grad_jaxpr = _net_and_jaxprs(NAFNET_TINY, 64, jnp.bfloat16)
    assert "pallas_call" not in fwd_jaxpr
    assert "pallas_call" not in grad_jaxpr


def test_naf_analytic_bwd_auto_fp32(pallas_all, monkeypatch):
    """The auto default (env unset) routes fp32 differentiated traces
    through the fused forward + the analytic Pallas backward — the measured
    1.102× train-step winner — with NO twin in the graph."""
    monkeypatch.delenv("DCPT_TPU_NAF_BWD", raising=False)
    fwd_jaxpr, grad_jaxpr = _net_and_jaxprs(NAFNET_TINY, 64, jnp.float32)
    assert "pallas_call" in fwd_jaxpr
    assert "pallas_call" in grad_jaxpr, (
        "fp32 auto default must carry the analytic Pallas backward")


def test_naf_analytic_bwd_force_off(pallas_all, monkeypatch):
    """DCPT_TPU_NAF_BWD=0 forces twin delegation even on fp32 (A/B lever)."""
    monkeypatch.setenv("DCPT_TPU_NAF_BWD", "0")
    _, grad_jaxpr = _net_and_jaxprs(NAFNET_TINY, 64, jnp.float32)
    assert "pallas_call" not in grad_jaxpr


def test_naf_analytic_bwd_force_on_bf16(pallas_all, monkeypatch):
    """DCPT_TPU_NAF_BWD=1 + a lifted bf16 stage cap forces the analytic path
    for bf16 (the scripts/bench_naf_bwd.py mixed A/B leg; measured a tie and
    stays opt-in)."""
    from dcpt_tpu.archs import nafnet_arch

    monkeypatch.setenv("DCPT_TPU_NAF_BWD", "1")
    monkeypatch.setattr(nafnet_arch, "_NAF_BLOCK_MAXC", 4096)
    _, grad_jaxpr = _net_and_jaxprs(NAFNET_TINY, 64, jnp.bfloat16)
    assert "pallas_call" in grad_jaxpr


def _swin_train_geometries(net_opt: dict, gt_size: int, batch: int):
    """Per-RSTB-layer backward geometries (nw, n, c, hidden, heads) as they
    occur in a DCPT train step: patch embed keeps H×W, every block windows
    the full map (swinir_arch.py SwinTransformerBlock)."""
    ws = net_opt.get("window_size", 8)
    c = net_opt.get("embed_dim", 96)
    mlp_ratio = net_opt.get("mlp_ratio", 4.0)
    # training pads lq to a window multiple (SRModel.pre_test analog is the
    # crop being a multiple already in every shipped recipe)
    h = w = -(-gt_size // ws) * ws
    nw = batch * (h // ws) * (w // ws)
    n = ws * ws
    hidden = int(c * mlp_ratio)
    return [(nw, n, c, hidden, heads) for heads in net_opt.get("num_heads", [6] * 6)]


def test_swin_fp32_compiling_path_all_shipped_geometries():
    """VERDICT r4 #5: the analytic Pallas backward is LOAD-BEARING for fp32
    SwinIR training — PARITY records the pure-XLA autodiff graph of 36
    SwinBlocks reproducibly failing remote compile, so a geometry that
    ``pick_bwd_tile`` rejects would delegate straight into the graph that
    cannot compile.  Every shipped SwinIR train yml (and the bench's
    SwinIR-180 train config) must therefore pass the WHOLE routing chain:
    the fused-block gate fires AND the backward tile picker accepts every
    block geometry.  Policy documented in PARITY 'Analytic Pallas SwinBlock
    backward'."""
    import pathlib

    from dcpt_tpu.archs.swinir_arch import _swin_fused_gate
    from dcpt_tpu.ops.swin_block_bwd import pick_bwd_tile
    from dcpt_tpu.utils.options import yaml_load

    configs = []
    root = pathlib.Path(__file__).resolve().parents[1]
    for yml in sorted((root / "options" / "all_in_one" / "train").glob("*.yml")):
        opt = yaml_load(str(yml))
        if opt.get("network_g", {}).get("type") != "SwinIR":
            continue
        train_ds = next(iter(
            d for d in opt["datasets"].values() if d.get("phase") == "train"
        )) if all("phase" in d for d in opt["datasets"].values()) else opt["datasets"]["train"]
        configs.append((yml.name, opt["network_g"],
                        train_ds["gt_size"], train_ds["batch_size_per_gpu"]))
    assert configs, "no shipped SwinIR train yml found — test is vacuous"

    # the bench's train-step config (bench.bench_swinir_train_step) must stay
    # on the compiling path too: it IS the graded silicon guard of this route
    import sys

    sys.path.insert(0, str(root))
    import bench

    configs.append(("bench.SWINIR_OPT", dict(bench.SWINIR_OPT), 128, 8))

    for name, net_opt, gt_size, batch in configs:
        heads_list = net_opt.get("num_heads", [6] * 6)
        c = net_opt.get("embed_dim", 96)
        for heads in heads_list:
            assert _swin_fused_gate(True, True, None, c, heads, jnp.float32), (
                f"{name}: fused-block gate rejects c={c}, heads={heads} — "
                "fp32 training would fall into the non-compiling twin graph")
        for nw, n, cc, hidden, heads in _swin_train_geometries(net_opt, gt_size, batch):
            tb = pick_bwd_tile(nw, n, cc, hidden, heads)
            assert tb is not None, (
                f"{name}: pick_bwd_tile rejects (nw={nw}, n={n}, c={cc}, "
                f"hidden={hidden}, heads={heads}) — this geometry delegates "
                "per-block into the fp32 autodiff graph PARITY records as "
                "unable to remote-compile; widen the tile table or add a "
                "compilable fallback before shipping this recipe")
            # drop-last batching can hand the final step a SMALLER batch; any
            # divisor batch must stay accepted too (nw scales with batch)
            assert pick_bwd_tile(nw // batch, n, cc, hidden, heads) is not None, (
                f"{name}: bs=1 remainder geometry rejected")


def test_swin_fp32_grad_graph_carries_analytic_bwd_at_shipped_size(pallas_all, monkeypatch):
    """End-to-end pin of the same rule at the REAL shipped size: the fp32
    grad jaxpr of the verbatim SwinIR-180 6×6 network at the train crop must
    contain pallas_call (the analytic backward) — tracing only, no TPU.  The
    tiny-geometry tests above cannot catch a size-dependent gate regression
    (e.g. a tile table capped below c=180's VMEM footprint)."""
    monkeypatch.delenv("DCPT_TPU_SWIN_BWD", raising=False)
    swin_180 = {
        "type": "SwinIR", "embed_dim": 180, "depths": [6, 6, 6, 6, 6, 6],
        "num_heads": [6, 6, 6, 6, 6, 6], "mlp_ratio": 2.0,
        "window_size": 8, "upscale": 1,
    }
    fwd_jaxpr, grad_jaxpr = _net_and_jaxprs(swin_180, 128, jnp.float32)
    assert "pallas_call" in fwd_jaxpr
    assert "pallas_call" in grad_jaxpr, (
        "shipped SwinIR-180 fp32 train graph lost the analytic Pallas "
        "backward — the twin autodiff graph it would delegate to is the one "
        "PARITY records as failing remote compile")


def test_dcpt_restormer_train_step_smoke():
    """The bench_restormer_train_step config shape (DCPTModel + Restormer
    encoder_level hooks + PromptIR_NoImg_DC probe on the encoder dims) builds
    and takes one finite step — tiny dims, CPU, default kernel gating."""
    from dcpt_tpu.models import build_model

    gt, bs = 32, 2
    opt = {
        "name": "t_rest_dcpt", "model_type": "DCPTModel", "scale": 1,
        "num_gpu": 1, "manual_seed": 0, "is_train": True, "dist": False,
        # decoder_level taps REVERSED give the shrinking pyramid the DC probe
        # needs: [dec1 (gt, 2d), dec2 (gt/2, 2d), dec3 (gt/4, 4d)] — encoder
        # taps reversed GROW spatially and cannot feed the downsampling probe
        "rank": 0, "world_size": 1, "hook_names": "decoder_level", "init_size": gt,
        "network_g": {"type": "Restormer", "dim": 8, "num_blocks": [1, 1, 1, 1],
                      "num_refinement_blocks": 1, "heads": [1, 2, 4, 8],
                      "ffn_expansion_factor": 2.0, "bias": False,
                      "LayerNorm_type": "BiasFree", "dual_pixel_task": False},
        "network_dc": {"type": "PromptIR_NoImg_DC", "feature_dims": [16, 16, 32, 64],
                       "num_res_blocks": 1, "num_classes": 5, "downsample": False},
        "path": {},
        "train": {
            "optim_g": {"type": "AdamW", "lr": 1e-4, "weight_decay": 1e-4},
            "optim_dc": {"type": "AdamW", "lr": 1e-4, "weight_decay": 1e-4},
            "scheduler": {"type": "CosineAnnealingRestartLR", "periods": [100],
                          "restart_weights": [1]},
            "classify_opt": {"type": "CrossEntropyLoss"},
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
            "mixed_precision": True,
            "total_iter": 100,
        },
        "val": {"metrics": {}},
    }
    model = build_model(opt)
    rng = np.random.default_rng(0)
    lq = jnp.asarray(rng.random((bs, gt, gt, 3), dtype=np.float32))
    gt_img = jnp.asarray(rng.random((bs, gt, gt, 3), dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, 5, bs), dtype=jnp.int32)
    lr = jnp.float32(1e-4)
    pg, pdc, og, odc, losses = model._train_step(
        model.params_g, model.params_dc, model.opt_state_g, model.opt_state_dc,
        lq, gt_img, idx, lr, lr)
    for v in jax.tree_util.tree_leaves(losses):
        assert np.isfinite(np.asarray(v)).all()
