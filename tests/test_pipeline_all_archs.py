"""test_pipeline smoke across all restoration arch families (tiny dims)."""

import pytest

pytestmark = pytest.mark.slow  # yml test_pipeline across all arch families

import os

import cv2
import numpy as np
import pytest

NETWORKS = {
    "NAFNetBaseline": """
network_g:
  type: NAFNetBaseline
  width: 8
  enc_blk_nums: [1, 1]
  middle_blk_num: 1
  dec_blk_nums: [1, 1]
  window_size: 4
""",
    "Restormer": """
network_g:
  type: Restormer
  dim: 8
  num_blocks: [1, 1, 1, 1]
  num_refinement_blocks: 1
  heads: [1, 2, 2, 4]
  window_size: 8
""",
    "SwinIR": """
network_g:
  type: SwinIR
  img_size: 16
  embed_dim: 16
  depths: [1, 1, 1, 1, 1, 1]
  num_heads: [2, 2, 2, 2, 2, 2]
  mlp_ratio: 2.0
  window_size: 8
  upscale: 1
""",
    "PromptIR": """
network_g:
  type: PromptIR
  dim: 48
  num_blocks: [1, 1, 1, 1]
  num_refinement_blocks: 1
  heads: [1, 2, 4, 8]
  window_size: 8
""",
}


@pytest.mark.parametrize("arch", list(NETWORKS))
def test_pipeline_arch(arch, tmp_path):
    gt_dir = tmp_path / "gt"
    lq_dir = tmp_path / "lq"
    gt_dir.mkdir()
    lq_dir.mkdir()
    rng = np.random.default_rng(1)
    img = (rng.random((24, 24, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(gt_dir / "a.png"), img)
    cv2.imwrite(str(lq_dir / "a.png"), cv2.GaussianBlur(img, (3, 3), 1))

    yml = tmp_path / f"test_{arch}.yml"
    yml.write_text(
        f"""
name: smoke_{arch}
model_type: SRModel
scale: 1
num_gpu: 0
manual_seed: 0
datasets:
  test_1:
    name: S
    type: PairedImageDataset
    dataroot_gt: {gt_dir}
    dataroot_lq: {lq_dir}
    io_backend: {{type: disk}}
{NETWORKS[arch]}
path: {{}}
val:
  save_img: false
  suffix: ~
  metrics:
    psnr: {{type: calculate_psnr, crop_border: 0, image_range: 255.0}}
"""
    )
    from dcpt_tpu.test import test_pipeline

    results = test_pipeline(str(tmp_path), args=["-opt", str(yml)])
    assert 0 < results["S"]["psnr"] < 100


def test_swinir_default_routes_through_fused_kernel(tmp_path, monkeypatch):
    """VERDICT r2 item 2: the shipped default path for SwinIR must be the
    measured-winner fused window-attention kernel — ``DCPT_TPU_PALLAS`` unset
    ("auto") + a TPU backend routes ``test_pipeline`` through it, with
    ``DCPT_TPU_PALLAS=0`` as the kill-switch.  On this CPU host the backend
    check is monkeypatched and the kernel runs in interpret mode; the separate
    interpret-parity tests in test_ops.py pin its numerics."""
    import jax

    import dcpt_tpu.ops as ops
    from dcpt_tpu.ops import window_attention as wa

    gt_dir = tmp_path / "gt"
    lq_dir = tmp_path / "lq"
    gt_dir.mkdir()
    lq_dir.mkdir()
    rng = np.random.default_rng(1)
    img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(gt_dir / "a.png"), img)
    cv2.imwrite(str(lq_dir / "a.png"), cv2.GaussianBlur(img, (3, 3), 1))
    yml = tmp_path / "test_swin_default.yml"
    yml.write_text(
        f"""
name: smoke_swin_default
model_type: SRModel
scale: 1
num_gpu: 0
manual_seed: 0
datasets:
  test_1:
    name: S
    type: PairedImageDataset
    dataroot_gt: {gt_dir}
    dataroot_lq: {lq_dir}
    io_backend: {{type: disk}}
{NETWORKS['SwinIR']}
path: {{}}
val:
  save_img: false
  suffix: ~
  metrics:
    psnr: {{type: calculate_psnr, crop_border: 0, image_range: 255.0}}
"""
    )
    from dcpt_tpu.test import test_pipeline

    calls = []
    orig = wa._wa_pallas
    orig_block = wa._swin_block_pallas

    def recording(x, wqkv, bqkv, wproj, bproj, num_heads, interpret, ln=None):
        calls.append(x.shape)
        return orig(x, wqkv, bqkv, wproj, bproj, num_heads, True, ln=ln)

    def recording_block(*a):
        calls.append(a[0].shape)
        return orig_block(*a[:-1], True)

    monkeypatch.setattr(wa, "_wa_pallas", recording)
    monkeypatch.setattr(wa, "_swin_block_pallas", recording_block)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")  # simulate TPU host
    ops.enable_pallas("auto")  # the shipped default (env unset)
    try:
        assert ops.pallas_winner_enabled() and not ops.pallas_enabled()
        results = test_pipeline(str(tmp_path), args=["-opt", str(yml)])
    finally:
        ops.enable_pallas(False)
    assert calls, "default SwinIR pipeline did not route through the fused window-attention kernel"
    assert 0 < results["S"]["psnr"] < 100

    # kill-switch: DCPT_TPU_PALLAS=0 semantics take the XLA path
    calls.clear()
    ops.enable_pallas(False)
    results_off = test_pipeline(str(tmp_path), args=["-opt", str(yml)])
    assert not calls
    assert abs(results_off["S"]["psnr"] - results["S"]["psnr"]) < 0.05


def test_restormer_default_routes_through_block_kernel(tmp_path, monkeypatch):
    """Round-3 measured winner: the shipped default path for Restormer (and
    PromptIR, same gate) must be the whole-TransformerBlock kernel — env
    unset ("auto") + a TPU backend routes ``test_pipeline`` through
    ``ops/mdta_block.py``, with ``DCPT_TPU_MDTA_BLOCK=0`` as the
    kill-switch.  Backend check monkeypatched on this CPU host; the kernel
    runs in interpret mode (numerics pinned in test_ops.py)."""
    import jax

    import dcpt_tpu.ops as ops
    import dcpt_tpu.ops.mdta_block as mb
    from dcpt_tpu.archs import restormer_arch

    gt_dir = tmp_path / "gt"
    lq_dir = tmp_path / "lq"
    gt_dir.mkdir()
    lq_dir.mkdir()
    rng = np.random.default_rng(1)
    img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(gt_dir / "a.png"), img)
    cv2.imwrite(str(lq_dir / "a.png"), cv2.GaussianBlur(img, (3, 3), 1))
    yml = tmp_path / "test_rest_default.yml"
    yml.write_text(
        f"""
name: smoke_rest_default
model_type: SRModel
scale: 1
num_gpu: 0
manual_seed: 0
datasets:
  test_1:
    name: S
    type: PairedImageDataset
    dataroot_gt: {gt_dir}
    dataroot_lq: {lq_dir}
    io_backend: {{type: disk}}
{NETWORKS['Restormer']}
path: {{}}
val:
  save_img: false
  suffix: ~
  metrics:
    psnr: {{type: calculate_psnr, crop_border: 0, image_range: 255.0}}
"""
    )
    from dcpt_tpu.test import test_pipeline

    calls = []
    orig = mb._block_pallas

    def recording(*a):
        calls.append(a[0].shape)
        return orig(*a[:-2], True, a[-1])

    monkeypatch.setattr(mb, "_block_pallas", recording)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")  # simulate TPU host
    assert restormer_arch._mdta_block_on(np.float32)  # shipped per-dtype default
    ops.enable_pallas("auto")  # the shipped default (env unset)
    try:
        results = test_pipeline(str(tmp_path), args=["-opt", str(yml)])
    finally:
        ops.enable_pallas(False)
    assert calls, "default Restormer pipeline did not route through the whole-block kernel"
    assert 0 < results["S"]["psnr"] < 100

    # kill-switch: DCPT_TPU_MDTA_BLOCK=0 semantics take the XLA path
    calls.clear()
    monkeypatch.setattr(restormer_arch, "_MDTA_BLOCK_KERNEL", False)
    ops.enable_pallas("auto")
    try:
        results_off = test_pipeline(str(tmp_path), args=["-opt", str(yml)])
    finally:
        ops.enable_pallas(False)
    assert not calls
    assert abs(results_off["S"]["psnr"] - results["S"]["psnr"]) < 0.05
