"""Reference-pipeline-as-oracle E2E parity (VERDICT r2 item 5).

The strongest end-to-end check available in this environment: run the
REFERENCE's own ``test_pipeline`` (``/root/reference/basicsr/test.py:21``,
CPU-runnable with ``num_gpu: 0``) in a subprocess on tiny synthetic paired
data with a torch-saved random checkpoint, parse the PSNR/SSIM it logs, then
run OUR yml pipeline on the identical files + the same ``.pth`` and require
matching numbers.  This closes the last untested loop — the reference's
dataloader + reflect-padding + metric protocol versus ours — whereas
``test_checkpoint_pipeline_parity`` only compares against the reference's bare
torch forward.

Tolerance: the two pipelines share the uint8-quantize metric protocol but run
the forward in independent frameworks (fp32 agreement 60–150 dB depending on
arch), so a handful of pixels may round to adjacent uint8 codes; ≤0.05 dB /
≤5e-4 SSIM bounds that while still failing loudly on any protocol divergence
(padding, color order, crop, quantize — all dB-scale errors).
"""

import os
import re
import subprocess
import sys

import cv2
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"

# tiny versions of each flagship family; H, W chosen NOT multiples of the
# window size so both pipelines exercise their reflect-pad (pre_test) path
ARCHS = {
    "NAFNetBaseline": dict(
        ref_cls=("basicsr.archs.nafnet_arch", "NAFNetBaseline"),
        kwargs=dict(width=8, enc_blk_nums=[1, 1], middle_blk_num=1, dec_blk_nums=[1, 1]),
        yml_net="""
network_g:
  type: NAFNetBaseline
  width: 8
  enc_blk_nums: [1, 1]
  middle_blk_num: 1
  dec_blk_nums: [1, 1]
  window_size: 16
""",
    ),
    "Restormer": dict(
        ref_cls=("basicsr.archs.restormer_arch", "Restormer"),
        kwargs=dict(dim=8, num_blocks=[1, 1, 1, 1], num_refinement_blocks=1, heads=[1, 2, 2, 4]),
        yml_net="""
network_g:
  type: Restormer
  dim: 8
  num_blocks: [1, 1, 1, 1]
  num_refinement_blocks: 1
  heads: [1, 2, 2, 4]
  window_size: 8
""",
    ),
    # PromptIR: the reference hard-codes prompt dims for dim=48
    # (promptir_arch.py:290-298), so the tiny config keeps dim=48
    "PromptIR": dict(
        ref_cls=("basicsr.archs.promptir_arch", "PromptIR"),
        kwargs=dict(dim=48, num_blocks=[1, 1, 1, 1], num_refinement_blocks=1, heads=[1, 2, 2, 4], decoder=True),
        yml_net="""
network_g:
  type: PromptIR
  dim: 48
  num_blocks: [1, 1, 1, 1]
  num_refinement_blocks: 1
  heads: [1, 2, 2, 4]
  decoder: true
  window_size: 8
""",
    ),
    # SwinIR: the reference hard-codes the 6-layer encode/decode split
    # (swinir_arch.py:943 indexes depths[i+3]), so six depth-1 layers
    "SwinIR": dict(
        ref_cls=("basicsr.archs.swinir_arch", "SwinIR"),
        kwargs=dict(img_size=48, embed_dim=16, depths=[1] * 6, num_heads=[2] * 6, mlp_ratio=2.0, window_size=8, upscale=1),
        yml_net="""
network_g:
  type: SwinIR
  img_size: 48
  embed_dim: 16
  depths: [1, 1, 1, 1, 1, 1]
  num_heads: [2, 2, 2, 2, 2, 2]
  mlp_ratio: 2.0
  window_size: 8
  upscale: 1
""",
    ),
}

YML_TEMPLATE = """
name: oracle_{arch}
model_type: SRModel
scale: 1
num_gpu: 0
manual_seed: 0
datasets:
  test_1:
    name: synth
    type: PairedImageDataset
    io_backend: {{type: disk}}
    dataroot_gt: {gt_dir}
    dataroot_lq: {lq_dir}
{yml_net}
path:
  pretrain_network_g: {ckpt}
  param_key_g: params
  strict_load_g: true
val:
  save_img: false
  suffix: ~
  metrics:
    psnr:
      type: calculate_psnr
      crop_border: 0
      test_y_channel: false
      image_range: 255.0
    ssim:
      type: calculate_ssim
      crop_border: 0
      test_y_channel: false
      image_range: 255.0
"""

REF_RUNNER = r"""
import sys
sys.path.insert(0, sys.argv[1])  # repo/tests (ref_loader)
sys.path.insert(0, sys.argv[2])  # /root/reference
import ref_loader
ref_loader._install_stubs()
sys.argv = ["test.py", "-opt", sys.argv[3]]
import torch
# CPU-host shims for GPU-only no-ops the reference calls unconditionally
torch.cuda.empty_cache = lambda: None   # sr_model.py:418
torch.cuda.ipc_collect = lambda: None   # sr_model.py:419
import basicsr.models.base_model as _bm
# the reference's print_network calls .cuda() unconditionally (base_model.py:
# 189-199) — logging-only, broken on a CPU host; skip it
_bm.BaseModel.print_network = lambda self, net, shape=(1, 3, 64, 64): None
from basicsr.test import test_pipeline
test_pipeline(REF_ROOT)
"""


def _parse_metrics(log_dir: str) -> dict:
    """Pull '# psnr: X  # ssim: Y' out of the newest test log in log_dir."""
    logs = sorted(f for f in os.listdir(log_dir) if f.startswith("test_") and f.endswith(".log"))
    assert logs, f"no test log in {log_dir}: {os.listdir(log_dir)}"
    text = open(os.path.join(log_dir, logs[-1])).read()
    out = {}
    for m in re.finditer(r"# (psnr|ssim): ([0-9.]+(?:e[+-]?\d+)?|inf)", text):
        out[m.group(1)] = float(m.group(2))
    assert out, f"no metrics logged:\n{text[-2000:]}"
    return out


@pytest.mark.slow
@pytest.mark.parametrize("arch", list(ARCHS))
def test_reference_pipeline_oracle(arch, reference, tmp_path):
    import importlib

    import torch

    spec = ARCHS[arch]

    # synthetic pair: clean GT, noisy LQ; sizes NOT window multiples
    rng = np.random.default_rng(3)
    h, w = 44, 36
    gt_img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    lq_img = np.clip(gt_img.astype(np.int16) + rng.integers(-20, 20, gt_img.shape), 0, 255).astype(np.uint8)
    gt_dir, lq_dir = tmp_path / "gt", tmp_path / "lq"
    gt_dir.mkdir(), lq_dir.mkdir()
    cv2.imwrite(str(gt_dir / "x.png"), gt_img)
    cv2.imwrite(str(lq_dir / "x.png"), lq_img)

    # reference-format checkpoint from the reference arch itself
    torch.manual_seed(0)
    mod, cls_name = spec["ref_cls"]
    ref_cls = getattr(importlib.import_module(mod), cls_name)
    net = ref_cls(**spec["kwargs"]).eval()
    ckpt = tmp_path / "net.pth"
    sd = {k: v.cpu() for k, v in net.state_dict().items()}
    torch.save({"params": sd}, str(ckpt))

    yml = tmp_path / f"oracle_{arch}.yml"
    yml.write_text(
        YML_TEMPLATE.format(arch=arch, gt_dir=gt_dir, lq_dir=lq_dir, ckpt=ckpt, yml_net=spec["yml_net"])
    )

    # --- run the REFERENCE pipeline in a subprocess (its own root) ---
    ref_root = tmp_path / "ref_run"
    ref_root.mkdir()
    runner = REF_RUNNER.replace("REF_ROOT", repr(str(ref_root)))
    proc = subprocess.run(
        [sys.executable, "-c", runner, os.path.join(REPO, "tests"), REF, str(yml)],
        capture_output=True, text=True, timeout=600, cwd=str(ref_root),
    )
    assert proc.returncode == 0, f"reference pipeline failed:\n{proc.stdout}\n{proc.stderr}"
    ref_metrics = _parse_metrics(str(ref_root / "results" / f"oracle_{arch}"))

    # --- run OUR pipeline on the identical files + checkpoint ---
    from dcpt_tpu.test import test_pipeline

    ours = test_pipeline(str(tmp_path), args=["-opt", str(yml)])["synth"]

    assert abs(ours["psnr"] - ref_metrics["psnr"]) < 0.05, (
        f"{arch}: PSNR ours {ours['psnr']:.4f} vs reference pipeline {ref_metrics['psnr']:.4f}"
    )
    assert abs(ours["ssim"] - ref_metrics["ssim"]) < 5e-4, (
        f"{arch}: SSIM ours {ours['ssim']:.6f} vs reference pipeline {ref_metrics['ssim']:.6f}"
    )
