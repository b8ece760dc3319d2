"""Preemption-safe training: a SIGTERM mid-run finishes the in-flight step,
saves model + training state, exits rc=0, and --auto_resume continues from
the preemption point (TPU pods get SIGTERM before reclaim; the torch
reference has no preemption story).
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest


def _write_cfg(tmp_path, total_iter):
    import cv2

    gt_dir = os.path.join(str(tmp_path), "gt")
    os.makedirs(gt_dir, exist_ok=True)
    r = np.random.default_rng(0)
    for i in range(4):
        cv2.imwrite(os.path.join(gt_dir, f"{i}.png"), (r.random((24, 24, 3)) * 255).astype(np.uint8))
    yml = tmp_path / "t.yml"
    yml.write_text(f"""
name: preempt_run
model_type: SRModel
scale: 1
num_gpu: 0
manual_seed: 0
datasets:
  train:
    name: d
    type: PairedImageDenoiseDataset
    phase: train
    dataroot_gt: {gt_dir}
    io_backend: {{type: disk}}
    sigma_type: constant
    sigma_range: 25
    gt_size: 16
    use_hflip: true
    use_rot: true
    batch_size_per_gpu: 2
    num_worker_per_gpu: 0
network_g:
  type: NAFNetBaseline
  width: 8
  enc_blk_nums: [1]
  middle_blk_num: 1
  dec_blk_nums: [1]
  h: 16
path: {{}}
train:
  total_iter: {total_iter}
  optim_g: {{type: Adam, lr: 1.0e-3}}
  scheduler: {{type: MultiStepRestartLR, milestones: [100000]}}
  pixel_opt: {{type: L1Loss}}
logger:
  print_freq: 1
  save_checkpoint_freq: 100000
  use_tb_logger: false
""")
    return yml


@pytest.mark.slow
def test_sigterm_saves_state_and_resumes(tmp_path):
    yml = _write_cfg(tmp_path, total_iter=100000)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""))
    proc = subprocess.Popen(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "import sys; from dcpt_tpu.train import train_pipeline;"
         f"train_pipeline({str(tmp_path)!r}, args=['-opt', {str(yml)!r}])"],
        cwd=str(tmp_path), env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    exp = tmp_path / "experiments" / "preempt_run"
    log_dir = exp  # train_*.log lands in experiments root's log dir
    try:
        # wait until iterations are actually running (print_freq=1 logs each)
        deadline = time.time() + 600
        started = False
        while time.time() < deadline:
            logs = []
            if exp.exists():
                logs = [p for p in exp.rglob("train_*.log")]
            # ", iter:" is the MessageLogger per-iteration line — the config
            # dump's "total_iter:" must NOT trigger the signal early (the
            # handler binds only after model build)
            if any(", iter:" in p.read_text() for p in logs):
                started = True
                break
            if proc.poll() is not None:
                break
            time.sleep(1.0)
        assert started, f"training never reached iteration logging; rc={proc.poll()}\n" + (
            proc.stdout.read() if proc.poll() is not None else "")

        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=300)
        assert proc.returncode == 0, out
    finally:
        if proc.poll() is None:
            proc.kill()

    states = exp / "training_states"
    saved = sorted(int(f.split(".state")[0]) for f in os.listdir(states) if f.endswith(".state"))
    assert saved, "no training state saved on SIGTERM"
    log_text = "\n".join(p.read_text() for p in exp.rglob("train_*.log"))
    assert "preemption-safe shutdown" in log_text

    # and the run is resumable from exactly that point
    resume_to = saved[-1] + 2
    yml.write_text(yml.read_text()
                   .replace("total_iter: 100000", f"total_iter: {resume_to}")
                   .replace("save_checkpoint_freq: 100000", "save_checkpoint_freq: 1"))
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "from dcpt_tpu.train import train_pipeline;"
         f"train_pipeline({str(tmp_path)!r}, args=['-opt', {str(yml)!r}, '--auto_resume'])"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert (states / f"{resume_to}.state").exists()
