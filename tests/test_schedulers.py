"""LR schedule parity: our closed-form schedules vs the reference's stateful
torch schedulers, plus FID / misc-util checks."""

import numpy as np
import pytest

from dcpt_tpu.models.lr_scheduler import (
    build_schedule,
    cosine_annealing_restart_lr,
    multi_step_restart_lr,
    with_linear_warmup,
)


def _torch_lr_trace(scheduler_cls, base_lr, total, **kwargs):
    import torch

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=base_lr)
    sched = scheduler_cls(opt, **kwargs)
    # reference loop semantics (train loop + update_learning_rate): step() is
    # called before iter i for i>1, so lr used at iter i equals trace[i]
    lrs = [opt.param_groups[0]["lr"]]
    for _ in range(total):
        sched.step()
        lrs.append(opt.param_groups[0]["lr"])
    return lrs


class TestSchedulerParity:
    def test_multistep_restart(self, reference):
        from basicsr.models.lr_scheduler import MultiStepRestartLR

        base_lr = 1e-3
        kwargs = dict(milestones=[5, 10], gamma=0.5, restarts=[8], restart_weights=[0.7])
        theirs = _torch_lr_trace(MultiStepRestartLR, base_lr, 15, **kwargs)
        ours = multi_step_restart_lr(base_lr, **kwargs)
        for step in range(16):
            assert ours(step) == pytest.approx(theirs[step], rel=1e-9), f"step {step}"

    def test_cosine_restart(self, reference):
        from basicsr.models.lr_scheduler import CosineAnnealingRestartLR

        base_lr = 2e-4
        # NOTE: list-valued eta_min — the reference indexes eta_min[idx] and
        # crashes with a scalar eta_min + multiple periods (lr_scheduler.py:120)
        kwargs = dict(periods=[5, 5, 10], restart_weights=[1, 0.5, 0.25], eta_min=[1e-7, 1e-7, 0.0])
        theirs = _torch_lr_trace(CosineAnnealingRestartLR, base_lr, 19, **kwargs)
        ours = cosine_annealing_restart_lr(base_lr, **kwargs)
        for step in range(20):
            assert ours(step) == pytest.approx(theirs[step], rel=1e-6), f"step {step}"

    def test_warmup(self):
        sched = with_linear_warmup(lambda s: 1e-3, warmup_iter=10, base_lr=1e-3)
        assert sched(0) == 0
        assert sched(5) == pytest.approx(5e-4)
        assert sched(10) == pytest.approx(1e-3)

    def test_build_schedule_from_yml_dict(self):
        sched = build_schedule({"type": "CosineAnnealingRestartLR", "periods": [100], "restart_weights": [1]}, 1e-3)
        assert sched(0) == pytest.approx(1e-3)
        assert sched(100) == pytest.approx(0.0, abs=1e-9)


class TestFID:
    def test_identical_distributions_zero(self, rng):
        from dcpt_tpu.metrics.fid import calculate_fid, feature_statistics

        feats = rng.standard_normal((200, 16))
        mu, sigma = feature_statistics(feats)
        assert calculate_fid(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-6)

    def test_frechet_formula(self, rng):
        """The reference's fid.py imports a module absent from its own snapshot
        (basicsr.archs.inception), so verify against the closed-form instead."""
        from scipy import linalg

        from dcpt_tpu.metrics.fid import calculate_fid, feature_statistics

        a = rng.standard_normal((300, 8))
        b = rng.standard_normal((300, 8)) * 1.5 + 0.3
        mu1, s1 = feature_statistics(a)
        mu2, s2 = feature_statistics(b)
        diff = mu1 - mu2
        expected = diff @ diff + np.trace(s1) + np.trace(s2) - 2 * np.trace(linalg.sqrtm(s1 @ s2).real)
        assert calculate_fid(mu1, s1, mu2, s2) == pytest.approx(expected, rel=1e-9)


class TestDistUtil:
    def test_single_process_defaults(self):
        from dcpt_tpu.utils.dist_util import get_dist_info, master_only

        rank, world = get_dist_info()
        assert rank == 0 and world == 1

        calls = []

        @master_only
        def fn():
            calls.append(1)

        fn()
        assert calls == [1]


class TestPlotUtil:
    def test_txt_parsers_and_smoothing(self, tmp_path):
        from dcpt_tpu.utils.plot_util import read_data_from_txt_1v, read_data_from_txt_2v, smooth_data

        log = tmp_path / "train.log"
        log.write_text("iter 100 loss 0.5\niter 200 loss 0.25\nnoise line\n")
        steps, values = read_data_from_txt_2v(str(log), r"iter (\d+) loss ([\d.]+)")
        assert steps == [100, 200] and values == [0.5, 0.25]
        vals = read_data_from_txt_1v(str(log), r"iter \d+ loss ([\d.]+)")
        assert vals == [0.5, 0.25]
        sm = smooth_data([1.0, 0.0, 0.0], 0.5)
        assert sm == [1.0, 0.5, 0.25]
