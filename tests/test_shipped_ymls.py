"""The SHIPPED all-in-one ymls run verbatim end-to-end through test_pipeline,
with only ``--force_yml`` dataroot overrides onto synthetic tiny images (the
reference's own override mechanism — no yml editing). Covers the 10D protocol
(all 10 dataset types incl. the synthesis-at-load ones) and the CDD-mixed
11-way config; the 5D config's verbatim run is subsumed by 10D (superset of
its dataset types) and its per-arch networks by test_checkpoint_pipeline_parity.
"""

import pytest

pytestmark = pytest.mark.slow  # verbatim shipped-yml pipelines end-to-end

import os

import cv2
import numpy as np
import pytest

OPTIONS_DIR = os.path.join(os.path.dirname(__file__), "..", "options", "all_in_one", "test")


def _write_pair(gt_dir, lq_dir, n=1, size=(24, 24), dehaze=False, rng_seed=5, gt_ext=".png"):
    os.makedirs(gt_dir, exist_ok=True)
    if lq_dir:
        os.makedirs(lq_dir, exist_ok=True)
    rng = np.random.default_rng(rng_seed)
    for i in range(n):
        img = (rng.random((*size, 3)) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(gt_dir, f"img{i}{gt_ext}"), img)
        if lq_dir:
            lq_name = f"img{i}_hazy.png" if dehaze else f"img{i}.png"
            cv2.imwrite(os.path.join(lq_dir, lq_name), cv2.GaussianBlur(img, (3, 3), 1))


TRAIN_OPTIONS_DIR = os.path.join(os.path.dirname(__file__), "..", "options", "all_in_one", "train")


def test_shipped_10d_train_yml_runs(tmp_path):
    """The shipped 10D DCPT pre-train yml drives train_pipeline verbatim:
    all 10 sub-dataset types build into the ConcatDataset (dataset_idx 0..9)
    and the joint step runs — only --force_yml dataroot/size overrides."""
    import yaml

    from dcpt_tpu.train import train_pipeline
    from dcpt_tpu.utils.options import ordered_yaml

    yml_path = os.path.join(TRAIN_OPTIONS_DIR, "train_NAFNet_dcpt_10d.yml")
    with open(yml_path) as f:
        opt = yaml.load(f, Loader=ordered_yaml()[0])

    force = [
        "num_gpu=1",
        "network_g:width=8",
        "network_g:enc_blk_nums=[1,1]",
        "network_g:middle_blk_num=1",
        "network_g:dec_blk_nums=[1,1]",
        "network_g:window_size=4",
        "network_g:h=16",
        "network_dc:feature_dims=[8,16]",
        "network_dc:num_res_blocks=1",
        "datasets:train:gt_size=16",
        "datasets:train:batch_size_per_gpu=2",
        "datasets:train:num_worker_per_gpu=0",
        "datasets:train:prefetch_mode=~",
        "train:total_iter=2",
        "logger:use_tb_logger=false",
        "logger:print_freq=1",
    ]
    for key, ds in opt["datasets"]["train"]["datasets"].items():
        root = tmp_path / key
        dehaze = ds["type"] == "PairedImageDehazeDataset"
        has_lq = "dataroot_lq" in ds
        _write_pair(str(root / "gt"), str(root / "lq") if has_lq else None, n=2, size=(20, 20),
                    dehaze=dehaze, gt_ext=ds.get("suffix", ".png"))
        force.append(f"datasets:train:datasets:{key}:dataroot_gt={root / 'gt'}")
        if has_lq:
            force.append(f"datasets:train:datasets:{key}:dataroot_lq={root / 'lq'}")

    train_pipeline(str(tmp_path), args=["-opt", yml_path, "--force_yml", *force])
    models_dir = tmp_path / "experiments" / "NAFNet_dcpt_10d_pretrain" / "models"
    assert models_dir.parent.exists()


@pytest.mark.parametrize("yml_name", ["test_NAFNet_10d.yml", "test_NAFNet_cdd_mixed.yml"])
def test_shipped_yml_runs_verbatim(yml_name, tmp_path):
    import yaml

    from dcpt_tpu.test import test_pipeline
    from dcpt_tpu.utils.options import ordered_yaml

    yml_path = os.path.join(OPTIONS_DIR, yml_name)
    with open(yml_path) as f:
        opt = yaml.load(f, Loader=ordered_yaml()[0])

    force = [
        # no public checkpoint in this environment; small net for CPU speed
        "path:pretrain_network_g=~",
        "network_g:width=8",
        "network_g:enc_blk_nums=[1,1]",
        "network_g:middle_blk_num=1",
        "network_g:dec_blk_nums=[1,1]",
        "network_g:window_size=4",
    ]
    names = {}
    for key, ds in opt["datasets"].items():
        root = tmp_path / key
        dehaze = ds["type"] == "PairedImageDehazeDataset"
        has_lq = "dataroot_lq" in ds
        _write_pair(str(root / "gt"), str(root / "lq") if has_lq else None,
                    dehaze=dehaze, gt_ext=ds.get("suffix", ".png"))
        force.append(f"datasets:{key}:dataroot_gt={root / 'gt'}")
        if has_lq:
            force.append(f"datasets:{key}:dataroot_lq={root / 'lq'}")
        names[key] = ds["name"]

    args = ["-opt", yml_path, "--force_yml", *force]
    results = test_pipeline(str(tmp_path), args=args)

    assert set(results) == set(names.values())
    for name, metrics in results.items():
        assert 0 < metrics["psnr"] < 100, (name, metrics)
        assert 0 < metrics["ssim"] <= 1, (name, metrics)
