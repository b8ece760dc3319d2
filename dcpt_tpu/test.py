"""yml-driven test/eval entry point (reference: basicsr/test.py:21-71).

Usage::

    python -m dcpt_tpu.test -opt options/all_in_one/test/test_NAFNet_5d.yml
"""

from __future__ import annotations

import logging
import os.path as osp

from dcpt_tpu.data import build_dataloader, build_dataset
from dcpt_tpu.models import build_model
from dcpt_tpu.utils import get_env_info, get_root_logger, get_time_str, make_exp_dirs
from dcpt_tpu.utils.options import apply_num_gpu_platform, dict2str, parse_options

# Back-compat alias: the platform switch now lives with option parsing.
_apply_num_gpu_platform = apply_num_gpu_platform


def test_pipeline(root_path: str, args=None):
    opt, _ = parse_options(root_path, is_train=False, args=args)

    make_exp_dirs(opt)
    log_file = osp.join(opt["path"]["log"], f"test_{opt['name']}_{get_time_str()}.log")
    logger = get_root_logger(logger_name="dcpt_tpu", log_level=logging.INFO, log_file=log_file)
    logger.info(get_env_info())
    logger.info(dict2str(opt))

    # create test dataset and dataloader (sorted key order, test.py:41)
    test_loaders = []
    for _, dataset_opt in sorted(opt["datasets"].items()):
        test_set = build_dataset(dataset_opt)
        test_loader = build_dataloader(test_set, dataset_opt, num_gpu=opt["num_gpu"], dist=opt["dist"], sampler=None, seed=opt["manual_seed"])
        logger.info(f"Number of test images in {dataset_opt['name']}: {len(test_set)}")
        test_loaders.append(test_loader)

    model = build_model(opt)

    results = {}
    for test_loader in test_loaders:
        test_set_name = test_loader.dataset.opt["name"]
        logger.info(f"Testing {test_set_name}...")
        if opt.get("profile"):
            model.dist_profile(test_loader) if opt["dist"] else model.nondist_profile(test_loader)
        model.validation(test_loader, current_iter=opt["name"], tb_logger=None, save_img=opt["val"].get("save_img", False))
        if hasattr(model, "metric_results"):
            results[test_set_name] = dict(model.metric_results)
    return results


def main() -> None:
    import os

    test_pipeline(os.getcwd())


if __name__ == "__main__":
    root_path = osp.abspath(osp.join(__file__, osp.pardir, osp.pardir))
    test_pipeline(root_path)
