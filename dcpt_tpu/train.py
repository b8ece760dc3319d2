"""yml-driven training entry point.

The reference never shipped its train script (``basicsr/__init__.py:10``
comments it out; README lists it as TODO).  This is the canonical BasicSR-style
loop it implies — resume → dataloaders with EnlargedSampler → prefetcher →
per-iter ``update_learning_rate`` / ``feed_data`` / ``optimize_parameters`` /
log / val / save — built TPU-native: the device prefetcher overlaps host→HBM
copies with the jitted train step, and multi-device parallelism lives inside
the step via the mesh (see ``dcpt_tpu/parallel``).

Usage::

    python -m dcpt_tpu.train -opt options/train_config.yml [--auto_resume]

DCPT-style multi-degradation training uses ``datasets.train.type:
ConcatDataset`` with a ``datasets:`` list of per-degradation dataset configs —
the concat stamps ``dataset_idx`` (the classification label).
"""

from __future__ import annotations

import datetime
import logging
import math
import os
import os.path as osp
import signal
import threading
import time

from dcpt_tpu.data import (
    CPUPrefetcher,
    ConcatDataset,
    DevicePrefetcher,
    EnlargedSampler,
    build_dataloader,
    build_dataset,
)
from dcpt_tpu.models import build_model
from dcpt_tpu.utils import (
    AvgTimer,
    MessageLogger,
    check_resume,
    copy_opt_file,
    get_env_info,
    get_root_logger,
    get_time_str,
    init_tb_logger,
    make_exp_dirs,
    mkdir_and_rename,
)
from dcpt_tpu.utils.options import dict2str, parse_options


def _build_train_dataset(dataset_opt: dict):
    """Plain dataset, or a ConcatDataset of per-degradation datasets."""
    if dataset_opt.get("type") == "ConcatDataset":
        subs = []
        ratios = []
        for _, sub_opt in sorted(dataset_opt["datasets"].items()):
            sub_opt = dict(sub_opt)
            for inherited in ("phase", "scale", "gt_size", "use_hflip", "use_rot"):
                if inherited in dataset_opt and inherited not in sub_opt:
                    sub_opt[inherited] = dataset_opt[inherited]
            ratios.append(sub_opt.pop("enlarge_ratio", 1))
            subs.append(build_dataset(sub_opt))
        ds = ConcatDataset(subs, enlarge_ratios=ratios)
        ds.opt = dataset_opt
        return ds
    return build_dataset(dataset_opt)


def create_train_val_dataloader(opt, logger):
    train_loader, train_sampler, val_loaders, total_epochs, total_iters = None, None, [], 0, 0
    for phase, dataset_opt in opt["datasets"].items():
        if phase == "train":
            dataset_enlarge_ratio = dataset_opt.get("dataset_enlarge_ratio", 1)
            train_set = _build_train_dataset(dataset_opt)
            train_sampler = EnlargedSampler(
                train_set, opt["world_size"], opt["rank"], dataset_enlarge_ratio,
                torch_compat=bool(dataset_opt.get("torch_compat_sampler", False)),
            )
            train_loader = build_dataloader(
                train_set, dataset_opt, num_gpu=opt["num_gpu"], dist=opt["dist"],
                sampler=train_sampler, seed=opt["manual_seed"],
            )
            num_iter_per_epoch = math.ceil(
                len(train_set) * dataset_enlarge_ratio / (dataset_opt["batch_size_per_gpu"] * opt["world_size"])
            )
            total_iters = int(opt["train"]["total_iter"])
            total_epochs = math.ceil(total_iters / num_iter_per_epoch)
            logger.info(
                "Training statistics:"
                f"\n\tNumber of train images: {len(train_set)}"
                f"\n\tDataset enlarge ratio: {dataset_enlarge_ratio}"
                f"\n\tBatch size per device: {dataset_opt['batch_size_per_gpu']}"
                f"\n\tWorld size: {opt['world_size']}"
                f"\n\tRequire iter number per epoch: {num_iter_per_epoch}"
                f"\n\tTotal epochs: {total_epochs}; iters: {total_iters}."
            )
        elif phase.split("_")[0] == "val":
            # ConcatDataset allowed here too: DC-family validation is top-1
            # accuracy over per-degradation datasets and needs the stamped
            # ``dataset_idx`` labels (reference …model.py:229-289 reads them
            # from the val batch)
            val_set = _build_train_dataset(dataset_opt)
            val_loader = build_dataloader(
                val_set, dataset_opt, num_gpu=opt["num_gpu"], dist=opt["dist"], sampler=None, seed=opt["manual_seed"]
            )
            logger.info(f"Number of val images/folders in {dataset_opt['name']}: {len(val_set)}")
            val_loaders.append(val_loader)
        else:
            raise ValueError(f"Dataset phase {phase} is not recognized.")
    return train_loader, train_sampler, val_loaders, total_epochs, total_iters


def load_resume_state(opt):
    resume_state_path = None
    if opt["auto_resume"]:
        state_path = opt["path"]["training_states"]
        if osp.isdir(state_path):
            states = [v for v in os.listdir(state_path) if v.endswith(".state")]
            if states:
                max_state = max(float(v.split(".state")[0]) for v in states)
                resume_state_path = osp.join(state_path, f"{max_state:.0f}.state")
                opt["path"]["resume_state"] = resume_state_path
    else:
        if opt["path"].get("resume_state"):
            resume_state_path = opt["path"]["resume_state"]
    return resume_state_path


def train_pipeline(root_path: str, args=None):
    opt, parsed_args = parse_options(root_path, is_train=True, args=args)
    opt["root_path"] = root_path

    resume_state_path = load_resume_state(opt)
    resume_state = None

    if resume_state_path is None:
        make_exp_dirs(opt)
        if opt["logger"].get("use_tb_logger") and "debug" not in opt["name"] and opt["rank"] == 0:
            mkdir_and_rename(osp.join(opt["root_path"], "tb_logger", opt["name"]))

    copy_opt_file(parsed_args.opt, opt["path"]["experiments_root"])

    log_file = osp.join(opt["path"]["log"], f"train_{opt['name']}_{get_time_str()}.log")
    logger = get_root_logger(logger_name="dcpt_tpu", log_level=logging.INFO, log_file=log_file)
    logger.info(get_env_info())
    logger.info(dict2str(opt))
    tb_logger = None
    if opt["logger"].get("use_tb_logger") and "debug" not in opt["name"]:
        tb_logger = init_tb_logger(log_dir=osp.join(opt["root_path"], "tb_logger", opt["name"]))

    result = create_train_val_dataloader(opt, logger)
    train_loader, train_sampler, val_loaders, total_epochs, total_iters = result

    if resume_state_path:
        # rewire pretrain paths before model build (reference: misc.check_resume)
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            resume_state = ckptr.restore(os.path.abspath(resume_state_path))
        check_resume(opt, resume_state["iter"])

    model = build_model(opt)
    if resume_state:
        model.resume_training(resume_state)
        logger.info(f"Resuming training from epoch: {resume_state['epoch']}, iter: {resume_state['iter']}.")
        start_epoch = int(resume_state["epoch"])
        current_iter = int(resume_state["iter"])
    else:
        start_epoch = 0
        current_iter = 0

    msg_logger = MessageLogger(opt, current_iter + 1, tb_logger)

    prefetch_mode = (opt["datasets"]["train"].get("prefetch_mode") or "device").lower()
    logger.info(f"Use {prefetch_mode} prefetcher")

    data_timer, iter_timer = AvgTimer(), AvgTimer()
    start_time = time.time()
    warmup_iter = opt["train"].get("warmup_iter", -1)

    # Preemption-safe shutdown (TPU pods get SIGTERM before reclaim): finish
    # the in-flight step, save model + training state, exit cleanly so
    # --auto_resume continues from the preemption point.  Handlers only bind
    # in the main thread (signal module restriction) and are restored on exit
    # so in-process callers (tests) keep their own handling.
    stop = {"signum": None}
    prev_handlers = {}
    if threading.current_thread() is threading.main_thread():
        def _request_stop(signum, frame):  # noqa: ARG001
            stop["signum"] = signum

        for sig in (signal.SIGTERM,):
            prev_handlers[sig] = signal.signal(sig, _request_stop)

    try:
        return _train_loop(opt, logger, msg_logger, tb_logger, model, train_sampler,
                           train_loader, val_loaders, total_epochs, total_iters,
                           start_epoch, current_iter, prefetch_mode, warmup_iter,
                           data_timer, iter_timer, start_time, stop)
    finally:
        for sig, handler in prev_handlers.items():
            # a None return means the previous handler was installed from C
            # and cannot be re-installed from Python — fall back to SIG_DFL
            # rather than raising TypeError after a successful run
            signal.signal(sig, handler if handler is not None else signal.SIG_DFL)


def _train_loop(opt, logger, msg_logger, tb_logger, model, train_sampler, train_loader,
                val_loaders, total_epochs, total_iters, start_epoch, current_iter,
                prefetch_mode, warmup_iter, data_timer, iter_timer, start_time, stop):
    epoch = start_epoch
    for epoch in range(start_epoch, total_epochs + 1):
        train_sampler.set_epoch(epoch)
        if prefetch_mode == "device":
            from jax.sharding import NamedSharding, PartitionSpec as P

            mesh = model.mesh
            sharding = NamedSharding(mesh, P("data")) if "data" in mesh.axis_names else None
            prefetcher = DevicePrefetcher(train_loader, sharding=sharding)
        else:
            prefetcher = CPUPrefetcher(train_loader)
        train_data = prefetcher.next()

        while train_data is not None:
            data_timer.record()
            current_iter += 1
            if current_iter > total_iters:
                break
            model.update_learning_rate(current_iter, warmup_iter)
            model.feed_data(train_data)
            model.optimize_parameters(current_iter)
            iter_timer.record()
            if current_iter == 1:
                msg_logger.reset_start_time()

            if current_iter % opt["logger"]["print_freq"] == 0:
                log_vars = {"epoch": epoch, "iter": current_iter}
                log_vars.update({"lrs": model.get_current_learning_rate()})
                log_vars.update({"time": iter_timer.get_avg_time(), "data_time": data_timer.get_avg_time()})
                log_vars.update(model.get_current_log() if hasattr(model, "get_current_log") else model.log_dict)
                msg_logger(log_vars)

            if current_iter % opt["logger"]["save_checkpoint_freq"] == 0:
                logger.info("Saving models and training states.")
                model.save(epoch, current_iter)

            if opt.get("val") is not None and (current_iter % opt["val"]["val_freq"] == 0):
                for val_loader in val_loaders:
                    model.validation(val_loader, current_iter, tb_logger, opt["val"].get("save_img", False))

            if stop["signum"] is not None:
                logger.warning(
                    f"Received signal {stop['signum']} — preemption-safe shutdown: "
                    f"saving model + training state at iter {current_iter} and exiting."
                )
                model.save(epoch, current_iter)
                model.finalize_checkpoints()
                logger.info("Preemption save committed; resume with --auto_resume.")
                return model

            data_timer.start()
            iter_timer.start()
            train_data = prefetcher.next()
        if current_iter > total_iters:
            break

    consumed_time = str(datetime.timedelta(seconds=int(time.time() - start_time)))
    logger.info(f"End of training. Time consumed: {consumed_time}")
    logger.info("Save the latest model.")
    model.save(epoch=-1, current_iter=-1)
    model.finalize_checkpoints()  # join the in-flight async state save
    if opt.get("val") is not None:
        for val_loader in val_loaders:
            model.validation(val_loader, current_iter, tb_logger, opt["val"].get("save_img", False))
    return model


def main() -> None:
    train_pipeline(os.getcwd())


if __name__ == "__main__":
    root_path = osp.abspath(osp.join(__file__, osp.pardir, osp.pardir))
    train_pipeline(root_path)
