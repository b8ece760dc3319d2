from .color_util import bgr2ycbcr, rgb2ycbcr, rgb2ycbcr_jnp, ycbcr2bgr, ycbcr2rgb
from .diffjpeg import DiffJPEG
from .dist_util import get_dist_info as dist_get_dist_info, init_dist, master_only
from .file_client import FileClient
from .img_process_util import USMSharp, filter2D, usm_sharp
from .img_util import crop_border, imfrombytes, img2tensor, imwrite, tensor2img
from .logger import AvgTimer, MessageLogger, get_env_info, get_root_logger, init_tb_logger, init_wandb_logger
from .matlab_functions import imresize
from .misc import (
    check_resume,
    check_resume_all_in_one,
    get_time_str,
    make_exp_dirs,
    mkdir_and_rename,
    scandir,
    set_random_seed,
    sizeof_fmt,
)
from .options import copy_opt_file, dict2str, get_dist_info, ordered_yaml, parse_options, yaml_load
from .registry import (
    ARCH_REGISTRY,
    DATASET_REGISTRY,
    LOSS_REGISTRY,
    METRIC_REGISTRY,
    MODEL_REGISTRY,
    Registry,
)

__all__ = [
    "Registry",
    "ARCH_REGISTRY",
    "DATASET_REGISTRY",
    "LOSS_REGISTRY",
    "METRIC_REGISTRY",
    "MODEL_REGISTRY",
    "bgr2ycbcr",
    "rgb2ycbcr",
    "rgb2ycbcr_jnp",
    "ycbcr2bgr",
    "ycbcr2rgb",
    "crop_border",
    "imfrombytes",
    "img2tensor",
    "imwrite",
    "tensor2img",
    "AvgTimer",
    "MessageLogger",
    "get_env_info",
    "get_root_logger",
    "init_tb_logger",
    "imresize",
    "check_resume",
    "check_resume_all_in_one",
    "get_time_str",
    "make_exp_dirs",
    "mkdir_and_rename",
    "scandir",
    "set_random_seed",
    "sizeof_fmt",
    "copy_opt_file",
    "dict2str",
    "get_dist_info",
    "ordered_yaml",
    "parse_options",
    "yaml_load",
]
