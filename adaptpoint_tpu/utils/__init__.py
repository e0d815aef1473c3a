from .config import EasyConfig
from .registry import Registry, build_from_cfg
from .metrics import AverageMeter, ConfusionMatrix, get_mious
from .hostsync import PipelinedFetcher
from .logger import setup_logger, generate_exp_directory, resume_exp_directory, snapshot_source
from .random import set_random_seed
from .ckpt import save_checkpoint, load_checkpoint, resume_checkpoint, save_pytree, load_pytree
from .wandb import Wandb
