from dfd_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from dfd_tpu.utils.factory import get_init_data, get_vectorized_init_data, make_jax_env
from dfd_tpu.utils.metrics import EpochReporter
from dfd_tpu.utils.profiling import StageTimer, trace
from dfd_tpu.utils.sweep import random_search

__all__ = [
    "EpochReporter",
    "get_init_data",
    "get_vectorized_init_data",
    "make_jax_env",
    "save_checkpoint",
    "load_checkpoint",
    "random_search",
    "StageTimer",
    "trace",
]
