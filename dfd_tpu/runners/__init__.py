from dfd_tpu.runners.agent import Agent
from dfd_tpu.runners.host_env import HostEnv
from dfd_tpu.runners.fat_client import FatClientRunner
from dfd_tpu.runners.host_evaluator import BatchedHostEvaluator
from dfd_tpu.runners.policy import HostPolicy, NumpySampler
from dfd_tpu.runners.sequential import SequentialRunner
from dfd_tpu.runners.slice_client import SliceClientRunner
from dfd_tpu.runners.vectorized import TrainState, VectorizedTrainer
from dfd_tpu.runners.worker import Worker

__all__ = [
    "Agent",
    "Worker",
    "HostEnv",
    "BatchedHostEvaluator",
    "FatClientRunner",
    "HostPolicy",
    "NumpySampler",
    "SequentialRunner",
    "SliceClientRunner",
    "VectorizedTrainer",
    "TrainState",
]
