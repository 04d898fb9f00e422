from dfd_tpu.envs.base import JaxEnv
from dfd_tpu.envs.cartpole import CartPoleEnv
from dfd_tpu.envs.pendulum import PendulumEnv
from dfd_tpu.envs.trap import TrapEnv

__all__ = ["JaxEnv", "TrapEnv", "CartPoleEnv", "PendulumEnv"]
