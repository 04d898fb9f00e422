from dfd_tpu.envs.base import JaxEnv
from dfd_tpu.envs.cartpole import CartPoleEnv
from dfd_tpu.envs.framestack import FrameStackEnv, PadChannelsEnv
from dfd_tpu.envs.pendulum import PendulumEnv
from dfd_tpu.envs.pixelgrid import PixelGridEnv
from dfd_tpu.envs.procmaze import ProcMazeEnv
from dfd_tpu.envs.swimmer import SwimmerEnv
from dfd_tpu.envs.trap import TrapEnv

__all__ = [
    "JaxEnv",
    "TrapEnv",
    "CartPoleEnv",
    "FrameStackEnv",
    "PadChannelsEnv",
    "PendulumEnv",
    "PixelGridEnv",
    "ProcMazeEnv",
    "SwimmerEnv",
]
