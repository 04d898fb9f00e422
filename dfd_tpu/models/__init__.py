from dfd_tpu.models.base import PolicyModel
from dfd_tpu.models.discrete import DiscreteMLP
from dfd_tpu.models.mujoco import GaussianMLP

__all__ = ["PolicyModel", "DiscreteMLP", "GaussianMLP"]
