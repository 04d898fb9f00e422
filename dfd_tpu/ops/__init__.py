from dfd_tpu.ops.distances import (
    DISTANCES,
    categorical_bhattacharyya,
    categorical_tvd,
    gaussian_bhattacharyya,
    gaussian_wasserstein,
    gaussian_wasserstein_from_strategies,
    l2_dist,
    strategy_distance,
    strategy_novelty,
)
from dfd_tpu.ops.standardize import affine_transform, standardize

__all__ = [
    "DISTANCES",
    "l2_dist",
    "categorical_tvd",
    "categorical_bhattacharyya",
    "gaussian_bhattacharyya",
    "gaussian_wasserstein",
    "gaussian_wasserstein_from_strategies",
    "strategy_novelty",
    "strategy_distance",
    "standardize",
    "affine_transform",
]
