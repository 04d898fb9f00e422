from dfd_tpu.novelty.archive import SparseHistoryArchive
from dfd_tpu.novelty.handler import StrategyHandler
from dfd_tpu.novelty.point import StrategyPoint

__all__ = ["SparseHistoryArchive", "StrategyHandler", "StrategyPoint"]
