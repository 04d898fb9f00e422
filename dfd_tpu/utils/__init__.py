from dfd_tpu.utils.metrics import EpochReporter

__all__ = ["EpochReporter"]
