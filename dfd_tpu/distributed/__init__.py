from dfd_tpu.distributed.client import FDClient
from dfd_tpu.distributed.server import FDServer, GRPCWorker, ServerInterface

__all__ = ["FDClient", "FDServer", "GRPCWorker", "ServerInterface"]
