from dfd_tpu.fd.dsgd import DSGD, SGD, DSGDParams, dsgd_update, lr_scale_from_omega
from dfd_tpu.fd.learner import FDLearner
from dfd_tpu.fd.omega import AdaptiveOmega, OmegaParams, OmegaState, omega_init, omega_step
from dfd_tpu.fd.returns import FDReturn, FDState

__all__ = [
    "DSGD",
    "SGD",
    "DSGDParams",
    "dsgd_update",
    "lr_scale_from_omega",
    "FDLearner",
    "AdaptiveOmega",
    "OmegaState",
    "OmegaParams",
    "omega_init",
    "omega_step",
    "FDReturn",
    "FDState",
]
