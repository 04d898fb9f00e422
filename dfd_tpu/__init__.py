"""dfd_tpu — a TPU-native finite-difference deep-RL training framework.

A from-scratch JAX/XLA/pjit/pallas re-design of the capabilities of the
``nexus-rl/dfd-starter`` reference (mounted read-only at /root/reference):
perturbation-based policy-gradient estimation with delayed-return
compensation, novelty/strategy archives with an adaptive-omega schedule,
normalized dynamic SGD, distributed observation normalization, and policy
families spanning discrete/continuous MLPs, an Atari CNN and an IMPALA
ResNet+LSTM.

Architecture (bottom-up):

- ``core``     — PRNG/noise discipline, flat-parameter views, Welford stats.
- ``ops``      — jnp/pallas compute primitives: distances, standardize,
                 fused perturb/combine kernels.
- ``models``   — functional policy modules (pure apply fns over param pytrees).
- ``envs``     — JAX-native vectorized environments + host adapters.
- ``fd``       — the finite-difference learner, DSGD optimizer, omega schedule.
- ``novelty``  — behavioral-diversity archive over a state set zeta.
- ``parallel`` — device mesh / sharding layer (population over ICI, hosts over DCN).
- ``runners``  — sequential (reference-parity) and vectorized (TPU-native) trainers.
- ``distributed`` — elastic out-of-band control plane (server/client).
- ``utils``    — metrics, checkpointing, profiling.

Unlike the reference's asynchronous gRPC client/server of single-threaded CPU
workers (reference run_server.py / run_client.py), the steady-state training
loop here is one jitted SPMD program: a population of seeded parameter
perturbations is evaluated by vectorized environments vmapped over a device
mesh, and the fitness-weighted gradient combine is an on-device ``psum``.
"""

from dfd_tpu.version import __version__

__all__ = ["__version__"]
