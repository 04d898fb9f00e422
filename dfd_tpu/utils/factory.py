"""Environment/policy/distance factory (reference utils/init_helper.py:8-32).

Maps an env id to (host env, policy model, strategy distance fn).  JAX-native
environments get the jitted HostEnv wrapper for the host topologies and are
returned raw for the vectorized trainer; gymnasium ids fall back to the host
adapter (classic control ships in the image; MuJoCo/Atari/procgen gate on
availability).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from dfd_tpu.envs.cartpole import CartPoleEnv
from dfd_tpu.envs.pendulum import PendulumEnv
from dfd_tpu.envs.pixelgrid import PixelGridEnv
from dfd_tpu.envs.procmaze import ProcMazeEnv
from dfd_tpu.envs.swimmer import SwimmerEnv
from dfd_tpu.envs.trap import TrapEnv
from dfd_tpu.models import DiscreteMLP, GaussianMLP
from dfd_tpu.models.atari import AtariCNN
from dfd_tpu.models.impala import ImpalaPolicy
from dfd_tpu.ops import distances

JAX_ENVS = {
    "SimpleTrapEnv-v0": TrapEnv,
    "CartPole-v1": CartPoleEnv,
    "Pendulum-v1": PendulumEnv,
    # HalfCheetah-class continuous locomotion (16-dim obs, 6 torque actions,
    # contact-free Lagrangian physics) — the JAX-native config-[2] stand-in
    "Swimmer-v0": SwimmerEnv,
}

# JAX-native pixel envs paired with the IMPALA policy family (the in-image
# stand-ins for procgen, which is not installed — reference
# utils/init_helper.py:9-12's role).  "Small" keeps CPU test topologies fast.
JAX_PIXEL_ENVS = {
    "PixelGrid-v0": lambda: PixelGridEnv(grid=8, scale=8),
    "PixelGridSmall-v0": lambda: PixelGridEnv(grid=4, scale=8, max_steps=12),
    # procgen-shaped: deterministic levels, procedural layouts, level-keyed
    # palettes; easy/hard mirror procgen's distribution_mode split
    "ProcMaze-v0": lambda: ProcMazeEnv(num_levels=200, distribution_mode="easy"),
    "ProcMazeHard-v0": lambda: ProcMazeEnv(num_levels=10000, distribution_mode="hard"),
}


def make_jax_env(env_id: str):
    if env_id in JAX_PIXEL_ENVS:
        return JAX_PIXEL_ENVS[env_id]()
    if env_id not in JAX_ENVS:
        raise KeyError(f"no JAX-native env registered for {env_id!r}")
    return JAX_ENVS[env_id]()


def get_vectorized_init_data(env_id: str) -> Tuple[object, object, object]:
    """(raw JaxEnv, policy model, distance fn) for the vectorized trainer."""
    jax_env = make_jax_env(env_id)
    if env_id in JAX_PIXEL_ENVS:
        model = ImpalaPolicy(jax_env.obs_shape, jax_env.n_actions)
        return jax_env, model, distances.categorical_tvd
    if jax_env.discrete:
        model = DiscreteMLP(jax_env.obs_dim, jax_env.n_actions)
        distance_fn = distances.categorical_tvd
    else:
        model = GaussianMLP(jax_env.obs_dim, jax_env.action_dim)
        distance_fn = distances.gaussian_wasserstein_from_strategies
    return jax_env, model, distance_fn


def get_init_data(env_id: str, random_seed: int) -> Tuple[object, object, object]:
    """(host-surface env, policy model, strategy distance fn) for ``env_id``."""
    if env_id in JAX_PIXEL_ENVS:
        from dfd_tpu.envs.wrappers import ImpalaObsWrapper
        from dfd_tpu.runners.host_env import HostEnv

        jax_env = make_jax_env(env_id)
        env = ImpalaObsWrapper(HostEnv(jax_env, seed=random_seed))
        model = ImpalaPolicy(jax_env.obs_shape, jax_env.n_actions)
        return env, model, distances.categorical_tvd

    if env_id in JAX_ENVS:
        from dfd_tpu.runners.host_env import HostEnv  # lazy: avoids a package cycle

        jax_env = make_jax_env(env_id)
        env = HostEnv(jax_env, seed=random_seed)
        if jax_env.discrete:
            model = DiscreteMLP(jax_env.obs_dim, jax_env.n_actions)
            distance_fn = distances.categorical_tvd
        else:
            model = GaussianMLP(jax_env.obs_dim, jax_env.action_dim)
            distance_fn = distances.gaussian_wasserstein_from_strategies
        return env, model, distance_fn

    from dfd_tpu.envs.gym_adapter import GymnasiumEnv, gymnasium_available

    if "procgen" in env_id:
        # procgen is gym-era (registers against gym, not gymnasium); build it
        # through the legacy adapter and wrap as the reference does
        # (reference utils/init_helper.py:9-12 + utils/impala_env_wrapper.py)
        from dfd_tpu.envs.gym_adapter import GymEnv, procgen_available
        from dfd_tpu.envs.wrappers import ImpalaObsWrapper

        if not procgen_available():
            raise RuntimeError(
                f"env {env_id!r} needs the gym-era 'procgen' and 'gym' packages, "
                "which are not installed in this image"
            )
        raw = GymEnv(env_id, seed=random_seed, distribution_mode="easy", num_levels=500)
        h, w, c = raw.obs_shape
        env = ImpalaObsWrapper(raw)
        model = ImpalaPolicy((c, h, w), raw.n_actions)
        distance_fn = distances.categorical_tvd
        return env, model, distance_fn

    if not gymnasium_available():
        raise RuntimeError(f"gymnasium not available for env {env_id!r}")

    if "NoFrameskip" in env_id or "ALE/" in env_id:
        # deepmind preprocessing, as the reference composes from baselines
        # (reference utils/init_helper.py:13-18): noop reset, max+skip-4,
        # episodic life, fire reset, 84x84 grayscale, /255, 4-stack
        from dfd_tpu.envs.atari_wrappers import wrap_deepmind_style

        env = wrap_deepmind_style(
            GymnasiumEnv(env_id, seed=random_seed), seed=random_seed
        )
        shape = env.obs_shape  # (84, 84, 4) channels-last stacks
        model = AtariCNN((shape[0], shape[1]), env.n_actions, in_channels=shape[2])
        distance_fn = distances.categorical_tvd
    else:
        env = GymnasiumEnv(env_id, seed=random_seed)
        if env.n_actions is not None:
            model = DiscreteMLP(int(np.prod(env.obs_shape)), env.n_actions)
            distance_fn = distances.categorical_tvd
        else:
            model = GaussianMLP(int(np.prod(env.obs_shape)), int(np.prod(env.action_space.shape)))
            distance_fn = distances.gaussian_wasserstein_from_strategies
    return env, model, distance_fn
