"""Vectorized population rollouts — the hot path.

The reference evaluates one perturbation per episode per python loop
iteration, one env step per policy forward of batch 1 (reference
worker/agent.py:35-52).  Here the whole population rolls out in lockstep as
one XLA program: ``vmap`` over P population members of a ``lax.scan`` over T
timesteps, each step fusing the policy forward (batched over P on the MXU)
with the pure-function env transition.  Post-done steps are masked; per-step
entropy and sampled Welford observation statistics accumulate in the carry,
reproducing the reference's per-episode quantities without a second pass.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from dfd_tpu.core import welford
from dfd_tpu.envs.base import JaxEnv
from dfd_tpu.models.base import PolicyModel


class RolloutResult(NamedTuple):
    reward: jnp.ndarray        # [ ] episodic return (sum of rewards until done)
    entropy: jnp.ndarray       # [ ] mean policy entropy over visited states
    steps: jnp.ndarray         # [ ] executed steps (<= T)
    obs_stats: welford.WelfordState  # sampled local observation statistics
    states: Any                # [T, *obs] visited observations (padded past done)


def episode_rollout(
    model: PolicyModel,
    env: JaxEnv,
    params,
    bn_state,
    key,
    horizon: int,
    deterministic,
    obs_mean,
    obs_std,
    normalize_obs: bool,
    obs_stats_update_chance: float,
    collect_states: bool = True,
    unroll: int = 1,
    collect_limit: Optional[int] = None,
) -> RolloutResult:
    """One full episode as a lax.scan; pure, vmappable over params/key.

    ``unroll`` trades compile time for stepping throughput: the per-step
    work of small policies is scan-iteration-overhead bound on TPU
    (unroll=8 measured ~1.5x faster at P=2048 on the trap env).

    ``collect_limit``: when set, only the first ``collect_limit`` visited
    observations are kept, in a fixed carry buffer instead of a [T, *obs]
    scan output — this is what lets the deterministic eval episode ride the
    population vmap (runners/vectorized.py) without materializing
    [P, T, *obs]: the zeta refresh only ever consumes the first
    ``zeta_size`` states (reference run_sequential.py:142-143)."""

    reset_key, act_key, stats_key = jax.random.split(key, 3)
    env_state, obs = env.reset(reset_key)

    def policy_step(scan_carry, t):
        env_state, obs, prev_reward, done, model_carry, acc = scan_carry
        raw_obs = obs
        if normalize_obs:
            obs = jnp.clip((obs - obs_mean) / obs_std, -10, 10)

        step_key = jax.random.fold_in(act_key, t)
        action, step_entropy, new_model_carry = model.act_step(
            params, bn_state, obs, prev_reward, done, model_carry, step_key, deterministic
        )

        new_env_state, new_obs, reward, step_done = env.step(env_state, action)

        active = jnp.logical_not(done)
        af = active.astype(jnp.float32)
        sample_mask = af * (
            jax.random.uniform(jax.random.fold_in(stats_key, t)) < obs_stats_update_chance
        ).astype(jnp.float32)

        reward_acc, ent_acc, step_acc, stats, state_buf = acc
        stats = welford.jnp_update_batch(stats, raw_obs[None], sample_mask[None])
        if state_buf is not None:
            # predicated row write: rows >= collect_limit never change
            idx = jnp.minimum(t, collect_limit - 1)
            start = (idx,) + (0,) * raw_obs.ndim
            row = jax.lax.dynamic_slice(
                state_buf, start, (1,) + tuple(raw_obs.shape)
            )
            val = jnp.where(t < collect_limit, raw_obs[None], row)
            state_buf = jax.lax.dynamic_update_slice(state_buf, val, start)
        acc = (
            reward_acc + af * reward,
            ent_acc + af * step_entropy,
            step_acc + active.astype(jnp.int32),
            stats,
            state_buf,
        )

        # freeze the env once done (post-done transitions are discarded)
        keep = lambda new, old: jax.tree.map(
            lambda n, o: jnp.where(done, o, n), new, old
        )
        env_state = keep(new_env_state, env_state)
        obs = jnp.where(done, obs, new_obs)
        prev_reward = jnp.where(done, prev_reward, reward.astype(jnp.float32))
        model_carry = keep(new_model_carry, model_carry)
        done = jnp.logical_or(done, step_done)

        out_state = raw_obs if (collect_states and collect_limit is None) else None
        return (env_state, obs, prev_reward, done, model_carry, acc), out_state

    stats0 = welford.jnp_init(env.obs_shape)
    buf0 = (
        jnp.zeros((collect_limit,) + tuple(env.obs_shape), jnp.float32)
        if collect_limit is not None
        else None
    )
    acc0 = (jnp.float32(0), jnp.float32(0), jnp.int32(0), stats0, buf0)
    carry0 = (env_state, obs, jnp.float32(0), jnp.asarray(False), model.initial_carry(), acc0)
    (final_env, final_obs, _, done, _, acc), states = jax.lax.scan(
        policy_step, carry0, jnp.arange(horizon), unroll=unroll
    )
    reward, ent_sum, steps, stats, state_buf = acc
    if collect_limit is not None:
        states = state_buf
    entropy = ent_sum / jnp.maximum(steps, 1).astype(jnp.float32)
    return RolloutResult(reward=reward, entropy=entropy, steps=steps, obs_stats=stats, states=states)


def population_rollout(
    model: PolicyModel,
    env: JaxEnv,
    pop_params,
    bn_state,
    keys,
    horizon: int,
    obs_mean,
    obs_std,
    normalize_obs: bool,
    obs_stats_update_chance: float,
    collect_states: bool = False,
) -> RolloutResult:
    """vmap of :func:`episode_rollout` over stacked population params/keys."""

    def one(params, key):
        return episode_rollout(
            model,
            env,
            params,
            bn_state,
            key,
            horizon,
            deterministic=jnp.asarray(False),
            obs_mean=obs_mean,
            obs_std=obs_std,
            normalize_obs=normalize_obs,
            obs_stats_update_chance=obs_stats_update_chance,
            collect_states=collect_states,
        )

    return jax.vmap(one)(pop_params, keys)
