"""Batched host-env population evaluator — the hybrid hot path for
environments whose engines cannot be traced into XLA (MuJoCo, Atari,
procgen).

The reference's answer to slow host envs is many single-threaded CPU client
processes, each running batch-1 policy forwards (reference run_client.py:15,
worker/agent.py:43).  Here one process evaluates a whole population of
perturbations against N host envs in lockstep:

  host envs  --obs batch-->  device: vmapped perturbed forward + sampling
     ^                                        |
     +----------------- actions --------------+

One device call and one batched env step per timestep, for the entire
population — policy compute rides the MXU at population batch size, host
stepping rides the native thread pool (envs/native_pool.py) or any
vector-env backend with ``reset_all()/step(actions)``.

Results come back as FDReturns carrying counter-noise encodings, so this
evaluator drops into the elastic client topology as a high-throughput
worker: a "fat client" contributing a whole population shard per window.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dfd_tpu.core.noise import CounterNoise
from dfd_tpu.fd.returns import FDReturn
from dfd_tpu.models import layers
from dfd_tpu.models.base import PolicyModel


class BatchedHostEvaluator:
    def __init__(self, model: PolicyModel, vector_env, noise: CounterNoise, sigma: float,
                 normalize_obs: bool = False):
        self.model = model
        self.env = vector_env
        self.noise = noise
        self.sigma = sigma
        self.normalize_obs = normalize_obs
        self.n = vector_env.n_envs

        def act(pop_flats, bn_state, obs, key, obs_mean, obs_std):
            obs = jnp.asarray(obs, jnp.float32)
            if self.normalize_obs:
                obs = jnp.clip((obs - obs_mean) / obs_std, -10, 10)

            def one(flat, o, k):
                params = model.set_flat(flat, xp=jnp)
                if model.discrete:
                    probs = model.apply(params, bn_state, o)[0]
                    a = jax.random.categorical(k, jnp.log(jnp.maximum(probs, 1e-38)))
                    return a.astype(jnp.int32), layers.categorical_entropy(probs)
                mean, std = model.apply(params, bn_state, o)
                mean, std = mean[0], std[0]
                a = mean + std * jax.random.normal(k, mean.shape)
                return a, layers.gaussian_entropy(std).sum()

            keys = jax.random.split(key, obs.shape[0])
            return jax.vmap(one)(pop_flats, obs, keys)

        def act_recurrent(pop_flats, bn_state, obs, prev_rewards, carry, key, obs_mean, obs_std):
            """One lockstep timestep for a recurrent model: each member's
            carry (e.g. the IMPALA LSTM state) and previous reward thread
            through the host loop — the device sees the same per-step
            surface as the on-device rollout engine (model.act_step)."""
            obs = jnp.asarray(obs, jnp.float32)
            if self.normalize_obs:
                obs = jnp.clip((obs - obs_mean) / obs_std, -10, 10)

            def one(flat, o, pr, c, k):
                params = model.set_flat(flat, xp=jnp)
                action, ent, new_c = model.act_step(
                    params, bn_state, o, pr, jnp.asarray(False), c, k,
                    deterministic=jnp.asarray(False),
                )
                return action, ent, new_c

            keys = jax.random.split(key, obs.shape[0])
            return jax.vmap(one)(pop_flats, obs, prev_rewards, carry, keys)

        self._act = jax.jit(act)
        self._act_recurrent = jax.jit(act_recurrent)
        self._init_carry = jax.jit(
            lambda: jax.tree.map(
                lambda x: jnp.broadcast_to(x, (self.n,) + x.shape),
                model.initial_carry(),
            )
        )
        self._perturb = jax.jit(
            lambda flat, epoch, offset: flat[None, :]
            + sigma
            * jax.vmap(lambda i: noise.generate(epoch, i))(offset + jnp.arange(self.n))
        )

    def evaluate_population(
        self,
        flat: np.ndarray,
        bn_state,
        epoch: int,
        horizon: int,
        key,
        obs_mean: Optional[np.ndarray] = None,
        obs_std: Optional[np.ndarray] = None,
        id_offset: int = 0,
    ) -> List[FDReturn]:
        """One episode per population member (member ``id_offset + i`` <->
        env i), lockstep.  ``id_offset`` keeps member ids globally unique
        across elastic fat clients."""
        n = self.n
        pop_flats = self._perturb(jnp.asarray(flat, jnp.float32), epoch, id_offset)
        obs = self.env.reset_all()
        obs_mean = jnp.zeros(obs.shape[1:]) if obs_mean is None else jnp.asarray(obs_mean)
        obs_std = jnp.ones(obs.shape[1:]) if obs_std is None else jnp.asarray(obs_std)

        rewards = np.zeros(n, np.float64)
        ent_sum = np.zeros(n, np.float64)
        steps = np.zeros(n, np.int64)
        alive = np.ones(n, bool)

        recurrent = self.model.recurrent
        if recurrent:
            carry = self._init_carry()
            prev_rewards = jnp.zeros(n, jnp.float32)

        for t in range(horizon):
            key, sub = jax.random.split(key)
            if recurrent:
                actions, entropies, carry = self._act_recurrent(
                    pop_flats, bn_state, obs, prev_rewards, carry, sub, obs_mean, obs_std
                )
            else:
                actions, entropies = self._act(pop_flats, bn_state, obs, sub, obs_mean, obs_std)
            obs, rew, done = self.env.step(np.asarray(actions))
            if recurrent:
                # the policy consumes the previous transition's reward next
                # step (reference utils/impala_env_wrapper.py:25-28 timing);
                # finished members' carries/rewards go stale harmlessly —
                # the alive mask stops their accounting
                prev_rewards = jnp.asarray(rew, jnp.float32)
            rewards[alive] += rew[alive]
            ent_sum[alive] += np.asarray(entropies)[alive]
            steps[alive] += 1
            alive &= ~np.asarray(done)
            if not alive.any():
                break

        out = []
        for i in range(n):
            r = FDReturn(
                epoch=epoch,
                encoded_noise="{},{}".format(epoch, id_offset + i),
                reward=float(rewards[i]),
                entropy=float(ent_sum[i] / max(int(steps[i]), 1)),
                timesteps=int(steps[i]),
            )
            out.append(r)
        return out
