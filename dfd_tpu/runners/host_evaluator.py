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

from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dfd_tpu.core.noise import CounterNoise
from dfd_tpu.fd.returns import FDReturn
from dfd_tpu.models import layers
from dfd_tpu.models.base import PolicyModel


class BatchWelford:
    """Per-member streaming mean/variance, vectorized over the population.

    Same update algebra as :class:`dfd_tpu.core.welford.Welford` (reference
    utils/math_helpers.py:7-44) applied to a masked row subset per step —
    this is what gives every non-eval fat-client return its own sampled
    Welford delta (reference worker/agent.py:38-39 semantics)."""

    def __init__(self, n: int, shape):
        self.shape = tuple(shape)
        self.mean = np.zeros((n,) + self.shape, np.float32)
        self.m2 = np.zeros((n,) + self.shape, np.float32)
        self.count = np.zeros(n, np.int64)

    def update_masked(self, obs: np.ndarray, mask: np.ndarray, rows=None) -> None:
        """``rows``: optional global slice that the (obs, mask) block maps to
        (multi-lane evaluators update one lane's sub-block at a time)."""
        if not mask.any():
            return
        if rows is None:
            rows = slice(0, len(mask))
        idx = np.arange(rows.start, rows.stop)[mask]
        obs = np.asarray(obs, np.float32)[mask].reshape((-1,) + self.shape)
        self.count[idx] += 1
        c = self.count[idx].reshape((-1,) + (1,) * len(self.shape)).astype(np.float32)
        delta = obs - self.mean[idx]
        delta_n = delta / c
        self.mean[idx] += delta_n
        self.m2[idx] += delta * delta_n * (c - 1)

    def serialize_member(self, i: int) -> List[float]:
        """Wire format of one member's delta (Welford.serialize layout)."""
        return (
            self.mean[i].ravel().tolist()
            + self.m2[i].ravel().tolist()
            + [int(self.count[i])]
        )


class BatchedHostEvaluator:
    def __init__(self, model: PolicyModel, vector_env, noise: CounterNoise, sigma: float,
                 normalize_obs: bool = False, obs_stats_update_chance: float = 0.0,
                 distance_fn: Optional[Callable] = None):
        """``vector_env``: one vector backend, or a SEQUENCE of backends
        ("lanes").  With 2+ lanes the per-step loop software-pipelines
        device and host work (SURVEY.md section 7 hard part 5): the device
        forward for lane k is dispatched asynchronously, then the host steps
        lane k-1's envs while the device computes — double-buffered
        half-population pipelining with no extra threads, since JAX dispatch
        is already asynchronous and the sync point (materializing lane k's
        actions) lands after lane k-1's host step."""
        self.model = model
        lanes = list(vector_env) if isinstance(vector_env, (list, tuple)) else [vector_env]
        self.lanes = lanes
        self.env = lanes[0] if len(lanes) == 1 else vector_env
        self.noise = noise
        self.sigma = sigma
        self.normalize_obs = normalize_obs
        self.obs_stats_update_chance = obs_stats_update_chance
        self.distance_fn = distance_fn
        self.n = sum(l.n_envs for l in lanes)
        self._carry_cache = {}

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

        def _init_carry(width: int):
            if width not in self._carry_cache:
                self._carry_cache[width] = jax.jit(
                    lambda: jax.tree.map(
                        lambda x: jnp.broadcast_to(x, (width,) + x.shape),
                        model.initial_carry(),
                    )
                )
            return self._carry_cache[width]()

        self._init_carry = _init_carry
        self._perturb = jax.jit(
            lambda flat, epoch, offset: flat[None, :]
            + sigma
            * jax.vmap(lambda i: noise.generate(epoch, i))(offset + jnp.arange(self.n))
        )

        def batch_novelty(pop_flats, bn_state, zeta, archive, count):
            """Min behavioral distance of each member to the broadcast
            archive, 0 and forward-free below 2 entries (the reference guard,
            strategy/strategy_handler.py:25-31)."""

            def compute(_):
                def one(flat):
                    params = model.set_flat(flat, xp=jnp)
                    strat = model.strategy(params, bn_state, zeta)
                    dists = self.distance_fn(strat, archive, xp=jnp)
                    idx = jnp.arange(archive.shape[0])
                    return jnp.min(jnp.where(idx < count, dists, jnp.inf))

                return jax.vmap(one)(pop_flats)

            def skip(_):
                return jnp.zeros((pop_flats.shape[0],), jnp.float32)

            return jax.lax.cond(count >= 2, compute, skip, None)

        self._batch_novelty = jax.jit(batch_novelty)

    def compute_novelty(self, flats, bn_state, zeta, archive, count: int) -> np.ndarray:
        """Per-row novelty of ``flats`` [K, d] vs a zero-padded [H, Z, F]
        archive tensor holding ``count`` live entries — callers pad to a
        fixed H so the jit cache stays warm across broadcasts."""
        if self.distance_fn is None or zeta is None or archive is None or count < 2:
            return np.zeros(np.asarray(flats).shape[0], np.float32)
        archive = np.asarray(archive, np.float32)
        if archive.ndim != 3:
            return np.zeros(np.asarray(flats).shape[0], np.float32)
        return np.asarray(
            self._batch_novelty(
                jnp.asarray(flats, jnp.float32), bn_state,
                jnp.asarray(zeta, jnp.float32), jnp.asarray(archive),
                jnp.int32(count),
            )
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
        zeta=None,
        archive=None,
        archive_count: int = 0,
    ) -> List[FDReturn]:
        """One episode per population member (member ``id_offset + i`` <->
        env i), lockstep.  ``id_offset`` keeps member ids globally unique
        across elastic fat clients.

        When ``normalize_obs`` and ``obs_stats_update_chance`` are set, each
        member samples its own Welford delta from the raw observations it
        visits (reference worker/agent.py:38-39) and ships it on its return;
        when ``zeta``/``archive`` (and a ``distance_fn``) are given, each
        return also carries its device-computed novelty vs the broadcast
        archive (reference worker/worker.py:53)."""
        n = self.n
        lanes = self.lanes
        L = len(lanes)
        pop_flats = self._perturb(jnp.asarray(flat, jnp.float32), epoch, id_offset)
        # lane l covers global members [starts[l], starts[l] + lanes[l].n_envs)
        starts = np.cumsum([0] + [l.n_envs for l in lanes])[:-1]
        lane_flats = [
            jax.lax.slice_in_dim(pop_flats, int(s), int(s) + l.n_envs)
            for s, l in zip(starts, lanes)
        ]
        obs = [l.reset_all() for l in lanes]
        obs_shape = obs[0].shape[1:]
        obs_mean = jnp.zeros(obs_shape) if obs_mean is None else jnp.asarray(obs_mean)
        obs_std = jnp.ones(obs_shape) if obs_std is None else jnp.asarray(obs_std)

        rewards = np.zeros(n, np.float64)
        ent_sum = np.zeros(n, np.float64)
        steps = np.zeros(n, np.int64)
        alive = [np.ones(l.n_envs, bool) for l in lanes]

        sample_stats = self.normalize_obs and self.obs_stats_update_chance > 0
        if sample_stats:
            stats = BatchWelford(n, obs_shape)
            stats_rng = np.random.default_rng(
                np.asarray(jax.random.key_data(key)).ravel().astype(np.uint32)
            )

        recurrent = self.model.recurrent
        carry = [None] * L
        prev_rewards = [None] * L
        if recurrent:
            for l, lane in enumerate(lanes):
                carry[l] = self._init_carry(lane.n_envs)
                prev_rewards[l] = jnp.zeros(lane.n_envs, jnp.float32)

        def dispatch(l, sub):
            """Async device dispatch of lane l's forward for its current obs.
            The lane key folds in the lane's GLOBAL member-id base, so a
            member's action stream depends on its global id, not on how the
            shard happens to be cut into lanes — an L-lane evaluation of
            [0, n) equals L single-lane evaluations of its blocks."""
            lane_key = jax.random.fold_in(sub, id_offset + int(starts[l]))
            if sample_stats:
                # sample the RAW obs the member is about to act on
                g = slice(starts[l], starts[l] + lanes[l].n_envs)
                stats.update_masked(
                    np.asarray(obs[l]),
                    alive[l]
                    & (stats_rng.random(lanes[l].n_envs) < self.obs_stats_update_chance),
                    rows=g,
                )
            if recurrent:
                a, e, carry[l] = self._act_recurrent(
                    lane_flats[l], bn_state, obs[l], prev_rewards[l], carry[l],
                    lane_key, obs_mean, obs_std,
                )
                return a, e
            return self._act(lane_flats[l], bn_state, obs[l], lane_key, obs_mean, obs_std)

        key, sub = jax.random.split(key)
        pending = [dispatch(l, sub) for l in range(L)]
        for t in range(horizon):
            key, sub = jax.random.split(key)
            for l, lane in enumerate(lanes):
                if pending[l] is None:
                    continue
                # sync point: while lane l's actions materialize here, the
                # device is already computing the OTHER lanes' forwards and
                # the host just finished stepping lane l-1 — the overlap that
                # hides host env time behind device compute (and vice versa)
                actions, entropies = pending[l]
                actions = np.asarray(actions)
                o, rew, done = lane.step(actions)
                obs[l] = o
                if recurrent:
                    # the policy consumes the previous transition's reward
                    # next step (reference utils/impala_env_wrapper.py:25-28
                    # timing); finished members' carries/rewards go stale
                    # harmlessly — the alive mask stops their accounting
                    prev_rewards[l] = jnp.asarray(rew, jnp.float32)
                g = slice(starts[l], starts[l] + lane.n_envs)
                a = alive[l]
                # basic-slice views write through to the global accumulators
                rewards[g][a] += rew[a]
                ent_sum[g][a] += np.asarray(entropies)[a]
                steps[g][a] += 1
                alive[l] = a & ~np.asarray(done)
                pending[l] = (
                    dispatch(l, sub) if (t + 1 < horizon and alive[l].any()) else None
                )
            if all(p is None for p in pending):
                break

        novelty = self.compute_novelty(pop_flats, bn_state, zeta, archive, archive_count)

        out = []
        for i in range(n):
            r = FDReturn(
                epoch=epoch,
                encoded_noise="{},{}".format(epoch, id_offset + i),
                reward=float(rewards[i]),
                novelty=float(novelty[i]),
                entropy=float(ent_sum[i] / max(int(steps[i]), 1)),
                timesteps=int(steps[i]),
            )
            if sample_stats and stats.count[i] > 0:
                r.obs_stats_update = stats.serialize_member(i)
            out.append(r)
        return out
