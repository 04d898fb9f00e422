"""A TPU slice acting as ONE elastic client: device-evaluated population
shards feeding the distributed learner.

This closes the staleness loop docs/ASYNC.md section 2 sketches — the TPU
mapping of the reference's delayed-return machinery (reference
learner/finite_differences.py:66-92 and run_client.py's worker role): the
slice evaluates a whole population shard per window with the vectorized
on-device engine (vmap(P) x lax.scan(T), fd/rollout.py), at whatever
broadcast parameters it last applied.  Every return is counter-encoded
"(epoch, member)", so if the server has advanced Delta epochs by the time
the shard lands, the learner regenerates the noise and drift-corrects it
through the policy-history distance map instead of discarding the work.

Requires the server to run with ``noise_kind="counter"`` on a JAX-native
env id; the shared base seed ships in the wire cfg (never client-minted).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dfd_tpu.core import welford
from dfd_tpu.core.noise import CounterNoise
from dfd_tpu.core.welford import Welford
from dfd_tpu.distributed.client import FDClient
from dfd_tpu.fd import rollout as fd_rollout
from dfd_tpu.fd.returns import FDReturn
from dfd_tpu.utils.profiling import StageTimer


class SliceClientRunner:
    def __init__(
        self,
        n_members: int = 64,
        address: str = "localhost",
        port: int = 1025,
        apply_state_every: int = 1,
        mesh: Optional[jax.sharding.Mesh] = None,
        mesh_axis: str = "pop",
        wait_for_new_state: bool = False,
        state_wait_timeout: float = 60.0,
        population_chunk: Optional[int] = None,
    ):
        """``apply_state_every``: apply NEW_STATE broadcasts only every k-th
        window — k>1 deliberately lags the shard's epoch tag behind the
        server (the staleness regime the drift correction exists for;
        in production the lag arises from compute/transfer time instead).

        ``wait_for_new_state``: after submitting a window, poll (up to
        ``state_wait_timeout`` s) until the server broadcasts a fresh state
        before collecting the next one.  Off by default (pure async — a fast
        slice may evaluate several windows at the same stale epoch); on, the
        slice paces 1:1 with learner epochs instead of burning device time
        re-evaluating parameters it has already covered.

        ``mesh``: optional device mesh; the population shard is sharded over
        its ``mesh_axis`` so one slice-client spans all local chips.

        ``population_chunk``: evaluate the shard in memory-bounded chunks of
        this many members (the vectorized trainer's big-model escape hatch,
        runners/vectorized.py) — only ~chunk x d perturbed parameters are
        ever live, so a slice shard can run production-width pixel models
        that would OOM densely.  Must divide ``n_members``."""
        if population_chunk is not None and population_chunk > 0:
            if n_members % population_chunk != 0:
                raise ValueError("population_chunk must divide n_members")
        self.population_chunk = population_chunk
        self.n_members = n_members
        self.address, self.port = address, port
        self.apply_state_every = max(int(apply_state_every), 1)
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        self.wait_for_new_state = wait_for_new_state
        self.state_wait_timeout = state_wait_timeout
        self.client = FDClient()
        self.windows = 0
        self.epoch = 0
        # per-window wall-clock stages (SURVEY section 5.1's observability on
        # the worker side): refreshed into last_stages after every submit
        self.timer = StageTimer()
        self.last_stages: dict = {}

    def run(self, max_windows: Optional[int] = None, reconnect_attempts: int = 60) -> bool:
        client = self.client
        client.connect(address=self.address, port=self.port)

        status = client.get_server_state()
        failures = 0
        while status != FDClient.NEW_EXPERIMENT_FLAG:
            # bounded like the reference's reconnect loop (run_client.py:60-78):
            # a dead server must terminate the worker, not spin it forever
            if status == FDClient.RPC_FAILED_FLAG:
                failures += 1
                if failures > reconnect_attempts:
                    client.disconnect()
                    return False
                time.sleep(1)
            else:
                time.sleep(0.2)
            status = client.get_server_state()
        self._configure(client.current_state.cfg)
        self._apply_state(client.current_state)

        while max_windows is None or self.windows < max_windows:
            self.windows += 1
            with self.timer.stage("rollout"):
                returns = self._collect_window()
            with self.timer.stage("submit"):
                client.submit_returns(returns)
            self.last_stages = self.timer.report()

            status = client.get_server_state()
            if self.wait_for_new_state:
                deadline = time.time() + self.state_wait_timeout
                while (
                    status == FDClient.OPERATION_SUCCESSFUL_FLAG
                    and time.time() < deadline
                ):
                    time.sleep(0.02)
                    status = client.get_server_state()
            if status == FDClient.RPC_FAILED_FLAG:
                recovered = False
                for _ in range(reconnect_attempts):
                    time.sleep(1)
                    status = client.get_server_state()
                    if status != FDClient.RPC_FAILED_FLAG:
                        recovered = True
                        break
                if not recovered:
                    client.disconnect()
                    return False
            if status == FDClient.NEW_EXPERIMENT_FLAG:
                self._configure(client.current_state.cfg)
                self._apply_state(client.current_state)
            elif status == FDClient.NEW_STATE_FLAG and (
                self.windows % self.apply_state_every == 0
            ):
                self._apply_state(client.current_state)

        client.disconnect()
        return True

    # -- internals ---------------------------------------------------------------

    def _configure(self, cfg: dict) -> None:
        if cfg.get("noise_kind") != "counter":
            raise RuntimeError("slice clients need the server started with noise_kind='counter'")
        from dfd_tpu.utils.factory import get_vectorized_init_data

        env_id = cfg["env_id"]
        self._seed = int(cfg["random_seed"])
        sigma = float(cfg["noise_std"])
        self.sigma = sigma
        self.normalize_obs = bool(cfg["normalize_obs"])
        self.obs_stats_update_chance = float(cfg["obs_stats_update_chance"])
        self.antithetic = bool(cfg.get("antithetic", False))
        if self.antithetic and self.n_members % 2 != 0:
            raise RuntimeError("antithetic mode needs an even shard size")

        env, model, distance_fn = get_vectorized_init_data(env_id)
        self.model = model
        self.env = env
        self.distance_fn = distance_fn
        self.horizon = env.max_episode_steps
        self.max_history = int(cfg.get("max_strategy_history_size", 2))
        self.noise = CounterNoise(
            model.num_params, random_seed=int(cfg["noise_seed"]), antithetic=self.antithetic
        )
        self.fixed_obs_stats = Welford(model.input_shape)
        _, self.bn_state = model.init(self._seed)
        self.flat = None
        self._key = jax.random.key(self._seed)

        P = self.n_members
        noise = self.noise
        horizon = self.horizon
        normalize_obs = self.normalize_obs
        chance = self.obs_stats_update_chance if normalize_obs else 0.0
        # one zero-noise deterministic eval member fused into the population
        # vmap (the ~free-eval trick, runners/vectorized.py); on a mesh the
        # slot is replicated once per device so P + n_eval still shards evenly
        n_eval = 1 if self.mesh is None else int(self.mesh.shape[self.mesh_axis])
        self.n_eval = n_eval

        chunk = self.population_chunk
        chunked = bool(chunk) and chunk < P

        def eval_shard(flat, epoch, member_ids, bn_state, key, obs_mean, obs_std,
                       zeta, archive, archive_count):
            Z = zeta.shape[0]
            pop_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(member_ids)
            eval_key = jax.random.fold_in(key, jnp.uint32(0xE7A1))

            def one(params, k, d, limit):
                return fd_rollout.episode_rollout(
                    model, env, params, bn_state, k, horizon,
                    deterministic=d,
                    obs_mean=obs_mean, obs_std=obs_std,
                    normalize_obs=normalize_obs,
                    obs_stats_update_chance=chance,
                    collect_states=False,
                    collect_limit=limit,
                )

            # novelty vs the broadcast archive (guard: <2 entries -> 0,
            # forwards skipped — reference strategy_handler.py:25-31)
            def novelty_of(all_params, n):
                def compute_nov(_):
                    def nov_one(params):
                        strat = model.strategy(params, bn_state, zeta)
                        dists = distance_fn(strat, archive, xp=jnp)
                        idx = jnp.arange(archive.shape[0])
                        return jnp.min(jnp.where(idx < archive_count, dists, jnp.inf))

                    return jax.vmap(nov_one)(all_params)

                return jax.lax.cond(
                    archive_count >= 2, compute_nov,
                    lambda _: jnp.zeros((n,), jnp.float32), None,
                )

            def members_plus_eval(ids, ks, n_pop):
                """n_pop perturbed members + n_eval zero-noise deterministic
                eval slots at the tail (every eval slot carries eval_key
                itself: the eval episode is identical with or without a
                mesh)."""
                eps = jax.vmap(lambda i: noise.generate(epoch, i))(ids)
                all_flats = self._shard(
                    jnp.concatenate(
                        [flat[None, :] + sigma * eps, jnp.tile(flat[None, :], (n_eval, 1))]
                    )
                )
                all_keys = jnp.concatenate([ks, jnp.repeat(eval_key[None], n_eval, axis=0)])
                det = jnp.zeros((n_pop + n_eval,), bool).at[n_pop:].set(True)
                all_params = jax.vmap(lambda v: model.set_flat(v, xp=jnp))(all_flats)
                res = jax.vmap(lambda p, k, d: one(p, k, d, Z))(all_params, all_keys, det)
                return res, novelty_of(all_params, n_pop + n_eval)

            if not chunked:
                res, novelty = members_plus_eval(member_ids, pop_keys, P)
                pop_reward, pop_entropy, pop_steps = res.reward[:P], res.entropy[:P], res.steps[:P]
                pop_nov = novelty[:P]
                ev = jax.tree.map(lambda x: x[P], res)
                ev_nov = novelty[P]
                # one merged Welford delta per window: population members plus
                # ONE eval member (replicated eval slots would double-count)
                merged_stats = welford.jnp_merge_population(
                    jax.tree.map(lambda x: x[: P + 1], res.obs_stats)
                )
            else:
                # memory-bounded: only chunk 0 (peeled out of the lax.map)
                # carries the eval slots and the [C, Z, *obs] state-collect
                # buffers; the remaining chunks run the lean body, so at most
                # ~C x d perturbed parameters are live at once — the
                # production-width escape hatch (runners/vectorized.py)
                C = chunk
                ids_c = member_ids.reshape(P // C, C)
                keys_c = pop_keys.reshape(P // C, C)
                res0, nov0 = members_plus_eval(ids_c[0], keys_c[0], C)
                ev = jax.tree.map(lambda x: x[C], res0)
                ev_nov = nov0[C]
                merged0 = welford.jnp_merge_population(
                    jax.tree.map(lambda x: x[: C + 1], res0.obs_stats)
                )

                def chunk_body(args):
                    ids, ks = args
                    eps = jax.vmap(lambda i: noise.generate(epoch, i))(ids)
                    flats = self._shard(flat[None, :] + sigma * eps)
                    params = jax.vmap(lambda v: model.set_flat(v, xp=jnp))(flats)
                    res = jax.vmap(
                        lambda p, k: one(p, k, jnp.asarray(False), None)
                    )(params, ks)
                    merged = welford.jnp_merge_population(res.obs_stats)
                    return (res.reward, res.entropy, res.steps,
                            novelty_of(params, C), merged)

                r_rew, r_ent, r_steps, r_nov, r_stats = jax.lax.map(
                    chunk_body, (ids_c[1:], keys_c[1:])
                )
                cat = lambda a, b: jnp.concatenate([a, b.reshape((P - C,))])
                pop_reward = cat(res0.reward[:C], r_rew)
                pop_entropy = cat(res0.entropy[:C], r_ent)
                pop_steps = cat(res0.steps[:C], r_steps)
                pop_nov = cat(nov0[:C], r_nov)
                merged_stats = welford.jnp_merge(
                    merged0, welford.jnp_merge_population(r_stats)
                )

            return (
                pop_reward, pop_entropy, pop_steps, pop_nov,
                ev.reward, ev.entropy, ev.steps, ev.states, ev_nov,
                merged_stats,
            )

        self._eval_shard = jax.jit(eval_shard)

    def _shard(self, x):
        if self.mesh is None:
            return x
        spec = jax.sharding.PartitionSpec(self.mesh_axis, *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            x, jax.sharding.NamedSharding(self.mesh, spec)
        )

    def _apply_state(self, state) -> None:
        with self.timer.stage("apply_state"):
            self._apply_state_inner(state)

    def _apply_state_inner(self, state) -> None:
        # the wire ships the full state_dict view (params + BN buffers)
        flat_params, bn_state = self.model.deserialize(
            np.asarray(state.policy_params, np.float32), xp=np
        )
        self.flat = self.model.get_flat(flat_params)
        self.bn_state = jax.tree.map(jnp.asarray, bn_state)
        self.epoch = state.epoch
        if state.obs_stats is not None:
            self.fixed_obs_stats.deserialize(state.obs_stats)
        # zeta + zero-padded archive for device-side novelty; the fixed
        # leading extent keeps one jit compilation across broadcasts
        self.zeta = (
            np.asarray(state.strategy_frames, np.float32)
            if state.strategy_frames is not None
            else np.zeros((1,) + tuple(self.env.obs_shape), np.float32)
        )
        t = state.strategy_history
        F = (
            self.model.output_shape
            if self.model.discrete
            else 2 * self.model.output_shape
        )
        self.archive = np.zeros((self.max_history, self.zeta.shape[0], F), np.float32)
        self.archive_count = 0
        if t is not None and np.asarray(t).ndim == 3:
            t = np.asarray(t, np.float32)
            self.archive_count = min(len(t), self.max_history)
            self.archive[: self.archive_count] = t[: self.archive_count]

    def _collect_window(self):
        self._key, sub = jax.random.split(self._key)
        offset = ((self._seed * 2654435761) ^ (self.windows * 131)) & 0x3FFFFFFF
        if self.antithetic:
            offset &= ~1  # complete +-eps pairs per shard
        member_ids = offset + jnp.arange(self.n_members)
        obs_mean = jnp.asarray(self.fixed_obs_stats.mean, jnp.float32)
        obs_std = jnp.asarray(self.fixed_obs_stats.std, jnp.float32)
        (rewards, entropies, steps, novelty,
         ev_reward, ev_entropy, ev_steps, ev_states, ev_novelty,
         merged_stats) = self._eval_shard(
            jnp.asarray(self.flat), self.epoch, member_ids, self.bn_state,
            sub, obs_mean, obs_std,
            jnp.asarray(self.zeta), jnp.asarray(self.archive),
            jnp.int32(self.archive_count),
        )
        rewards = np.asarray(rewards)
        entropies = np.asarray(entropies)
        steps = np.asarray(steps)
        novelty = np.asarray(novelty)
        returns = [
            FDReturn(
                epoch=self.epoch,
                encoded_noise="{},{}".format(self.epoch, int(offset) + i),
                reward=float(rewards[i]),
                novelty=float(novelty[i]),
                entropy=float(entropies[i]),
                timesteps=int(steps[i]),
            )
            for i in range(self.n_members)
        ]
        # the window's merged Welford delta rides on the first return (the
        # Chan merge is associative, so one merged delta per window is
        # equivalent to the reference's per-return deltas, run_server.py:143)
        n_sampled = float(merged_stats.count)
        if n_sampled > 0:
            returns[0].obs_stats_update = (
                np.asarray(merged_stats.mean, np.float64).ravel().tolist()
                + np.asarray(merged_stats.m2, np.float64).ravel().tolist()
                + [n_sampled]
            )
        # eval duties: the fused deterministic member refreshes zeta, the EMA
        # baselines and omega server-side (reference worker/worker.py:34-35)
        n_keep = int(min(int(ev_steps), self.zeta.shape[0]))
        returns.append(
            FDReturn(
                epoch=self.epoch,
                encoded_noise="0",
                reward=float(ev_reward),
                novelty=float(ev_novelty),
                entropy=float(ev_entropy),
                timesteps=int(ev_steps),
                is_eval=True,
                eval_states=np.asarray(ev_states)[:n_keep],
            )
        )
        return returns
