"""The TPU-native trainer: one jitted SPMD program per epoch.

Inversion of the reference's asynchronous client/server (reference
run_server.py / run_client.py): instead of N CPU processes streaming returns
over gRPC, a population of P seeded perturbations rolls out in lockstep on
the device mesh —

  - noise is counter-based (``fold_in(key, epoch), member_id``), so a
    perturbation never exists as traffic, only as an id (the TPU analogue of
    the reference's encoded PCG64 state, utils/noise_sources.py:4-20);
  - rollouts are ``vmap(P) x lax.scan(T)`` fused with the policy forward
    (fd/rollout.py);
  - the gradient is the on-device fitness-weighted combine (fd/combine.py),
    whose population contraction XLA lowers to collectives over ICI when P
    is sharded across a mesh;
  - DSGD, the omega schedule, EMA baselines, zeta replacement and the merged
    Welford observation statistics all live inside the same jitted step;
  - only the tiny, sequential, data-dependent pieces stay on host between
    epochs: the strategy-archive accept/evict logic and metrics.

The per-epoch broadcast/collect of the reference (O(params) gRPC traffic per
client) becomes zero host traffic: parameters are device-resident and
replicated; cross-chip traffic is the O(d) psum of the combine.
"""

from __future__ import annotations

import time
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dfd_tpu.config import TrainConfig
from dfd_tpu.core import welford
from dfd_tpu.core.noise import CounterNoise
from dfd_tpu.envs.base import JaxEnv
from dfd_tpu.fd import combine as fd_combine
from dfd_tpu.fd import rollout as fd_rollout
from dfd_tpu.fd.dsgd import DSGDParams, dsgd_update, lr_scale_from_omega
from dfd_tpu.fd.omega import OmegaParams, OmegaState, omega_init, omega_step
from dfd_tpu.models.base import PolicyModel
from dfd_tpu.novelty.handler import StrategyHandler
from dfd_tpu.utils.metrics import EpochReporter
from dfd_tpu.utils.profiling import StageTimer


class TrainState(NamedTuple):
    flat: jnp.ndarray            # [d] trainable parameters (replicated)
    bn_state: Any                # non-trainable model state
    omega: OmegaState
    obs_stats: welford.WelfordState
    zeta: jnp.ndarray            # [Z, *obs]
    policy_reward: jnp.ndarray   # EMA scalars
    policy_entropy: jnp.ndarray
    policy_novelty: jnp.ndarray
    epoch: jnp.ndarray           # i32
    key: jnp.ndarray


class VectorizedTrainer:
    def __init__(
        self,
        model: PolicyModel,
        env: JaxEnv,
        distance_fn,
        cfg: TrainConfig,
        mesh: Optional[jax.sharding.Mesh] = None,
        reporter: Optional[EpochReporter] = None,
    ):
        self.model = model
        self.env = env
        self.distance_fn = distance_fn
        self.cfg = cfg
        self.mesh = mesh
        self.reporter = reporter or EpochReporter(quiet=True)

        self.P = cfg.batch_size
        self.horizon = cfg.episode_length or env.max_episode_steps
        if cfg.antithetic and self.P % 2 != 0:
            raise ValueError("antithetic mode pairs members 2k/2k+1: batch_size must be even")
        self.noise = CounterNoise(
            model.num_params, random_seed=cfg.random_seed, antithetic=cfg.antithetic
        )

        params, bn_state = model.init(cfg.random_seed)
        self._init_params = params
        flat = jnp.asarray(model.get_flat(params))

        self.handler = StrategyHandler(
            model, bn_state, distance_fn, max_history_size=cfg.max_strategy_history_size
        )
        self.H = cfg.max_strategy_history_size

        self.dsgd_hp = DSGDParams(
            lr=cfg.learning_rate,
            sqrt_d=float(np.sqrt(model.num_params)),
            min_scale=cfg.dsgd_min_scale,
            max_scale=cfg.dsgd_max_scale,
        )
        self.omega_hp = OmegaParams(
            improvement_threshold=cfg.omega.improvement_threshold,
            min_omega=cfg.omega.min_value,
            max_omega=cfg.omega.max_value,
            increase=1.0 / cfg.omega.steps_to_max,
            decrease=1.0 / cfg.omega.steps_to_min,
        )

        zeta = self._seed_zeta()
        self._vbn_buffer = (
            self._seed_buffer(cfg.vbn_buffer_size, with_rewards=True)
            if cfg.vbn_buffer_size > 0
            else None
        )
        self.state = TrainState(
            flat=flat,
            bn_state=jax.tree.map(jnp.asarray, bn_state),
            omega=omega_init(cfg.omega.default_value, cfg.omega.reward_history_size),
            obs_stats=welford.jnp_init(env.obs_shape),
            zeta=zeta,
            policy_reward=jnp.float32(0),
            policy_entropy=jnp.float32(0),
            policy_novelty=jnp.float32(0),
            epoch=jnp.int32(0),
            key=jax.random.key(cfg.random_seed),
        )
        self.cumulative_timesteps = 0
        self._last_archived = None
        self.timer = StageTimer()
        self._panel_cache = {}

        self._e_flat = False
        self._step = self._resolve_e_lowering() or self._make_step()

    # -- public ------------------------------------------------------------------

    def set_env(self, env: JaxEnv) -> None:
        """Swap the environment mid-training (level curricula, domain
        randomization schedules).  The replacement must agree on the
        observation/action interface — training state (parameters, omega,
        obs stats, zeta, EMAs, epoch counter, archive) carries over; the
        epoch program is re-jitted against the new env."""
        if tuple(env.obs_shape) != tuple(self.env.obs_shape):
            raise ValueError(
                f"obs_shape mismatch: {env.obs_shape} vs {self.env.obs_shape}"
            )
        if env.discrete != self.env.discrete or (
            env.discrete
            and env.n_actions != self.env.n_actions
        ) or (not env.discrete and env.action_dim != self.env.action_dim):
            raise ValueError("action space mismatch between old and new env")
        self.env = env
        self.horizon = self.cfg.episode_length or env.max_episode_steps
        self._step = self._make_step()  # fresh trace: closes over the new env
        self._panel_cache = {}  # panel closures capture the old env

    def _archive_current(self) -> None:
        """Submit the current policy unless it is already the latest archive
        entry (guards chained train calls against duplicate snapshots)."""
        flat = np.asarray(self.state.flat)
        if self._last_archived is not None and np.array_equal(flat, self._last_archived):
            return
        self.handler.add_policy(flat)
        self._last_archived = flat.copy()

    def train(self, n_epochs: int) -> None:
        """Reference-cadence training: one jitted step per epoch with the
        strategy archive refreshed on host between epochs."""
        self._archive_current()
        for _ in range(n_epochs):
            t0 = time.perf_counter()
            with self.timer.stage("archive"):
                archive, count = self._archive_inputs()
            with self.timer.stage("device_step"):
                self.state, metrics = self._step(self.state, archive, count)
                # ONE host transfer for the whole metrics dict (forces sync);
                # per-scalar float() would pay a tunnel round-trip per key
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
            self.cumulative_timesteps += int(m.pop("_timesteps"))

            did_eval = m.pop("_did_eval") > 0
            with self.timer.stage("archive"):
                if did_eval:
                    # re-evaluate the archive on the refreshed zeta
                    # (host-driven, device-batched) — reference
                    # run_sequential.py:146-147
                    self.handler.set_zeta(np.asarray(self.state.zeta))
                if m["Update Magnitude"] > 0:
                    self._archive_current()

            m.update(
                {
                    "Epoch": int(self.state.epoch),
                    "Epoch Time": time.perf_counter() - t0,
                    "Cumulative Timesteps": self.cumulative_timesteps,
                }
            )
            m.update(self.timer.report())
            self.reporter.report(m)

    def train_fast(self, n_epochs: int, sync_every: int = 10) -> None:
        """Throughput mode: chunks of ``sync_every`` epochs are dispatched
        back-to-back with zero host round-trips inside a chunk (epochs chain
        through the state dependency; metrics are fetched after the chunk).

        Within a chunk the novelty archive tensor is frozen (novelty is
        computed against the archive as of the chunk start); archive
        submission and the zeta re-evaluation happen at chunk boundaries.
        Everything else — zeta refresh, omega, EMAs, obs stats, DSGD — is
        identical to :meth:`train`.  (An in-graph lax.scan variant was
        measured ~35x slower than chained dispatch under current XLA — the
        nested scan defeats the rollout pipeline's parallelization.)
        """
        self._archive_current()
        done = 0
        while done < n_epochs:
            n = min(sync_every, n_epochs - done)
            t0 = time.perf_counter()
            with self.timer.stage("archive"):
                archive, count = self._archive_inputs()
            per_epoch = []
            with self.timer.stage("device_step"):
                for _ in range(n):
                    self.state, metrics = self._step(self.state, archive, count)
                    per_epoch.append(metrics)
                # fetch the chunk's whole metric pytree in ONE transfer (also
                # the sync closing the chunk timing).  Per-scalar float()
                # conversion costs a host round-trip per key per epoch —
                # measured 7.5x below the chained-dispatch rate on the
                # relayed tunnel (round-4 soak, docs/RESULTS.md).
                per_epoch = jax.device_get(per_epoch)
            chunk_time = time.perf_counter() - t0

            any_eval = False
            for j, metrics in enumerate(per_epoch):
                m = {k: float(v) for k, v in metrics.items()}
                self.cumulative_timesteps += int(m.pop("_timesteps"))
                any_eval |= m.pop("_did_eval") > 0
                m.update(
                    {
                        "Epoch": int(self.state.epoch) - n + 1 + j,
                        "Epoch Time": chunk_time / n,
                        "Cumulative Timesteps": self.cumulative_timesteps,
                    }
                )
                if j == n - 1:  # stage totals attach to the chunk's last epoch
                    with self.timer.stage("archive"):
                        if any_eval:
                            self.handler.set_zeta(np.asarray(self.state.zeta))
                        self._archive_current()
                    m.update(self.timer.report())
                self.reporter.report(m)
            done += n

    # -- jitted epoch ------------------------------------------------------------

    def _make_step(self, flat_e=None):
        """Jit the epoch step through a FRESH closure.  ``jax.jit`` keys its
        trace cache on function equality, and bound methods of the same
        object compare equal — so ``jax.jit(self._epoch_step)`` would
        silently reuse a stale trace after ``set_env`` or across autotune
        candidates.  A new local function per call cannot alias."""
        fe = self._e_flat if flat_e is None else flat_e

        def _run(state, archive, archive_count):
            return self._epoch_step(state, archive, archive_count, flat_e=fe)

        return jax.jit(_run)

    def _epoch_step(self, state: TrainState, archive: jnp.ndarray, archive_count: jnp.ndarray,
                    flat_e: bool = False):
        cfg = self.cfg
        model = self.model
        P = self.P

        key, eps_key, roll_key, eval_key, tie_key, zeta_key = jax.random.split(state.key, 6)
        member_ids = jnp.arange(P)
        member_ids = self._shard_pop(member_ids)

        obs_mean, obs_std = welford.jnp_mean_std(state.obs_stats)

        E = cfg.envs_per_perturbation
        roll_keys = jax.vmap(lambda i: jax.random.fold_in(roll_key, i))(member_ids)

        def one_episode(params, k, deterministic=None, collect_limit=None):
            return fd_rollout.episode_rollout(
                model, self.env, params, state.bn_state, k, self.horizon,
                deterministic=(
                    jnp.asarray(False) if deterministic is None else deterministic
                ),
                obs_mean=obs_mean, obs_std=obs_std,
                normalize_obs=cfg.normalize_obs,
                obs_stats_update_chance=cfg.obs_stats_update_chance,
                collect_states=False,
                unroll=cfg.scan_unroll,
                collect_limit=collect_limit,
            )

        def member_rollout(params, key):
            """One member's fitness: a single episode, or the mean over
            E level-resampled episodes (the level-luck variance fix)."""
            if E == 1:
                return one_episode(params, key)
            eps_results = jax.vmap(lambda k: one_episode(params, k))(
                jax.random.split(key, E)
            )
            stats = welford.jnp_merge_population(eps_results.obs_stats)
            return fd_rollout.RolloutResult(
                reward=eps_results.reward.mean(),
                entropy=eps_results.entropy.mean(),
                steps=eps_results.steps.sum(),
                obs_stats=stats,
                states=None,
            )

        chunked = bool(cfg.population_chunk) and cfg.population_chunk < P
        # The deterministic eval episode rides the population vmap as member
        # P (zero noise): a separate batch-1 eval scan costs the same wall
        # time as the whole vmapped population rollout (identical kernel
        # count, latency-bound) — fusing it makes eval ~free.  On a mesh the
        # eval slot is replicated once per device (P + n_devices keeps the
        # population axis evenly sharded; only slot P's result is read).
        # E>1 composes: the eval slot runs E identical deterministic
        # episodes (same key) and reads episode 0 — (E-1)/((P+1)E) wasted
        # frames vs a whole extra latency-bound eval scan (measured +30%
        # epoch throughput at prod widths, E=2).  Under population chunking
        # the eval slots ride CHUNK 0, which is peeled out of the lax.map
        # (one extra trace of the chunk body) so only that chunk pays the
        # [C, collect_limit, *obs] state-collection carry — the remaining
        # chunks keep the lean body, and eval stays ~free exactly in the
        # production-width regime where epochs are most expensive.
        Z = state.zeta.shape[0]
        n_eval = 1 if self.mesh is None else int(self.mesh.shape[self.cfg.mesh_axes[0]])
        fused_eval = Z > 0
        do_eval = (state.epoch % cfg.eval_every) == 0

        def fused_member(params, key, d):
            # population members use the same E-way key split as
            # member_rollout (bit-identical episodes); eval slots repeat
            # their key so episode 0 IS the separate-path eval episode, and
            # the E-reduction collapses to it
            split = jax.random.key_data(jax.random.split(key, E))
            same = jnp.broadcast_to(jax.random.key_data(key), split.shape)
            keys_e = jax.random.wrap_key_data(jnp.where(d, same, split))
            res_e = jax.vmap(
                lambda k: one_episode(params, k, deterministic=d, collect_limit=Z)
            )(keys_e)
            merged = welford.jnp_merge_population(res_e.obs_stats)
            first = jax.tree.map(lambda x: x[0], res_e.obs_stats)
            pick = lambda a, b: jnp.where(d, a, b)
            return fd_rollout.RolloutResult(
                reward=pick(res_e.reward[0], res_e.reward.mean()),
                entropy=pick(res_e.entropy[0], res_e.entropy.mean()),
                steps=pick(res_e.steps[0], res_e.steps.sum()),
                obs_stats=jax.tree.map(pick, first, merged),
                states=res_e.states[0],
            )

        if chunked:
            # 1-3 fused, memory-bounded: lax.map over population chunks; the
            # noise, perturbed parameters, rollout state and novelty of only
            # one chunk are ever live (~C x d instead of P x d) — the
            # big-model escape hatch (SURVEY.md section 7 hard part 7).
            # Combine later regenerates noise chunk-by-chunk the same way.
            C = cfg.population_chunk
            assert P % C == 0, "population_chunk must divide batch_size"
            assert cfg.noise_backend != "pallas", "pallas backend is already memory-bounded"

            ids_c = member_ids.reshape(P // C, C)
            keys_c = roll_keys.reshape(P // C, C)

            def eval_chunk(args):
                ids, ks = args
                eps_c = jax.vmap(lambda i: self.noise.generate(state.epoch, i))(ids)
                flats_c = state.flat[None, :] + cfg.noise_std * eps_c
                params_c = jax.vmap(lambda v: model.set_flat(v, xp=jnp))(flats_c)
                res = jax.vmap(member_rollout)(params_c, ks)
                nov = self._batch_novelty(params_c, state, archive, archive_count)
                return res, nov

            if fused_eval:
                # chunk 0, peeled out of the map, carries the n_eval
                # deterministic eval slots (zero noise, eval_key) at its
                # tail — one chunk-width dispatch instead of a separate
                # full-latency eval scan
                def chunk0(ids, ks):
                    eps_c = jax.vmap(lambda i: self.noise.generate(state.epoch, i))(ids)
                    all_flats = self._shard_pop(
                        jnp.concatenate(
                            [
                                state.flat[None, :] + cfg.noise_std * eps_c,
                                jnp.tile(state.flat[None, :], (n_eval, 1)),
                            ],
                            axis=0,
                        )
                    )
                    all_keys = jnp.concatenate(
                        [ks, jnp.repeat(eval_key[None], n_eval, axis=0)]
                    )
                    det = jnp.zeros((C + n_eval,), bool).at[C:].set(True)
                    all_params = jax.vmap(lambda v: model.set_flat(v, xp=jnp))(all_flats)
                    if E == 1:
                        res_plus = jax.vmap(
                            lambda p, k, d: one_episode(
                                p, k, deterministic=d, collect_limit=Z
                            )
                        )(all_params, all_keys, det)
                    else:
                        res_plus = jax.vmap(fused_member)(all_params, all_keys, det)
                    nov_plus = self._batch_novelty(
                        all_params, state, archive, archive_count
                    )
                    res0 = jax.tree.map(lambda x: x[:C], res_plus)._replace(states=None)
                    ev = jax.tree.map(lambda x: x[C], res_plus)
                    return res0, nov_plus[:C], ev, nov_plus[C]

                res0, nov0, fused_eval_res, fused_eval_novelty = chunk0(
                    ids_c[0], keys_c[0]
                )
                rest, nov_rest = jax.lax.map(eval_chunk, (ids_c[1:], keys_c[1:]))
                result = jax.tree.map(
                    lambda a, b: jnp.concatenate(
                        [a, b.reshape((P - C,) + b.shape[2:])], axis=0
                    ),
                    res0,
                    rest,
                )
                novelty = jnp.concatenate([nov0, nov_rest.reshape(P - C)])
            else:
                result, novelty = jax.lax.map(eval_chunk, (ids_c, keys_c))
                result = jax.tree.map(lambda x: x.reshape((P,) + x.shape[2:]), result)
                novelty = novelty.reshape(P)
            eps = None
            noise_ssq = None
        else:
            # 1. perturb: theta_i = theta + sigma * eps_i (eps from counter ids)
            if cfg.noise_backend == "pallas":
                from dfd_tpu.ops.perturb import pallas_perturb

                pop_flats, noise_ssq = pallas_perturb(
                    state.flat, cfg.noise_std, cfg.random_seed, state.epoch, P,
                    antithetic=cfg.antithetic,
                )
                pop_flats = self._shard_pop(pop_flats)
                eps = None
            else:
                eps = jax.vmap(lambda i: self.noise.generate(state.epoch, i))(member_ids)
                eps = self._shard_pop(eps)
                noise_ssq = None
                pop_flats = state.flat[None, :] + cfg.noise_std * eps
            if fused_eval:
                # every eval slot carries eval_key itself, so the slot-P
                # episode is bit-identical to the single-chip fused eval
                eval_keys = jnp.repeat(eval_key[None], n_eval, axis=0)
                all_flats = self._shard_pop(
                    jnp.concatenate(
                        [pop_flats, jnp.tile(state.flat[None, :], (n_eval, 1))], axis=0
                    )
                )
                all_keys = jnp.concatenate([roll_keys, eval_keys])
                det = jnp.zeros((P + n_eval,), bool).at[P:].set(True)
                all_params = jax.vmap(lambda v: model.set_flat(v, xp=jnp))(all_flats)
                if E == 1:
                    result_plus = jax.vmap(
                        lambda p, k, d: one_episode(p, k, deterministic=d, collect_limit=Z)
                    )(all_params, all_keys, det)
                elif flat_e:
                    # Flat E-lowering: collapse (member, episode) into ONE
                    # population axis of (P+n_eval)*E.  A nested
                    # vmap(P)∘vmap(E) measures 2.7x slower than the flat
                    # vmap on the same episode count (nested batch dims
                    # defeat XLA's batching of the scanned kernels); the
                    # cost is E materialized parameter copies, so the
                    # "auto" gate falls back to the nested form when
                    # E*(P+n_eval)*d exceeds the memory budget.
                    # Episode keys are IDENTICAL to the nested/chunked
                    # form: member i's episode j uses split(key_i, E)[j],
                    # eval slots repeat eval_key so episode 0 is the
                    # separate-path eval episode.
                    M = P + n_eval
                    split_kd = jax.random.key_data(
                        jax.vmap(lambda k: jax.random.split(k, E))(all_keys)
                    )  # [M, E, key_words]
                    same_kd = jnp.broadcast_to(
                        jax.random.key_data(all_keys)[:, None], split_kd.shape
                    )
                    d_keys = det.reshape((M,) + (1,) * (split_kd.ndim - 1))
                    keys_flat = jax.random.wrap_key_data(
                        jnp.where(d_keys, same_kd, split_kd).reshape(
                            (M * E,) + split_kd.shape[2:]
                        )
                    )
                    rep_flats = self._shard_pop(jnp.repeat(all_flats, E, axis=0))
                    rep_params = jax.vmap(lambda v: model.set_flat(v, xp=jnp))(rep_flats)
                    det_flat = jnp.repeat(det, E)
                    res_flat = jax.vmap(
                        lambda p, k, d: one_episode(p, k, deterministic=d, collect_limit=Z)
                    )(rep_params, keys_flat, det_flat)
                    resh = jax.tree.map(
                        lambda x: x.reshape((M, E) + x.shape[1:]), res_flat
                    )
                    merged = jax.vmap(welford.jnp_merge_population)(resh.obs_stats)
                    first = jax.tree.map(lambda x: x[:, 0], resh.obs_stats)

                    def pick(a, b):
                        d2 = det.reshape((M,) + (1,) * (a.ndim - 1))
                        return jnp.where(d2, a, b)

                    result_plus = fd_rollout.RolloutResult(
                        reward=pick(resh.reward[:, 0], resh.reward.mean(axis=1)),
                        entropy=pick(resh.entropy[:, 0], resh.entropy.mean(axis=1)),
                        steps=pick(resh.steps[:, 0], resh.steps.sum(axis=1)),
                        obs_stats=jax.tree.map(pick, first, merged),
                        states=resh.states[:, 0],
                    )
                else:
                    result_plus = jax.vmap(fused_member)(all_params, all_keys, det)
                result = jax.tree.map(lambda x: x[:P], result_plus)
                fused_eval_res = jax.tree.map(lambda x: x[P], result_plus)
                novelty_plus = self._batch_novelty(all_params, state, archive, archive_count)
                novelty = novelty_plus[:P]
                fused_eval_novelty = novelty_plus[P]
                pop_params = jax.tree.map(lambda x: x[:P], all_params)
                # fall through to step 4, which slices instead of re-rolling
            else:
                pop_params = jax.vmap(lambda v: model.set_flat(v, xp=jnp))(pop_flats)

            # 2. population rollout (E episodes per member, averaged)
            if fused_eval:
                pass  # rolled out above, fused with the eval member
            else:
                result = jax.vmap(member_rollout)(pop_params, roll_keys)

            # 3. novelty of each perturbed policy vs the archive (the fused
            # path computed it above, together with the eval member's)
            if not fused_eval:
                novelty = self._batch_novelty(pop_params, state, archive, archive_count)

        # 4. eval episode (unperturbed, deterministic).  Fused path: member P
        # of the population rollout above; its contributions are masked on
        # non-eval epochs to match the legacy cond-skipped semantics.
        if fused_eval:
            eval_novelty = jnp.where(do_eval, fused_eval_novelty, jnp.float32(0))
            zero_stats = welford.jnp_init(self.env.obs_shape)
            eval_res = fused_eval_res._replace(
                obs_stats=jax.tree.map(
                    lambda live, zero: jnp.where(do_eval, live, zero),
                    fused_eval_res.obs_stats, zero_stats,
                ),
                steps=jnp.where(do_eval, fused_eval_res.steps, jnp.int32(0)),
            )
        else:
            base_params = model.set_flat(state.flat, xp=jnp)

            def run_eval(_):
                res = fd_rollout.episode_rollout(
                    model, self.env, base_params, state.bn_state, eval_key, self.horizon,
                    deterministic=jnp.asarray(True),
                    obs_mean=obs_mean, obs_std=obs_std,
                    normalize_obs=cfg.normalize_obs,
                    obs_stats_update_chance=cfg.obs_stats_update_chance,
                    collect_states=True,
                    unroll=cfg.scan_unroll,
                )
                nov = self._batch_novelty(
                    jax.tree.map(lambda x: x[None], base_params), state, archive, archive_count
                )[0]
                return res, nov

            if cfg.eval_every == 1:
                eval_res, eval_novelty = run_eval(None)
            else:
                # lax.cond skips the full-horizon eval work on non-eval epochs
                def skip_eval(_):
                    res = fd_rollout.RolloutResult(
                        reward=jnp.float32(0),
                        entropy=jnp.float32(0),
                        steps=jnp.int32(0),
                        obs_stats=welford.jnp_init(self.env.obs_shape),
                        states=jnp.zeros(
                            (self.horizon,) + tuple(self.env.obs_shape), jnp.float32
                        ),
                    )
                    return res, jnp.float32(0)

                eval_res, eval_novelty = jax.lax.cond(do_eval, run_eval, skip_eval, None)

        ema = lambda old, new: jnp.where(do_eval, old * 0.9 + new * 0.1, old)
        policy_reward = ema(state.policy_reward, eval_res.reward)
        policy_entropy = ema(state.policy_entropy, eval_res.entropy)
        policy_novelty = ema(state.policy_novelty, eval_novelty)

        # 5. zeta refresh from the eval episode's visited states
        zeta = self._update_zeta(state.zeta, eval_res, zeta_key, do_eval)

        # 6. omega steps on eval epochs with the mean noisy reward
        noisy_mean = result.reward.mean()
        stepped = omega_step(state.omega, noisy_mean, self.omega_hp)
        omega = jax.tree.map(lambda a, b: jnp.where(do_eval, a, b), stepped, state.omega)

        # 7. fitness -> combine -> DSGD
        fitness = fd_combine.fitness_from_rewards(result.reward, policy_reward, tie_key)
        if chunked:
            gradient = fd_combine.combine_gradient_chunked(
                self.noise, state.epoch, member_ids, fitness, cfg.noise_std,
                chunk=cfg.population_chunk,
            )
        elif cfg.noise_backend == "pallas":
            from dfd_tpu.ops.perturb import pallas_combine

            coefs = fitness / (cfg.noise_std * jnp.maximum(noise_ssq, 1e-30))
            gradient = pallas_combine(
                coefs, cfg.random_seed, state.epoch, self.model.num_params,
                antithetic=cfg.antithetic,
            )
        else:
            gradient = fd_combine.combine_gradient(eps, fitness, cfg.noise_std)
        if cfg.optimizer == "dsgd":
            lr_scale = lr_scale_from_omega(
                omega.omega, cfg.omega.min_value, cfg.omega.max_value,
                cfg.dsgd_min_scale, cfg.dsgd_max_scale,
            )
            new_flat = dsgd_update(state.flat, -gradient, lr_scale, self.dsgd_hp)
        else:  # plain SGD on grad = -g (net ascent), reference opt_fn alternative
            new_flat = state.flat + cfg.learning_rate * gradient
        update_size = jnp.sqrt(jnp.sum((new_flat - state.flat) ** 2))

        # VBN: refresh BatchNorm running stats at the updated parameters.
        # Recurrent models feed the buffer's real rewards through the LSTM
        # (reference policies/impala.py:12-16) — same semantics as the host
        # topologies' dict-obs buffers (runners/server.py seed buffer).
        bn_state = state.bn_state
        if self._vbn_buffer is not None:
            vbn_obs, vbn_rewards = self._vbn_buffer
            vbn_params = model.set_flat(new_flat, xp=jnp)
            if model.recurrent:
                bn_state = model.vbn(vbn_params, state.bn_state, vbn_obs, rewards=vbn_rewards)
            else:
                bn_state = model.vbn(vbn_params, state.bn_state, vbn_obs)

        # 8. merge sampled observation statistics from the population
        obs_stats = state.obs_stats
        if cfg.normalize_obs:
            pop_merged = welford.jnp_merge_population(result.obs_stats)
            obs_stats = welford.jnp_merge(obs_stats, pop_merged)
            obs_stats = welford.jnp_merge(obs_stats, eval_res.obs_stats)

        new_state = TrainState(
            flat=new_flat,
            bn_state=bn_state,
            omega=omega,
            obs_stats=obs_stats,
            zeta=zeta,
            policy_reward=policy_reward,
            policy_entropy=policy_entropy,
            policy_novelty=policy_novelty,
            epoch=state.epoch + 1,
            key=key,
        )
        metrics = {
            "Policy Reward": policy_reward,
            "Policy Entropy": policy_entropy,
            "Policy Novelty": policy_novelty,
            "Noisy Reward": noisy_mean,
            "Noisy Novelty": novelty.mean(),
            "Update Magnitude": update_size,
            "Omega": omega.omega,
            "_timesteps": result.steps.sum() + eval_res.steps,
            "_did_eval": do_eval.astype(jnp.int32),
        }
        return new_state, metrics

    # -- pieces ------------------------------------------------------------------

    def _batch_novelty(self, pop_params, state: TrainState, archive, archive_count):
        """Min behavioral distance to the archive, 0 when the archive has <2
        entries — and, like the reference's guard (strategy_handler.py:25-31),
        the strategy forwards are skipped entirely in that case (lax.cond)."""

        def compute(_):
            def one(params):
                strat = self.model.strategy(params, state.bn_state, state.zeta)
                dists = self.distance_fn(strat, archive, xp=jnp)
                idx = jnp.arange(archive.shape[0])
                dists = jnp.where(idx < archive_count, dists, jnp.inf)
                return jnp.min(dists)

            return jax.vmap(one)(pop_params)

        def skip(_):
            n = jax.tree.leaves(pop_params)[0].shape[0]
            return jnp.zeros((n,), jnp.float32)

        return jax.lax.cond(archive_count >= 2, compute, skip, None)

    def _update_zeta(self, zeta, eval_res, zeta_key, do_eval):
        """Replace a random permutation of zeta slots with the first visited
        eval states (reference run_sequential.py:142-143 semantics)."""
        Z = zeta.shape[0]
        states = eval_res.states[:Z]
        pad = Z - states.shape[0]
        if pad > 0:
            states = jnp.concatenate([states, jnp.zeros((pad,) + states.shape[1:], states.dtype)])
        perm = jax.random.permutation(zeta_key, Z)
        n_valid = jnp.minimum(eval_res.steps, Z)
        valid = (jnp.arange(Z) < n_valid).reshape((Z,) + (1,) * (zeta.ndim - 1))
        new_vals = jnp.where(valid, states, zeta[perm])
        new_zeta = zeta.at[perm].set(new_vals)
        return jax.tree.map(lambda a, b: jnp.where(do_eval, a, b), new_zeta, zeta)

    def _resolve_e_lowering(self):
        """Pick the E>1 lowering for the unchunked fused path and store it in
        ``self._e_flat``; returns the already-compiled winning step when the
        choice was autotuned (None otherwise, caller jits fresh).

        "flat" collapses (member, episode) into one (P*E)-wide population
        vmap; "nested" keeps vmap(P)∘vmap(E).  The two are bit-identical but
        their speed ranking is WORKLOAD-DEPENDENT on TPU: nested gives each
        member's forward an M=E GEMM dimension (measured 3.6x faster on the
        tiny trap MLP at E=8), while flat batches env dynamics better
        (measured 1.8x faster on the swimmer's physics).  So "auto"
        autotunes: compile both, time a few epochs from the initial state
        (results discarded — the step is pure), keep the faster.  Under
        multi-process SPMD every process must trace the same program, so
        autotune degrades to the deterministic memory gate there."""
        cfg = self.cfg
        E = cfg.envs_per_perturbation
        chunked = bool(cfg.population_chunk) and cfg.population_chunk < self.P
        zeta_empty = cfg.zeta_size <= 0
        if E == 1 or chunked or zeta_empty:
            self._e_flat = False
            return None
        mode = cfg.e_lowering
        if mode == "flat":
            self._e_flat = True
            return None
        if mode == "nested":
            self._e_flat = False
            return None
        if mode != "auto":
            raise ValueError(f"e_lowering must be flat|nested|auto, got {mode!r}")
        n_eval = 1 if self.mesh is None else int(self.mesh.shape[cfg.mesh_axes[0]])
        replicated_bytes = E * (self.P + n_eval) * self.model.num_params * 4
        if replicated_bytes > (1 << 30):
            self._e_flat = False  # flat would materialize >1 GiB of params
            return None
        if jax.process_count() > 1:
            self._e_flat = True  # deterministic across processes; no timing
            return None
        archive, count = self._archive_inputs()
        import time as _time

        best = None
        for flat_e in (False, True):
            step = self._make_step(flat_e=flat_e)
            s, _ = step(self.state, archive, count)  # compile + warm
            float(jax.device_get(jnp.sum(s.flat)))
            # 6 chained epochs, min of 2 reps: the device->host readback that
            # closes each timing costs ~1 s on tunneled setups, so the timed
            # chain must be long enough for the real difference to clear
            # that constant + its jitter (min-of-reps drops the outliers)
            dt = float("inf")
            for _ in range(2):
                t0 = _time.perf_counter()
                for _ in range(6):
                    s, _ = step(self.state, archive, count)
                float(jax.device_get(jnp.sum(s.flat)))
                dt = min(dt, _time.perf_counter() - t0)
            if best is None or dt < best[0]:
                best = (dt, flat_e, step)
        self._e_flat = best[1]
        return best[2]

    def _shard_pop(self, x):
        if self.mesh is None:
            return x
        spec = jax.sharding.PartitionSpec(self.cfg.mesh_axes[0], *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, jax.sharding.NamedSharding(self.mesh, spec))

    def _archive_inputs(self):
        """Fixed-shape archive tensor + valid count for the jitted step."""
        t = self.handler.strategy_tensor
        Z = self.state.zeta.shape[0]
        F = (
            self.model.output_shape
            if self.model.discrete
            else 2 * self.model.output_shape
        )
        full = np.zeros((self.H, Z, F), np.float32)
        count = 0
        if isinstance(t, np.ndarray) and t.ndim == 3:
            count = min(len(t), self.H)
            full[:count] = t[:count]
        return jnp.asarray(full), jnp.int32(count)

    def _seed_zeta(self) -> jnp.ndarray:
        return self._seed_buffer(self.cfg.zeta_size)

    def _seed_buffer(self, n: int, with_rewards: bool = False):
        """Observation buffer from a random-action rollout (reference
        run_sequential.py:198-213).  ``with_rewards`` also returns each
        observation's arrival reward (0 at resets) — what a recurrent
        policy's VBN pass feeds through the LSTM, mirroring the host
        topologies' dict-obs buffers (reference utils/impala_env_wrapper.py)."""
        env = self.env
        cfg = self.cfg
        key = jax.random.key(cfg.random_seed)

        def step(carry, k):
            env_state, obs, prev_reward = carry
            ak, rk = jax.random.split(k)
            if env.discrete:
                action = jax.random.randint(ak, (), 0, env.n_actions)
            else:
                action = jax.random.uniform(ak, (env.action_dim,), minval=-1.0, maxval=1.0)
            new_state, new_obs, reward, done = env.step(env_state, action)
            reset_state, reset_obs = env.reset(rk)
            pick = lambda a, b: jax.tree.map(lambda x, y: jnp.where(done, x, y), a, b)
            next_carry = (
                pick(reset_state, new_state),
                jnp.where(done, reset_obs, new_obs),
                jnp.where(done, jnp.float32(0), reward.astype(jnp.float32)),
            )
            return next_carry, (obs, prev_reward)

        k0, kr = jax.random.split(key)
        env_state0, obs0 = env.reset(kr)
        keys = jax.random.split(k0, n)
        _, (buf, rewards) = jax.lax.scan(step, (env_state0, obs0, jnp.float32(0)), keys)
        return (buf, rewards) if with_rewards else buf

    def eval_panel(self, n_panel: int = 32, panel_seed: int = 1234) -> np.ndarray:
        """Deterministic greedy episode on each of ``n_panel`` FIXED reset
        keys (hence fixed level draws on procedurally-generated envs),
        returning the per-episode rewards.

        The trainer's built-in eval metric is an EMA of ONE greedy episode on
        a RANDOM level per eval epoch, so on wide level distributions its
        variance is dominated by level luck (the reference inherits the same
        single-episode eval, run_sequential.py:137-143).  A fixed panel makes
        "the policy holds a threshold" a property of the policy rather than
        of the draw: the same K levels are replayed every call, and the
        panel mean's seed-noise shrinks ~1/sqrt(K).

        Pure read-only: does not advance the trainer's RNG, EMAs, zeta or
        epoch — safe to interleave with training at any cadence."""
        cache_key = (int(n_panel), int(panel_seed))
        fn = self._panel_cache.get(cache_key)
        if fn is None:
            model, env, cfg = self.model, self.env, self.cfg
            keys = jax.vmap(
                lambda i: jax.random.fold_in(jax.random.key(panel_seed), i)
            )(jnp.arange(n_panel))

            def run(state: TrainState) -> jnp.ndarray:
                obs_mean, obs_std = welford.jnp_mean_std(state.obs_stats)
                params = model.set_flat(state.flat, xp=jnp)

                def one(k):
                    return fd_rollout.episode_rollout(
                        model, env, params, state.bn_state, k, self.horizon,
                        deterministic=jnp.asarray(True),
                        obs_mean=obs_mean, obs_std=obs_std,
                        normalize_obs=cfg.normalize_obs,
                        obs_stats_update_chance=0.0,
                        collect_states=False,
                        unroll=cfg.scan_unroll,
                    ).reward

                return jax.vmap(one)(keys)

            fn = self._panel_cache[cache_key] = jax.jit(run)
        return np.asarray(jax.device_get(fn(self.state)))

    def train_to_timesteps(self, timestep_limit: int, sync_every: int = 10) -> None:
        """Train until ``cumulative_timesteps`` reaches the limit (the
        reference server's budget semantic, run_server.py:25)."""
        while self.cumulative_timesteps < timestep_limit:
            self.train_fast(sync_every, sync_every=sync_every)
