"""Full-loop sequential parity: dfd_tpu's SequentialRunner vs the reference's
components driven through run_sequential.py's exact loop, on simple_trap_env
with a fixed seed (BASELINE.md "Exactness" target).

The oracle loop re-wires the reference's FiniteDifferences by keyword (the
reference's own runner passes noise_std/batch_size positionally-wrong, see
dfd_tpu/runners/sequential.py module doc) and shares zeta seeding draws; with
torch RNG replayed for sampling, per-perturbation rewards must match exactly
and parameters to float32 tolerance.
"""

import numpy as np
import pytest

from dfd_tpu.core.noise import RNGNoiseSource
from dfd_tpu.envs.trap import TrapEnv
from dfd_tpu.models import DiscreteMLP
from dfd_tpu.ops import distances
from dfd_tpu.runners import HostEnv, SequentialRunner
from dfd_tpu.utils.metrics import EpochReporter
from tests._reference import load_reference, make_trap_env, reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")

SEED = 123
BATCH = 10
ZETA = 50
EPOCHS = 3


class _OracleLoop:
    """run_sequential.py's training loop over the reference components."""

    def __init__(self, seed):
        import torch

        ref = load_reference()
        torch.manual_seed(seed)
        self.ref = ref
        self.policy = ref.DiscretePolicy(2, 9, seed=seed)
        self.env = make_trap_env()
        self.rng = np.random.RandomState(seed)
        self.buffer_rng = np.random.RandomState(seed)

        self.omega = ref.AdaptiveOmega(
            default_value=0, improvement_threshold=1.035, reward_history_size=20,
            min_value=0, max_value=1, steps_to_min=25, steps_to_max=75,
        )
        import torch as _t

        opt = ref.DSGD(self.policy.parameters(), lr=0.01)
        # working PCG64 source (the reference's own class crashes on numpy 2)
        noise = RNGNoiseSource(self.policy.num_params, random_seed=seed)
        self.strategy_handler = ref.StrategyHandler(
            self.policy, ref.math_helpers.categorical_tvd, max_history_size=ZETA
        )
        self.agent = ref.Agent(self.policy, self.env, seed, normalize_obs=False)
        self.worker = ref.Worker(
            self.policy, self.agent, noise, self.strategy_handler,
            sigma=0.02, random_seed=seed, eval_prob=0.05,
        )
        self.learner = ref.FiniteDifferences(
            self.policy, opt, self.omega, noise,
            noise_std=0.02, batch_size=BATCH, ent_coef=0.0, max_delayed_return=10,
        )
        self.policy_reward = 0.0
        self.policy_entropy = 0.0
        self.policy_novelty = 0.0
        self.zeta = self._seed_zeta()
        self.reward_log = []

    def _seed_zeta(self):
        zeta = []
        obs = self.env.reset()
        for _ in range(ZETA):
            zeta.append(obs)
            obs, _, done, _ = self.env.step(int(self.buffer_rng.randint(9)))
            if done:
                obs = self.env.reset()
        return np.asarray(zeta)

    def train(self, n_epochs):
        zeta = self.zeta
        idxs = list(range(len(zeta)))
        self.strategy_handler.add_policy(self.policy)
        # (reference worker.update deserializes FDState; epoch tracking only here)
        # NB: like the reference runner, the env stays mid-episode after zeta
        # seeding and the agent's last_obs is stale from construction — the
        # first episode inherits both quirks (run_sequential.py:95,102).
        self.worker.epoch = 0
        for _ in range(n_epochs):
            rets, ret_rewards = [], []
            any_eval = False
            while len(rets) < BATCH:
                for ret in self.worker.collect_returns():
                    if ret.is_eval:
                        any_eval = True
                        self.policy_reward = self.policy_reward * 0.9 + ret.reward * 0.1
                        self.policy_entropy = self.policy_entropy * 0.9 + ret.entropy * 0.1
                        self.policy_novelty = self.policy_novelty * 0.9 + ret.novelty * 0.1
                        self.rng.shuffle(idxs)
                        zeta[idxs[: len(ret.eval_states)]] = np.asarray(ret.eval_states)[:ZETA]
                    else:
                        rets.append(ret)
                        ret_rewards.append(ret.reward)
            if any_eval:
                self.strategy_handler.set_zeta(zeta)
                self.omega.step(np.mean(ret_rewards))
            self.learner.step(rets, self.policy_reward, self.policy_novelty, self.policy_entropy)
            self.strategy_handler.add_policy(self.policy)
            self.worker.epoch = self.learner.epoch
            self.reward_log.append(list(ret_rewards))


def _build_runner(seed):
    import torch

    from dfd_tpu.parity import TorchSampler, reference_init_flat

    model = DiscreteMLP(2, 9)
    torch.manual_seed(seed)
    initial_flat = reference_init_flat(model, seed)
    sampler = TorchSampler()  # stream continues after the construction replay
    env = HostEnv(TrapEnv(), seed=seed)
    rewards = []
    runner = SequentialRunner(
        model,
        env,
        distances.categorical_tvd,
        learning_rate=0.01,
        noise_std=0.02,
        batch_size=BATCH,
        random_seed=seed,
        max_delayed_return=10,
        zeta_size=ZETA,
        max_strategy_history_size=ZETA,
        eval_prob=0.05,
        sampler=sampler,
        initial_flat=initial_flat,
        reporter=EpochReporter(quiet=True),
    )
    return runner


def test_sequential_runner_matches_reference_loop():
    oracle = _OracleLoop(SEED)
    runner = _build_runner(SEED)

    # identical starting conditions
    np.testing.assert_array_equal(
        runner.policy.get_trainable_flat(), oracle.policy.get_trainable_flat()
    )
    np.testing.assert_allclose(runner.zeta, oracle.zeta, atol=1e-7)

    oracle.train(EPOCHS)
    runner.train(EPOCHS)

    # per-perturbation noisy rewards must match EXACTLY (trajectory-level parity)
    our_rewards = [r["Noisy Reward"] for r in runner.reporter.history]
    their_rewards = [float(np.mean(rl)) for rl in oracle.reward_log]
    assert len(our_rewards) == len(their_rewards) == EPOCHS
    for i, (a, b) in enumerate(zip(our_rewards, their_rewards)):
        assert a == b, f"epoch {i}: {a} vs {b}"

    # parameters track to float32 optimizer tolerance
    np.testing.assert_allclose(
        runner.policy.get_trainable_flat(),
        oracle.policy.get_trainable_flat(),
        rtol=1e-4,
        atol=1e-5,
    )
    assert runner.learner.epoch == oracle.learner.epoch
    assert runner.agent.cumulative_timesteps == oracle.agent.cumulative_timesteps


def test_sequential_runner_learns_on_trap_env():
    """With the native sampler, the runner improves trap-env reward."""
    model = DiscreteMLP(2, 9)
    env = HostEnv(TrapEnv(), seed=0)
    runner = SequentialRunner(
        model,
        env,
        distances.categorical_tvd,
        learning_rate=0.05,
        noise_std=0.05,
        batch_size=8,
        random_seed=7,
        zeta_size=20,
        max_strategy_history_size=20,
        eval_prob=0.1,
        reporter=EpochReporter(quiet=True),
    )
    runner.train(12)
    hist = runner.reporter.history
    first = np.mean([h["Noisy Reward"] for h in hist[:3]])
    last = np.mean([h["Noisy Reward"] for h in hist[-3:]])
    assert last > first, (first, last)


def test_sequential_parity_with_obs_normalization():
    """The normalize_obs path adds per-step RNG draws (stats sampling) and
    fixed mean/std normalization — the distributed default.  Verifies the
    draw sequences and normalization arithmetic stay aligned with the
    reference over one epoch."""
    import torch

    from dfd_tpu.parity import TorchSampler, reference_init_flat

    ref = load_reference()
    seed = 123

    # oracle components with normalize_obs=True
    torch.manual_seed(seed)
    their_policy = ref.DiscretePolicy(2, 9, seed=seed)
    their_env = make_trap_env()
    their_agent = ref.Agent(their_policy, their_env, seed, normalize_obs=True,
                            obs_stats_update_chance=0.2)
    their_noise = RNGNoiseSource(their_policy.num_params, random_seed=seed)
    their_handler = ref.StrategyHandler(their_policy, ref.math_helpers.categorical_tvd, 10)
    their_worker = ref.Worker(their_policy, their_agent, their_noise, their_handler,
                              sigma=0.02, random_seed=seed, eval_prob=0.05)
    # give the worker non-trivial fixed stats, as the server broadcast would
    stats_src = np.random.RandomState(0).randn(50, 2)
    for x in stats_src:
        their_worker.fixed_obs_stats.update(x)

    # ours
    model = DiscreteMLP(2, 9)
    torch.manual_seed(seed)
    flat = reference_init_flat(model, seed)
    sampler = TorchSampler()
    from dfd_tpu.runners import Agent as OurAgent, Worker as OurWorker
    from dfd_tpu.runners.policy import HostPolicy
    from dfd_tpu.novelty import StrategyHandler as OurHandler

    policy = HostPolicy(model, flat=flat, sampler=sampler)
    env = HostEnv(TrapEnv(), seed=seed)
    agent = OurAgent(policy, env, seed, normalize_obs=True, obs_stats_update_chance=0.2)
    handler = OurHandler(model, policy.bn_state, distances.categorical_tvd, 10)
    worker = OurWorker(policy, agent, RNGNoiseSource(model.num_params, random_seed=seed),
                       handler, sigma=0.02, random_seed=seed, eval_prob=0.05)
    for x in stats_src:
        worker.fixed_obs_stats.update(x)

    their_worker.epoch = 0
    worker.epoch = 0
    for i in range(8):
        their_ret = their_worker.collect_returns()[0]
        our_ret = worker.collect_returns()[0]
        assert their_ret.is_eval == our_ret.is_eval
        assert their_ret.reward == our_ret.reward, i
        # local Welford deltas must merge identically
        np.testing.assert_allclose(
            np.asarray(our_ret.obs_stats_update, np.float64),
            np.asarray(their_ret.obs_stats_update, np.float64),
            atol=1e-6,
        )
