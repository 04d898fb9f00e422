"""IMPALA through the host topology: dict observations, recurrent carry in
HostPolicy, episode collection via Agent/Worker."""

import numpy as np
import pytest

from dfd_tpu.envs.wrappers import ImpalaObsWrapper
from dfd_tpu.models.impala import ImpalaPolicy
from dfd_tpu.runners.agent import Agent
from dfd_tpu.runners.policy import HostPolicy

FRAME = (3, 32, 32)
A = 5


class _FakePixelEnv:
    """Tiny deterministic pixel env with an old-gym surface (HWC frames)."""

    n_actions = A

    def __init__(self, episode_len=6):
        self.episode_len = episode_len
        self.t = 0

    def reset(self):
        self.t = 0
        return self._frame()

    def step(self, action):
        self.t += 1
        done = self.t >= self.episode_len
        reward = 1.0 if action == 0 else -0.5
        return self._frame(), reward, done, {}

    def _frame(self):
        return np.full((FRAME[1], FRAME[2], FRAME[0]), self.t * 20.0, np.float32)


def _small_impala():
    return ImpalaPolicy(FRAME, A)


def test_wrapper_formats_dict_obs():
    env = ImpalaObsWrapper(_FakePixelEnv())
    obs = env.reset()
    assert obs["frame"].shape == FRAME  # HWC converted to CHW
    assert obs["reward"] == 0.0 and obs["done"] is False
    obs2, rew, done, _ = env.step(0)
    assert obs2["reward"] == rew == 1.0


def test_host_policy_recurrent_stepping():
    model = _small_impala()
    policy = HostPolicy(model, seed=0)
    env = ImpalaObsWrapper(_FakePixelEnv())
    obs = env.reset()
    policy.reset()
    a1 = policy.get_action(obs, deterministic=True)
    assert 0 <= a1 < A
    # the carry advances: same obs later may act differently; at minimum the
    # carry object changed from the initial zeros
    h, c = policy._carry
    assert float(np.abs(np.asarray(h)).sum()) > 0


def test_agent_collects_impala_episode():
    model = _small_impala()
    policy = HostPolicy(model, seed=1)
    env = ImpalaObsWrapper(_FakePixelEnv())
    agent = Agent(policy, env, random_seed=3, normalize_obs=False)
    reward, entropy, steps = agent.collect_return(eval_run=True, save_states=True)
    assert steps == 6
    assert np.isfinite(reward) and np.isfinite(entropy)
    assert len(agent.saved_states) == 6
    assert isinstance(agent.saved_states[0], dict)


def test_host_policy_strategy_on_dict_zeta():
    model = _small_impala()
    policy = HostPolicy(model, seed=2)
    zeta = [
        {"frame": np.zeros(FRAME, np.float32), "reward": 0.0, "done": False}
        for _ in range(3)
    ]
    strat = policy.get_strategy(zeta)
    assert strat.shape == (3, A)
    np.testing.assert_allclose(strat.sum(-1), 1.0, atol=1e-5)


def test_sequential_vbn_buffer_keeps_real_rewards():
    """The host runners' VBN refresh must feed the buffer's real rewards
    through the LSTM, like the reference's stacked dict-obs VBN (reference
    policies/impala.py:12-16) — not zeros."""
    from dfd_tpu.ops import distances
    from dfd_tpu.runners.sequential import SequentialRunner

    model = _small_impala()
    env = ImpalaObsWrapper(_FakePixelEnv(episode_len=3))
    runner = SequentialRunner(
        model, env, distances.categorical_tvd,
        batch_size=2, zeta_size=4, max_strategy_history_size=4,
        vbn_buffer_size=6, random_seed=0,
    )
    buf = runner.vbn_buffer
    assert isinstance(buf, list) and isinstance(buf[0], dict)
    rewards = np.asarray([float(o["reward"]) for o in buf], np.float32)
    assert np.abs(rewards).sum() > 0  # the fake env pays +-1/-0.5 per step

    # compute_vbn == model.vbn with the buffer's frames AND rewards ...
    policy = runner.policy
    frames = np.stack([np.asarray(o["frame"], np.float32) for o in buf])
    params = model.set_flat(policy.flat)
    runner_state = dict(policy.bn_state)
    policy.compute_vbn(buf)
    expect = model.vbn(params, runner_state, frames, rewards=rewards)
    for k in expect:
        np.testing.assert_allclose(
            np.asarray(policy.bn_state[k]["mean"]), np.asarray(expect[k]["mean"]),
            rtol=1e-3, atol=5e-5,  # jit (device) vs eager fusion rounding
        )

    # ... and the rewards are live: zero rewards give a different policy_bn
    zero = model.vbn(params, runner_state, frames, rewards=np.zeros_like(rewards))
    assert not np.allclose(
        np.asarray(expect["policy_bn"]["mean"]), np.asarray(zero["policy_bn"]["mean"])
    )
    # draining semantics: stage totals never roll across epochs
    assert runner.timer.totals == {}


def test_host_policy_strategy_dict_zeta_uses_rewards():
    """Dict zeta entries carry rewards the reference's strategy forward
    consumes (reference policies/impala.py:21-27)."""
    model = _small_impala()
    policy = HostPolicy(model, seed=4)
    frames = [np.full(FRAME, 30.0, np.float32) for _ in range(3)]
    z0 = [{"frame": f, "reward": 0.0, "done": False} for f in frames]
    z1 = [{"frame": f, "reward": 1.0, "done": False} for f in frames]
    s0 = policy.get_strategy(z0)
    s1 = policy.get_strategy(z1)
    assert s0.shape == s1.shape == (3, A)
    assert not np.allclose(s0, s1)
