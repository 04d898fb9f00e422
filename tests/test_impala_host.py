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
