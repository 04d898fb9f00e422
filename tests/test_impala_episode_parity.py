"""IMPALA episode-level parity vs the reference ImpalaCNN.

Round-1 parity pinned init and T=1 forwards (tests/test_impala.py); this
harness drives FULL episodes through both implementations on a deterministic
pixel fixture and asserts the per-step action/reward sequences are equal —
covering the stateful LSTM carry across steps, the prev-reward concat
timing (reference policies/impala.py:158-159 via the wrapper's dict obs),
carry behavior across consecutive episodes (reference worker/agent.py:34
``policy.reset()``), and the done-flag carry zeroing inside the forward
(reference policies/impala.py:161-175).
"""

import numpy as np
import pytest

from dfd_tpu.models.impala import ImpalaPolicy
from tests._reference import load_reference, reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")

FRAME = (3, 64, 64)
A = 15


class ScriptedPixelEnv:
    """Deterministic host pixel env: the frame is a pure function of
    (t, last action), rewards are scripted, episodes end on a step budget or
    a data-dependent early exit — so any drift in the policy's recurrent
    state changes the action sequence and the trajectory diverges loudly."""

    def __init__(self, horizon=6):
        self.horizon = horizon
        self.t = 0
        self.last_action = 0

    def _frame(self):
        rng = np.random.RandomState(1000 + 31 * self.t + self.last_action)
        return (rng.rand(*FRAME) * 255).astype(np.float32)

    def reset(self):
        self.t = 0
        self.last_action = 0
        return self._frame()

    def step(self, action):
        action = int(action)
        self.t += 1
        self.last_action = action
        reward = float((action + self.t) % 3 - 1)
        done = self.t >= self.horizon or (action % 5 == 2 and self.t >= 3)
        return self._frame(), reward, done, {}


def _obs_dict(frame, reward, done):
    import torch

    return {
        "frame": torch.as_tensor(np.ascontiguousarray(frame)).view(1, 1, *FRAME),
        "reward": torch.as_tensor(float(reward), dtype=torch.float32).view(1, 1),
        "done": torch.as_tensor(bool(done)).view(1, 1),
    }


def _paired_policies(seed):
    import torch

    ref = load_reference()
    torch.manual_seed(seed)
    theirs = ref.ImpalaPolicy((64, 64, 3), A, seed=seed)
    ours = ImpalaPolicy(FRAME, A)
    params = ours.set_flat(theirs.get_trainable_flat())
    _, state = ours.init(seed)
    return theirs, ours, params, state


def _run_reference_episode(theirs, env):
    """The reference Agent loop (worker/agent.py:34-52) in eval mode:
    policy.reset() at episode start, dict obs carrying the previous
    transition's reward/done, argmax actions."""
    import torch

    theirs.reset()
    frame, reward, done = env.reset(), 0.0, False
    actions, rewards, probs_log = [], [], []
    with torch.no_grad():
        for _ in range(env.horizon + 1):
            probs = theirs.forward(_obs_dict(frame, reward, done)).numpy().reshape(A)
            action = int(np.argmax(probs))
            frame, reward, done, _ = env.step(action)
            actions.append(action)
            rewards.append(reward)
            probs_log.append(probs)
            if done:
                break
    return actions, rewards, probs_log


def _run_our_episode(ours, params, state, env):
    carry = ours.initial_carry()
    frame, reward = env.reset(), 0.0
    actions, rewards, probs_log = [], [], []
    for _ in range(env.horizon + 1):
        probs, carry = ours.step_probs(params, state, frame, reward, carry)
        probs = np.asarray(probs)
        action = int(np.argmax(probs))
        frame, reward, done, _ = env.step(action)
        actions.append(action)
        rewards.append(reward)
        probs_log.append(probs)
        if done:
            break
    return actions, rewards, probs_log


def test_full_episode_action_reward_parity():
    theirs, ours, params, state = _paired_policies(21)
    for episode in range(3):  # fresh env per episode, policy state reset
        env_a, env_b = ScriptedPixelEnv(), ScriptedPixelEnv()
        ref_acts, ref_rews, ref_probs = _run_reference_episode(theirs, env_a)
        our_acts, our_rews, our_probs = _run_our_episode(ours, params, state, env_b)
        assert our_acts == ref_acts, (episode, our_acts, ref_acts)
        assert our_rews == ref_rews
        for t, (rp, op) in enumerate(zip(ref_probs, our_probs)):
            np.testing.assert_allclose(op, rp, atol=5e-5, err_msg=f"ep{episode} t{t}")


def test_episode_parity_multiple_seeds():
    for seed in (3, 99):
        theirs, ours, params, state = _paired_policies(seed)
        ref_acts, ref_rews, _ = _run_reference_episode(theirs, ScriptedPixelEnv(horizon=8))
        our_acts, our_rews, _ = _run_our_episode(ours, params, state, ScriptedPixelEnv(horizon=8))
        assert our_acts == ref_acts, seed
        assert our_rews == ref_rews, seed


def test_done_flag_zeroes_carry_like_reference():
    """The reference forward zeroes the LSTM carry when an input arrives
    with done=True (policies/impala.py:161-175).  Our rollout engine never
    feeds done inputs — it starts each episode with a fresh zero carry —
    so the two conventions must agree: ref(done=True input) ==
    ours(carry reset to initial)."""
    import torch

    theirs, ours, params, state = _paired_policies(5)
    env = ScriptedPixelEnv()
    f0, f1 = env.reset(), env.step(1)[0]

    theirs.reset()
    carry = ours.initial_carry()
    with torch.no_grad():
        # warm both carries with one step
        theirs.forward(_obs_dict(f0, 0.0, False))
        _, carry = ours.step_probs(params, state, f0, 0.0, carry)
        # reference: feed f1 flagged done -> carry zeroed before the LSTM
        ref_probs = theirs.forward(_obs_dict(f1, 0.7, True)).numpy().reshape(A)
        # ours: explicit fresh-episode carry
        our_probs, _ = ours.step_probs(params, state, f1, 0.7, ours.initial_carry())
    np.testing.assert_allclose(np.asarray(our_probs), ref_probs, atol=5e-5)


def test_stacked_obs_strategy_parity():
    """get_strategy stacks a list of dict observations (reference
    policies/impala.py:23-26, 35-45) into a (B, T=1) batch — but the
    reference LSTM is ``batch_first`` while the unroll indexes dim 0 as
    time (policies/impala.py:161-175), so the stacked frames are actually
    processed as ONE SEQUENCE with the carry chaining frame-to-frame.
    Our strategy surface (apply_seq over the frames with zero rewards)
    reproduces exactly that — pinned here against the reference oracle."""
    import torch

    theirs, ours, params, state = _paired_policies(13)
    env = ScriptedPixelEnv()
    frames = [env.reset()]
    for a in (1, 4, 2):
        frames.append(env.step(a)[0])

    theirs.reset()
    with torch.no_grad():
        obs_list = [_obs_dict(f, 0.0, False) for f in frames]
        ref_strat = theirs.get_strategy(obs_list)

    our_strat = np.asarray(ours.strategy(params, state, np.stack(frames)))
    np.testing.assert_allclose(our_strat, np.asarray(ref_strat), atol=5e-5)
