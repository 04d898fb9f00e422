"""Adaptive omega schedule (reference utils/adaptive_omega.py:5-53).

Omega tracks reward stagnation: each step compares the policy's reward to a
threshold-scaled mean of recent rewards (sign-aware: negative means divide by
the threshold, positive means multiply).  Improvement walks omega down by
1/steps_to_min, stagnation walks it up by 1/steps_to_max, clamped to
[min, max].  Both values are rounded to 5 decimals before comparison.

Live effect in the reference is the DSGD lr scale only (the novelty/entropy
objective mixing is commented out, finite_differences.py:46-48); both hooks
are kept here.

A host class for the sequential/parity path and a jit-able functional form
with a fixed-size reward ring buffer for the on-device loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class AdaptiveOmega:
    def __init__(
        self,
        default_value: float = 0,
        improvement_threshold: float = 1.025,
        reward_history_size: int = 10,
        min_value: float = 0,
        max_value: float = 1,
        steps_to_min: int = 15,
        steps_to_max: int = 200,
    ):
        self.omega = default_value
        self.improvement_threshold = improvement_threshold
        self.reward_history_size = reward_history_size
        self.min_omega = min_value
        self.max_omega = max_value
        self.reward_history: list = []
        self.increase = 1 / steps_to_max
        self.decrease = 1 / steps_to_min

    def step(self, theta_reward) -> None:
        if theta_reward is None:
            return
        self._adapt(theta_reward)
        # matches the reference's order: history is advanced *before* the
        # comparison (adaptive_omega.py:26-31 calls advance then adapt)

    def _adapt(self, theta_reward) -> None:
        self.reward_history.append(theta_reward)
        if len(self.reward_history) > self.reward_history_size:
            self.reward_history.pop(0)

        mean_reward = round(float(np.mean(self.reward_history)), 5)
        theta_reward = round(theta_reward, 5)
        if mean_reward < 0:
            mean_reward /= self.improvement_threshold
        else:
            mean_reward *= self.improvement_threshold

        if theta_reward > mean_reward:
            self.omega = max(self.omega - self.decrease, self.min_omega)
        else:
            self.omega = min(self.omega + self.increase, self.max_omega)


class OmegaState(NamedTuple):
    omega: jnp.ndarray           # scalar f32
    history: jnp.ndarray         # [H] reward ring buffer
    filled: jnp.ndarray          # scalar i32, number of valid entries
    cursor: jnp.ndarray          # scalar i32, next write slot


class OmegaParams(NamedTuple):
    improvement_threshold: float
    min_omega: float
    max_omega: float
    increase: float              # 1/steps_to_max
    decrease: float              # 1/steps_to_min


def omega_init(default_value: float, history_size: int) -> OmegaState:
    return OmegaState(
        omega=jnp.asarray(default_value, jnp.float32),
        history=jnp.zeros((history_size,), jnp.float32),
        filled=jnp.asarray(0, jnp.int32),
        cursor=jnp.asarray(0, jnp.int32),
    )


def omega_step(state: OmegaState, reward, hp: OmegaParams) -> OmegaState:
    """Jittable omega step (reward must be a valid scalar; gate the call with
    lax.cond when the epoch produced no eval)."""
    h = state.history.shape[0]
    history = state.history.at[state.cursor].set(reward)
    filled = jnp.minimum(state.filled + 1, h)
    cursor = (state.cursor + 1) % h

    idx = jnp.arange(h)
    valid = idx < filled
    mean = jnp.sum(jnp.where(valid, history, 0.0)) / jnp.maximum(filled, 1)
    mean = jnp.round(mean * 1e5) / 1e5
    r = jnp.round(reward * 1e5) / 1e5
    mean = jnp.where(mean < 0, mean / hp.improvement_threshold, mean * hp.improvement_threshold)
    improved = r > mean
    omega = jnp.where(
        improved,
        jnp.maximum(state.omega - hp.decrease, hp.min_omega),
        jnp.minimum(state.omega + hp.increase, hp.max_omega),
    )
    return OmegaState(omega=omega, history=history, filled=filled, cursor=cursor)
