"""Host-side policy wrapper for the sequential / elastic-client topologies.

Binds a functional PolicyModel to a concrete flat parameter vector and
BatchNorm state, exposing the reference Policy surface (get_action /
get_entropy / get_strategy / flat get-set / serialize, reference
policies/policy.py:17-69) with a pluggable action sampler:

- :class:`NumpySampler` — the native host sampler (numpy RandomState);
- ``dfd_tpu.parity.TorchSampler`` — replays the reference's torch RNG stream
  for bit-level trajectory parity.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dfd_tpu.models.base import PolicyModel


class NumpySampler:
    """Inverse-CDF categorical / Box-Muller-free normal sampling via numpy."""

    def __init__(self, seed: int = 0):
        self.rng = np.random.RandomState(seed)

    def sample_categorical(self, probs: np.ndarray) -> int:
        p = np.asarray(probs, np.float64)
        p = p / p.sum()
        return int(np.searchsorted(np.cumsum(p), self.rng.uniform(), side="right"))

    def sample_normal(self, mean: np.ndarray, std: np.ndarray):
        return (np.asarray(mean) + np.asarray(std) * self.rng.standard_normal(np.shape(mean))).flatten().tolist()


class HostPolicy:
    def __init__(
        self,
        model: PolicyModel,
        flat: Optional[np.ndarray] = None,
        bn_state=None,
        seed: int = 124,
        sampler=None,
    ):
        self.model = model
        if flat is None or bn_state is None:
            params, state = model.init(seed)
            flat = model.get_flat(params) if flat is None else flat
            bn_state = state if bn_state is None else bn_state
        self.flat = np.asarray(flat, np.float32).copy()
        self.bn_state = bn_state
        self.sampler = sampler if sampler is not None else NumpySampler(seed)
        self._apply = jax.jit(
            lambda f, s, x: model.apply(model.set_flat(f, xp=jnp), s, x)
        )
        self._vbn = jax.jit(lambda f, s, x: model.vbn(model.set_flat(f, xp=jnp), s, x))
        self._carry = model.initial_carry()
        if model.recurrent:
            self._vbn_rew = jax.jit(
                lambda f, s, x, r: model.vbn(model.set_flat(f, xp=jnp), s, x, rewards=r)
            )
            self._step_probs = jax.jit(
                lambda f, s, frame, rew, carry: model.step_probs(
                    model.set_flat(f, xp=jnp), s, frame, rew, carry
                )
            )

    # -- reference-compatible surface --------------------------------------------

    @property
    def num_params(self) -> int:
        return self.model.num_params

    @property
    def input_shape(self):
        return self.model.input_shape

    def get_trainable_flat(self) -> np.ndarray:
        return self.flat.copy()

    def set_trainable_flat(self, flat) -> None:
        self.flat = np.asarray(flat, np.float32).copy()

    def forward(self, x):
        return self._apply(self.flat, self.bn_state, jnp.asarray(x))

    def get_action(self, obs, deterministic: bool = False):
        if self.model.recurrent:
            frame, reward, _done = self._unpack_obs(obs)
            probs_j, self._carry = self._step_probs(
                self.flat, self.bn_state, jnp.asarray(frame, jnp.float32),
                jnp.float32(reward), self._carry,
            )
            probs = np.asarray(probs_j)
            if deterministic:
                return int(np.argmax(probs))
            return self.sampler.sample_categorical(probs)
        out = self.forward(obs)
        if self.model.discrete:
            probs = np.asarray(out)[0]
            if deterministic:
                return int(np.argmax(probs))
            return self.sampler.sample_categorical(probs)
        mean, std = (np.asarray(o)[0] for o in out)
        if deterministic:
            return mean.flatten().tolist()
        return self.sampler.sample_normal(mean, std)

    def get_entropy(self, states) -> float:
        params = self.model.set_flat(self.flat, xp=jnp)
        if self.model.recurrent:
            frames, rewards = self._stack_dict_states(states)
            probs = self.model.apply_seq(params, self.bn_state, frames, rewards)
            from dfd_tpu.models.layers import categorical_entropy

            return float(categorical_entropy(probs).mean())
        return float(self.model.entropy(params, self.bn_state, jnp.asarray(states)))

    def get_strategy(self, zeta) -> np.ndarray:
        params = self.model.set_flat(self.flat, xp=jnp)
        if self.model.recurrent and len(zeta) > 0 and isinstance(zeta[0], dict):
            # dict zeta entries carry rewards the reference's stacked
            # strategy forward feeds through the LSTM (reference
            # policies/impala.py:21-27)
            frames, rewards = self._stack_dict_states(zeta)
            probs = self.model.apply_seq(params, self.bn_state, frames, rewards)
            return np.asarray(probs).reshape(len(frames), -1)
        return np.asarray(self.model.strategy(params, self.bn_state, jnp.asarray(zeta)))

    @staticmethod
    def _unpack_obs(obs):
        if isinstance(obs, dict):
            return obs["frame"], float(obs["reward"]), bool(obs["done"])
        return obs, 0.0, False

    @staticmethod
    def _stack_dict_states(states):
        if len(states) > 0 and isinstance(states[0], dict):
            frames = np.stack([np.asarray(s["frame"], np.float32) for s in states])
            rewards = np.asarray([float(s["reward"]) for s in states], np.float32)
        else:
            frames = np.asarray(states, np.float32)
            rewards = np.zeros(len(frames), np.float32)
        return jnp.asarray(frames), jnp.asarray(rewards)

    def compute_vbn(self, buffer) -> None:
        entries = list(buffer)
        if entries and isinstance(entries[0], dict):
            # dict-obs buffers (recurrent wrappers): the refresh feeds the
            # buffer's real rewards through the LSTM, like the reference's
            # stacked dict-obs VBN (reference policies/impala.py:12-16)
            frames, rewards = self._stack_dict_states(entries)
            if self.model.recurrent:
                new_state = self._vbn_rew(self.flat, self.bn_state, frames, rewards)
            else:
                new_state = self._vbn(self.flat, self.bn_state, frames)
            self.bn_state = jax.device_get(new_state)
            return
        self.bn_state = jax.device_get(self._vbn(self.flat, self.bn_state, jnp.asarray(buffer)))

    def serialize(self):
        params = self.model.set_flat(self.flat, xp=np)
        return np.asarray(self.model.serialize(params, self.bn_state, xp=np)).tolist()

    def deserialize(self, serialized) -> None:
        params, state = self.model.deserialize(np.asarray(serialized, np.float32), xp=np)
        self.flat = self.model.get_flat(params, xp=np)
        if state:
            self.bn_state = state

    def reset(self) -> None:
        """Reset per-episode recurrent state (no-op for feed-forward models)."""
        self._carry = self.model.initial_carry()
