"""Policy model interface.

A policy is a *static* description object whose methods are pure functions of
``(params, state, inputs)`` — ``params`` being the trainable pytree that the
FD learner perturbs/updates and ``state`` the non-trainable pytree (BatchNorm
running statistics).  This split makes explicit what the reference keeps as
two ad-hoc flat views (trainable ``parameters_to_vector`` vs full
``state_dict`` serialization, reference policies/policy.py:36-61), and it is
what lets the vectorized trainer vmap a whole population of perturbed
``params`` against one shared ``state``.
"""

from __future__ import annotations

import abc
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from dfd_tpu.core.flat import FlatSpec, flatten, unflatten

Params = Dict[str, Any]
State = Dict[str, Any]


class PolicyModel(abc.ABC):
    """Static policy description with pure apply functions."""

    #: FlatSpec over trainable parameters, in torch parameters_to_vector order
    param_spec: FlatSpec
    #: FlatSpec over the full state (params + buffers), in state_dict order
    state_spec: FlatSpec
    #: shape of one observation (for obs-normalization statistics)
    input_shape: Any
    #: number of actions (discrete) or action dimensions (continuous)
    output_shape: int
    #: True for categorical action spaces
    discrete: bool = True
    #: True when the policy carries per-episode recurrent state (e.g. LSTM)
    recurrent: bool = False

    @property
    def num_params(self) -> int:
        return self.param_spec.size

    # -- construction ------------------------------------------------------------

    @abc.abstractmethod
    def init(self, seed: int) -> Tuple[Params, State]:
        """Initial (params, state); numpy host arrays with init-draw parity."""

    # -- pure forward family -----------------------------------------------------

    @abc.abstractmethod
    def apply(self, params: Params, state: State, x: jnp.ndarray):
        """Distribution parameters for a batch of observations."""

    def act(self, params: Params, state: State, obs: jnp.ndarray, key, deterministic):
        """One action for one observation (fresh-episode carry for recurrent
        models; key may be unused when deterministic)."""
        action, _, _ = self.act_step(
            params, state, obs, jnp.float32(0), jnp.asarray(False),
            self.initial_carry(), key, deterministic,
        )
        return action

    @abc.abstractmethod
    def entropy(self, params: Params, state: State, xs: jnp.ndarray) -> jnp.ndarray:
        """Mean policy entropy over a batch of observations (scalar)."""

    @abc.abstractmethod
    def strategy(self, params: Params, state: State, zeta: jnp.ndarray) -> jnp.ndarray:
        """Behavior signature over the state set zeta: [Z, F]."""

    def vbn(self, params: Params, state: State, buffer: jnp.ndarray) -> State:
        """Refresh BatchNorm running statistics with one train-mode pass
        (virtual batch normalization); identity for BN-free models."""
        return state

    # -- per-step acting (the rollout engine's entry point) ----------------------

    def initial_carry(self):
        """Per-episode recurrent carry; () for feed-forward models."""
        return ()

    def act_step(self, params, state, obs, prev_reward, prev_done, carry, key, deterministic):
        """One acting step: (action, step_entropy, new_carry).

        The default implementation serves feed-forward models and ignores the
        recurrent inputs; recurrent models (IMPALA) override it.
        """
        import jax

        from dfd_tpu.models import layers

        if self.discrete:
            probs = self.apply(params, state, obs)[0]
            action = jnp.where(
                deterministic,
                jnp.argmax(probs),
                jax.random.categorical(key, jnp.log(jnp.maximum(probs, 1e-38))),
            ).astype(jnp.int32)
            return action, layers.categorical_entropy(probs), carry
        mean, std = self.apply(params, state, obs)
        mean, std = mean[0], std[0]
        action = jnp.where(deterministic, mean, mean + std * jax.random.normal(key, mean.shape))
        return action, layers.gaussian_entropy(std).sum(), carry

    # -- flat views --------------------------------------------------------------

    def get_flat(self, params: Params, xp=np) -> np.ndarray:
        return flatten(params, self.param_spec, xp=xp)

    def set_flat(self, vec, xp=np) -> Params:
        return unflatten(vec, self.param_spec, xp=xp)

    def serialize(self, params: Params, state: State, xp=np):
        """Full-state flat vector (the wire format for FDState broadcasts)."""
        merged = self._merge_full(params, state)
        return flatten(merged, self.state_spec, xp=xp)

    def deserialize(self, vec, xp=np) -> Tuple[Params, State]:
        merged = unflatten(vec, self.state_spec, xp=xp)
        return self._split_full(merged)

    # -- helpers models override when they carry non-trainable state -------------

    def _merge_full(self, params: Params, state: State) -> Dict[str, Any]:
        return params

    def _split_full(self, merged: Dict[str, Any]) -> Tuple[Params, State]:
        return merged, {}

    # -- reference-construction metadata (for the opt-in torch parity init) ------

    def reference_linear_dims(self):
        """(d_in, d_out) of each torch Linear in construction order."""
        raise NotImplementedError

    def linear_names(self):
        """Param-tree keys of the Linear layers, in construction order."""
        raise NotImplementedError

    def weighted_layer_names(self):
        """Param-tree keys of every weighted layer (incl. BatchNorm), in the
        reference's normc iteration order."""
        raise NotImplementedError
