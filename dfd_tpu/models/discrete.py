"""Discrete-action MLP policy (reference policies/discrete.py:8-48).

Architecture: BatchNorm -> Linear(64) -> ReLU, twice, then BatchNorm ->
Linear(n_actions) -> Softmax, evaluated in inference mode (BatchNorm uses
running statistics).  The strategy signature is the action-probability matrix
over zeta.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dfd_tpu.core.flat import FlatSpec
from dfd_tpu.models import layers
from dfd_tpu.models.base import Params, PolicyModel, State
from dfd_tpu.models.init import normc_layers


class DiscreteMLP(PolicyModel):
    discrete = True

    def __init__(self, n_inputs: int, n_actions: int, hidden: Tuple[int, ...] = (64, 64)):
        self.input_shape = int(n_inputs)
        self.output_shape = int(n_actions)
        self.hidden = tuple(hidden)

        dims = (self.input_shape,) + self.hidden
        f32 = np.float32
        param_entries = []
        state_entries = []
        # blocks of BatchNorm(d_in) + Linear(d_in -> d_out), then the head
        self._blocks = []
        for k, (d_in, d_out) in enumerate(zip(dims, self.hidden + (self.output_shape,))):
            bn, ln = f"bn{k + 1}", f"l{k + 1}"
            self._blocks.append((bn, ln, d_in, d_out))
            param_entries += [
                ((bn, "w"), (d_in,), f32),
                ((bn, "b"), (d_in,), f32),
                ((ln, "w"), (d_out, d_in), f32),
                ((ln, "b"), (d_out,), f32),
            ]
            state_entries += [
                ((bn, "w"), (d_in,), f32),
                ((bn, "b"), (d_in,), f32),
                ((bn, "mean"), (d_in,), f32),
                ((bn, "var"), (d_in,), f32),
                ((bn, "n"), (), f32),
                ((ln, "w"), (d_out, d_in), f32),
                ((ln, "b"), (d_out,), f32),
            ]
        self.param_spec = FlatSpec.make(param_entries)
        self.state_spec = FlatSpec.make(state_entries)

    # -- construction ------------------------------------------------------------

    def init(self, seed: int) -> Tuple[Params, State]:
        shapes = []
        for bn, ln, d_in, d_out in self._blocks:
            shapes += [(d_in,), (d_out, d_in)]
        weights = normc_layers(shapes, seed)
        params: Params = {}
        state: State = {}
        wi = iter(weights)
        for bn, ln, d_in, d_out in self._blocks:
            params[bn] = {"w": next(wi), "b": np.zeros(d_in, np.float32)}
            params[ln] = {"w": next(wi), "b": np.zeros(d_out, np.float32)}
            state[bn] = {
                "mean": np.zeros(d_in, np.float32),
                "var": np.ones(d_in, np.float32),
                "n": np.zeros((), np.float32),
            }
        return params, state

    # -- forward -----------------------------------------------------------------

    def apply(self, params: Params, state: State, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.reshape(jnp.asarray(x, jnp.float32), (-1, self.input_shape))
        n_blocks = len(self._blocks)
        for k, (bn, ln, _, _) in enumerate(self._blocks):
            x = layers.batchnorm_eval(params[bn], state[bn], x)
            x = layers.linear(params[ln], x)
            if k < n_blocks - 1:
                x = jax.nn.relu(x)
        return layers.softmax(x)

    def act(self, params, state, obs, key, deterministic):
        probs = self.apply(params, state, obs)[0]
        det = jnp.argmax(probs)
        sto = jax.random.categorical(key, jnp.log(jnp.maximum(probs, 1e-38)))
        return jnp.where(deterministic, det, sto).astype(jnp.int32)

    def entropy(self, params, state, xs):
        probs = self.apply(params, state, xs)
        return layers.categorical_entropy(probs).mean()

    def strategy(self, params, state, zeta):
        return self.apply(params, state, zeta)

    def vbn(self, params: Params, state: State, buffer: jnp.ndarray) -> State:
        x = jnp.reshape(jnp.asarray(buffer, jnp.float32), (-1, self.input_shape))
        new_state = dict(state)
        n_blocks = len(self._blocks)
        for k, (bn, ln, _, _) in enumerate(self._blocks):
            x, new_state[bn] = layers.batchnorm_train(params[bn], state[bn], x)
            x = layers.linear(params[ln], x)
            if k < n_blocks - 1:
                x = jax.nn.relu(x)
        return new_state

    # -- reference-construction metadata -----------------------------------------

    def reference_linear_dims(self):
        return [(d_in, d_out) for _, _, d_in, d_out in self._blocks]

    def linear_names(self):
        return [ln for _, ln, _, _ in self._blocks]

    def weighted_layer_names(self):
        names = []
        for bn, ln, _, _ in self._blocks:
            names += [bn, ln]
        return names

    # -- full-state (wire) view --------------------------------------------------

    def _merge_full(self, params: Params, state: State):
        merged = {}
        for bn, ln, _, _ in self._blocks:
            merged[bn] = {**params[bn], **state[bn]}
            merged[ln] = dict(params[ln])
        return merged

    def _split_full(self, merged):
        params: Params = {}
        state: State = {}
        for bn, ln, _, _ in self._blocks:
            params[bn] = {"w": merged[bn]["w"], "b": merged[bn]["b"]}
            params[ln] = dict(merged[ln])
            state[bn] = {k: merged[bn][k] for k in ("mean", "var", "n")}
        return params, state
