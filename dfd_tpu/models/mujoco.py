"""Continuous-control Gaussian MLP policy (reference policies/mujoco.py:8-41).

Architecture: Linear(64) -> Tanh, twice, then Linear(2 * n_actions) and the
tanh action map (mean in [-1, 1], stddev in [0.1, 1.0]).  No BatchNorm.  The
strategy signature concatenates (mean, std) over zeta.
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


class GaussianMLP(PolicyModel):
    discrete = False

    def __init__(self, n_inputs: int, n_actions: int, hidden: Tuple[int, ...] = (64, 64)):
        self.input_shape = int(n_inputs)
        self.output_shape = int(n_actions)
        self.hidden = tuple(hidden)

        dims = (self.input_shape,) + self.hidden + (2 * self.output_shape,)
        f32 = np.float32
        self._layer_dims = list(zip(dims[:-1], dims[1:]))
        entries = []
        for k, (d_in, d_out) in enumerate(self._layer_dims):
            entries += [((f"l{k + 1}", "w"), (d_out, d_in), f32), ((f"l{k + 1}", "b"), (d_out,), f32)]
        self.param_spec = FlatSpec.make(entries)
        self.state_spec = self.param_spec  # no buffers

    def init(self, seed: int) -> Tuple[Params, State]:
        weights = normc_layers([(o, i) for i, o in self._layer_dims], seed)
        params: Params = {}
        for k, ((d_in, d_out), w) in enumerate(zip(self._layer_dims, weights)):
            params[f"l{k + 1}"] = {"w": w, "b": np.zeros(d_out, np.float32)}
        return params, {}

    def apply(self, params: Params, state: State, x: jnp.ndarray):
        x = jnp.reshape(jnp.asarray(x, jnp.float32), (-1, self.input_shape))
        n = len(self._layer_dims)
        for k in range(n):
            x = layers.linear(params[f"l{k + 1}"], x)
            if k < n - 1:
                x = jnp.tanh(x)
        return layers.map_continuous_to_action(x)

    def act(self, params, state, obs, key, deterministic):
        mean, std = self.apply(params, state, obs)
        mean, std = mean[0], std[0]
        noise = jax.random.normal(key, mean.shape, mean.dtype)
        return jnp.where(deterministic, mean, mean + std * noise)

    def entropy(self, params, state, xs):
        _, std = self.apply(params, state, xs)
        return layers.gaussian_entropy(std).sum(axis=-1).mean()

    def strategy(self, params, state, zeta):
        mean, std = self.apply(params, state, zeta)
        return jnp.concatenate([mean, std], axis=-1)

    # -- reference-construction metadata -----------------------------------------

    def reference_linear_dims(self):
        return list(self._layer_dims)

    def linear_names(self):
        return [f"l{k + 1}" for k in range(len(self._layer_dims))]

    def weighted_layer_names(self):
        return self.linear_names()
