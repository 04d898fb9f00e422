"""Atari CNN policy (reference policies/atari.py:7-51).

4-frame-stacked pixel input -> Conv(16, 8x8, s4) -> BN -> ReLU ->
Conv(32, 4x4, s2) -> BN -> ReLU -> flatten -> Linear(256) -> BN -> ReLU ->
Linear(n_actions) -> Softmax, evaluated in inference mode.

Parameters keep torch's OIHW conv layout so the trainable flat matches
``parameters_to_vector`` element-for-element; XLA re-layouts for the MXU
internally.  Inputs are NCHW = (batch, 4, H, W); a channels-last helper
accepts the (H, W, 4) frames that deepmind-style wrappers emit.
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


def _conv_out(size: int, k: int, s: int) -> int:
    return (size - k) // s + 1


def conv2d(p, x, stride, compute_dtype=None):
    """NCHW conv with OIHW weights (torch layout) + bias.

    Lowered as im2col patches + GEMM: under ``vmap`` over member-batched
    weights (the FD population forward) ``lax.conv`` becomes a grouped conv
    that starves the MXU, while the weight-free patches op vmaps for free
    and the contraction stays one batched GEMM (same finding as the IMPALA
    torso, models/impala.py::conv3x3_patches — 2.2x there).

    ``compute_dtype`` (e.g. bf16) casts the GEMM operands; accumulation
    stays f32 via ``preferred_element_type`` (the MXU's native mode)."""
    w = p["w"]
    co, ci, kh, kw = w.shape
    pat = jax.lax.conv_general_dilated_patches(
        x, (kh, kw), (stride, stride), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )  # [N, ci*kh*kw, H', W']
    wk = w.reshape(co, ci * kh * kw)
    if compute_dtype is not None:
        pat = pat.astype(compute_dtype)
        wk = wk.astype(compute_dtype)
    y = jnp.einsum("nkhw,ok->nohw", pat, wk, preferred_element_type=jnp.float32)
    return y + p["b"][None, :, None, None]


def batchnorm2d_eval(p, s, x):
    bc = lambda v: v[None, :, None, None]
    return (x - bc(s["mean"])) / jnp.sqrt(bc(s["var"]) + layers.BN_EPS) * bc(p["w"]) + bc(p["b"])


class AtariCNN(PolicyModel):
    discrete = True

    def __init__(self, frame_shape: Tuple[int, int], n_actions: int, in_channels: int = 4,
                 compute_dtype=None):
        """``compute_dtype``: optional reduced-precision GEMM operand dtype
        (bf16) for the conv/fc contractions, f32 accumulation — the same
        lever as ImpalaPolicy(compute_dtype=...); parameters, BatchNorm and
        the softmax head stay f32."""
        h, w = int(frame_shape[0]), int(frame_shape[1])
        self.frame_hw = (h, w)
        self.in_channels = in_channels
        self.compute_dtype = compute_dtype
        self.input_shape = (in_channels, h, w)
        self.output_shape = int(n_actions)

        h1, w1 = _conv_out(h, 8, 4), _conv_out(w, 8, 4)
        h2, w2 = _conv_out(h1, 4, 2), _conv_out(w1, 4, 2)
        self.flat_features = 32 * h2 * w2

        f32 = np.float32
        A = self.output_shape
        self._weight_shapes = [
            ("conv1", (16, in_channels, 8, 8)),
            ("bn1", (16,)),
            ("conv2", (32, 16, 4, 4)),
            ("bn2", (32,)),
            ("fc", (256, self.flat_features)),
            ("bn3", (256,)),
            ("head", (A, 256)),
        ]
        bias_dims = {
            "conv1": 16, "bn1": 16, "conv2": 32, "bn2": 32,
            "fc": 256, "bn3": 256, "head": A,
        }
        # torch registration order: conv1, bn1, conv2, bn2, fc, bn3, head
        param_entries, state_entries = [], []
        for name, wshape in self._weight_shapes:
            b = bias_dims[name]
            param_entries += [((name, "w"), wshape, f32), ((name, "b"), (b,), f32)]
            state_entries += [((name, "w"), wshape, f32), ((name, "b"), (b,), f32)]
            if name.startswith("bn"):
                state_entries += [
                    ((name, "mean"), (b,), f32),
                    ((name, "var"), (b,), f32),
                    ((name, "n"), (), f32),
                ]
        self.param_spec = FlatSpec.make(param_entries)
        self.state_spec = FlatSpec.make(state_entries)
        self._bns = ["bn1", "bn2", "bn3"]

    def init(self, seed: int):
        # the reference's normc visits every weighted layer in module order
        # (policy.py:96-101), conv weights normalized over axis 0
        weights = normc_layers([s for _, s in self._weight_shapes], seed)
        params: Params = {}
        state: State = {}
        for (name, wshape), w in zip(self._weight_shapes, weights):
            bias_dim = next(s for p, s, _ in self.param_spec.entries if p == (name, "b"))[0]
            params[name] = {"w": w, "b": np.zeros(bias_dim, np.float32)}
            if name.startswith("bn"):
                state[name] = {
                    "mean": np.zeros(bias_dim, np.float32),
                    "var": np.ones(bias_dim, np.float32),
                    "n": np.zeros((), np.float32),
                }
        return params, state

    # -- forward -----------------------------------------------------------------

    def _features(self, params, state, x, train=False, new_state=None):
        cd = self.compute_dtype
        x = conv2d(params["conv1"], x, 4, cd)
        x = self._bn2d(params, state, "bn1", x, train, new_state)
        x = jax.nn.relu(x)
        x = conv2d(params["conv2"], x, 2, cd)
        x = self._bn2d(params, state, "bn2", x, train, new_state)
        x = jax.nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        # the fc GEMM is the widest contraction (256 x flat_features)
        x = layers.linear(params["fc"], x, compute_dtype=cd)
        x = self._bn1d(params, state, "bn3", x, train, new_state)
        x = jax.nn.relu(x)
        return layers.linear(params["head"], x)

    def _bn2d(self, params, state, name, x, train, new_state):
        if not train:
            return batchnorm2d_eval(params[name], state[name], x)
        n, c, h, w = x.shape
        flat = x.transpose(0, 2, 3, 1).reshape(-1, c)
        y, ns = layers.batchnorm_train(params[name], state[name], flat)
        new_state[name] = ns
        return y.reshape(n, h, w, c).transpose(0, 3, 1, 2)

    def _bn1d(self, params, state, name, x, train, new_state):
        if not train:
            return layers.batchnorm_eval(params[name], state[name], x)
        y, ns = layers.batchnorm_train(params[name], state[name], x)
        new_state[name] = ns
        return y

    def apply(self, params, state, x):
        x = self._to_nchw(jnp.asarray(x, jnp.float32))
        return layers.softmax(self._features(params, state, x))

    def _to_nchw(self, x):
        c, h, w = self.input_shape
        if x.ndim == 3:
            x = x[None]
        if x.shape[1:] == (h, w, c):  # channels-last frames from wrappers
            x = x.transpose(0, 3, 1, 2)
        return x.reshape(-1, c, h, w)

    def act(self, params, state, obs, key, deterministic):
        probs = self.apply(params, state, obs)[0]
        det = jnp.argmax(probs)
        sto = jax.random.categorical(key, jnp.log(jnp.maximum(probs, 1e-38)))
        return jnp.where(deterministic, det, sto).astype(jnp.int32)

    def entropy(self, params, state, xs):
        return layers.categorical_entropy(self.apply(params, state, xs)).mean()

    def strategy(self, params, state, zeta):
        return self.apply(params, state, zeta)

    def vbn(self, params, state, buffer):
        new_state = dict(state)
        x = self._to_nchw(jnp.asarray(buffer, jnp.float32))
        self._features(params, state, x, train=True, new_state=new_state)
        return new_state

    # -- full-state (wire) view --------------------------------------------------

    def _merge_full(self, params, state):
        merged = {}
        for name, _ in self._weight_shapes:
            merged[name] = dict(params[name])
            if name in self._bns:
                merged[name].update(state[name])
        return merged

    def _split_full(self, merged):
        params, state = {}, {}
        for name, _ in self._weight_shapes:
            params[name] = {"w": merged[name]["w"], "b": merged[name]["b"]}
            if name in self._bns:
                state[name] = {k: merged[name][k] for k in ("mean", "var", "n")}
        return params, state

    # -- reference-construction metadata -----------------------------------------

    def reference_module_specs(self):
        c = self.in_channels
        A = self.output_shape
        return [
            ("conv2d", c, 16, 8, 8),
            ("conv2d", 16, 32, 4, 4),
            ("linear", self.flat_features, 256),
            ("linear", 256, A),
        ]

    def weighted_layer_names(self):
        return [n for n, _ in self._weight_shapes]

    def linear_names(self):
        return ["conv1", "conv2", "fc", "head"]
