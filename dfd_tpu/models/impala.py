"""IMPALA ResNet + LSTM policy (reference policies/impala.py:8-186, itself a
modified TorchBeast ImpalaCNN).

Architecture per frame: x/255 -> 3 blocks of
[BatchNorm -> Conv3x3 -> MaxPool3x3/2] + two residual sub-blocks
[BN -> ReLU -> Conv3x3 -> BN -> ReLU -> Conv3x3] with skip connections
(channels 16/32/32) -> ReLU -> flatten -> [BN -> Linear(256)] -> ReLU ->
concat(clipped last reward) -> LSTM(256) with done-masked carry ->
[BN -> Linear(n_actions)] -> Softmax.

Notable reference quirks preserved:
- the reference's normc init never fires for this policy (its top-level
  Sequential is [ImpalaCNN, Softmax], neither of which has a ``weight``
  attribute — policy.py:96-101), so initialization is torch's defaults;
  :func:`init` reproduces those distributions (kaiming-uniform fan-in for
  convs/linears, U(-1/sqrt(H), 1/sqrt(H)) for the LSTM, ones/zeros BN);
- the LSTM consumes the *previous* step's reward, clipped to [-1, 1]
  (impala.py:158-159), and its carry resets when the input's done flag is
  set (impala.py:161-175) — in the single-episode rollout engine the carry
  simply starts at zeros each episode.

The per-step path (`act_step`) is what the vectorized rollout scans; the
sequence path (`apply_seq`) batch-evaluates whole episodes for entropy and
strategies, scanning the LSTM over time on device.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dfd_tpu.core.flat import FlatSpec
from dfd_tpu.models import layers
from dfd_tpu.ops import fused_resblock
from dfd_tpu.models.atari import batchnorm2d_eval
from dfd_tpu.models.base import Params, PolicyModel, State

CHANNELS = (16, 32, 32)
HIDDEN = 256


def conv3x3(p, x, compute_dtype=None):
    """3x3 same conv; optionally runs the MXU contraction in bf16 with f32
    accumulation (params stay f32 — the FD perturbations live in f32)."""
    w = p["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )
    return y + p["b"][None, :, None, None]


def conv3x3_patches(p, x, compute_dtype=None):
    """3x3 same conv as im2col + GEMM.

    Under ``vmap`` over member-batched weights (the FD population forward)
    ``lax.conv`` lowers to a grouped conv that leaves the MXU mostly idle;
    extracting patches (a weight-free op that vmaps for free) and contracting
    with an einsum lowers to one batched GEMM instead — measured 2.2x faster
    for the population-batched IMPALA torso at P=64 on a v5e chip."""
    w = p["w"]
    co, ci = w.shape[0], w.shape[1]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    pat = jax.lax.conv_general_dilated_patches(
        x, (3, 3), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )  # [N, ci*9, H, W]
    y = jnp.einsum(
        "nkhw,ok->nohw", pat, w.reshape(co, ci * 9),
        preferred_element_type=jnp.float32,
    )
    return y + p["b"][None, :, None, None]


def conv3x3_nhwc(p, x, compute_dtype=None):
    """3x3 same conv over NHWC activations (im2col + GEMM).

    NHWC is the TPU-native layout: the im2col contraction axis is minormost,
    the produced channel axis is minormost, and the BatchNorms broadcast on
    the last axis — no relayout copies between layers.  Weights stay in the
    torch OIHW order (the flat-parameter parity contract); the reshape to
    [co, ci*9] matches the patches op's (ci, kh, kw) channel ordering."""
    w = p["w"]
    co, ci = w.shape[0], w.shape[1]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    pat = jax.lax.conv_general_dilated_patches(
        x, (3, 3), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [N, H, W, ci*9]
    y = jnp.einsum(
        "nhwk,ok->nhwo", pat, w.reshape(co, ci * 9),
        preferred_element_type=jnp.float32,
    )
    return y + p["b"]


def maxpool3x3s2_nhwc(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def conv3x3_split(p, x, compute_dtype=None):
    """3x3 same conv as a (rows -> K, cols -> N) split GEMM + 3 shifted adds.

    The MXU processes 128x128 blocks; a conv GEMM's utilization is the
    product of its K and N fills.  Full im2col puts all 9 taps in K
    ((9ci, co): 144*16/128^2 = 7% at 16 channels), tap-stacking puts them
    all in N ((ci, 9co): same 7%) — but splitting the kernel's ROWS into K
    and COLUMNS into N ((3ci, 3co)) squares the fill: 48*48/128^2 = 14% at
    16 channels and 96*96/128^2 = 56% at 32 channels.  The horizontal-tap
    reduction that the GEMM no longer performs is 3 shifted adds on the VPU.
    Measured only +3% over full im2col for the full population epoch
    (21.9k vs 21.2k env-steps/s at P=64): the epoch is not GEMM-throughput
    bound at these widths — kept as an option and as the documented
    fill-analysis data point (docs/RESULTS.md)."""
    w = p["w"]
    co, ci = w.shape[0], w.shape[1]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    # vertical-only im2col: channel k = i*3 + dy (patches orders (ci, kh, kw))
    pat3 = jax.lax.conv_general_dilated_patches(
        x, (3, 1), (1, 1), ((1, 1), (0, 0)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )  # [N, ci*3, H, W]
    w2 = w.transpose(1, 2, 3, 0).reshape(ci * 3, 3 * co)  # [(i,dy), (dx,o)]
    y3 = jnp.einsum(
        "nkhw,km->nmhw", pat3, w2, preferred_element_type=jnp.float32
    )  # [N, 3*co, H, W], m = dx*co + o
    W = x.shape[-1]
    y3p = jnp.pad(y3, ((0, 0), (0, 0), (0, 0), (1, 1)))
    y = (
        y3p[:, 0 * co : 1 * co, :, 0 : W]
        + y3p[:, 1 * co : 2 * co, :, 1 : W + 1]
        + y3p[:, 2 * co : 3 * co, :, 2 : W + 2]
    )
    return y + p["b"][None, :, None, None]


CONV_IMPLS = {
    "lax": conv3x3,
    "patches": conv3x3_patches,
    "nhwc": conv3x3_nhwc,
    "split": conv3x3_split,
    # "fused": patches for feat convs + the pallas fused residual-pair kernel
    # (ops/fused_resblock.py) for each stage's res blocks — 2.3-2.5x on the
    # res chain at production widths, measured (tools/probe_pallas_wide.py)
    "fused": conv3x3_patches,
    # "fused_feat": "fused" plus the fused feature block (BN -> conv ->
    # maxpool in VMEM, no HBM im2col tensor — the dense-path memory wall at
    # production widths, round 4).  Opt-in until its real-hardware speed is
    # characterized; the res-pair kernel alone is the HW-measured operating
    # point carried in bench.py
    "fused_feat": conv3x3_patches,
}


def maxpool3x3s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1, 3, 3), window_strides=(1, 1, 2, 2),
        padding=((0, 0), (0, 0), (1, 1), (1, 1)),
    )


def lstm_step(p, x, carry):
    """torch-layout LSTM cell: gates ordered (i, f, g, o)."""
    h, c = carry
    gates = x @ p["w_ih"].T + p["b_ih"] + h @ p["w_hh"].T + p["b_hh"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, (h, c)


class ImpalaPolicy(PolicyModel):
    discrete = True
    recurrent = True

    def __init__(
        self,
        frame_shape: Tuple[int, int, int],
        n_actions: int,
        use_lstm: bool = True,
        compute_dtype=None,
        conv_impl: str = "patches",
        channels=CHANNELS,
        hidden: int = HIDDEN,
    ):
        """``frame_shape``: (C, H, W) of one frame (procgen: (3, 64, 64)).

        ``compute_dtype=jnp.bfloat16`` runs the conv/fc contractions on the
        MXU in bf16 with f32 accumulation; parameters, the LSTM cell and the
        policy head stay f32 (probs within ~1e-2 of the f32 path).

        ``conv_impl``: "patches" (default; im2col + batched GEMM — the fast
        lowering under population vmap), "lax" (direct lax.conv), "fused"
        (patches + the pallas residual-pair kernel — the HW-measured
        production operating point), or "fused_feat" ("fused" plus the
        fused feature block, killing the feat conv's HBM im2col tensor).

        ``channels``/``hidden``: torso widths.  The reference's 16/32/32
        (policies/impala.py:63) is the parity default; production-scale
        widths (e.g. 64/128/128) are where the MXU and bf16 actually engage
        — see docs/RESULTS.md roofline note."""
        c, h, w = (int(v) for v in frame_shape)
        self.channels = tuple(int(x) for x in channels)
        self.hidden = int(hidden)
        self.compute_dtype = compute_dtype
        self.conv_impl = conv_impl
        self._conv = CONV_IMPLS[conv_impl]
        self.frame_chw = (c, h, w)
        self.input_shape = (c, h, w)
        self.output_shape = int(n_actions)
        self.use_lstm = use_lstm

        hw = h
        for _ in self.channels:
            hw = (hw + 2 * 1 - 3) // 2 + 1  # maxpool 3x3 s2 p1
        ww = w
        for _ in self.channels:
            ww = (ww + 2 * 1 - 3) // 2 + 1
        self.flat_features = self.channels[-1] * hw * ww

        f32 = np.float32
        A = self.output_shape
        core_in = self.hidden + 1  # fc output + clipped reward
        core_out = self.hidden if use_lstm else core_in

        # (name, kind, shape-info) in torch registration order
        self._layers = []
        in_ch = c
        for k, ch in enumerate(self.channels):
            self._layers += [
                (f"feat{k}_bn", "bn", in_ch),
                (f"feat{k}_conv", "conv", (ch, in_ch, 3, 3)),
            ]
            in_ch = ch
        for r in (1, 2):
            for k, ch in enumerate(self.channels):
                self._layers += [
                    (f"res{r}_{k}_bn1", "bn", ch),
                    (f"res{r}_{k}_conv1", "conv", (ch, ch, 3, 3)),
                    (f"res{r}_{k}_bn2", "bn", ch),
                    (f"res{r}_{k}_conv2", "conv", (ch, ch, 3, 3)),
                ]
        self._layers += [
            ("fc_bn", "bn", self.flat_features),
            ("fc", "linear", (self.hidden, self.flat_features)),
        ]
        if use_lstm:
            self._layers += [("lstm", "lstm", (core_in, self.hidden))]
        self._layers += [
            ("policy_bn", "bn", core_out),
            ("policy", "linear", (A, core_out)),
        ]

        param_entries, state_entries = [], []
        for name, kind, info in self._layers:
            if kind == "bn":
                param_entries += [((name, "w"), (info,), f32), ((name, "b"), (info,), f32)]
                state_entries += [
                    ((name, "w"), (info,), f32),
                    ((name, "b"), (info,), f32),
                    ((name, "mean"), (info,), f32),
                    ((name, "var"), (info,), f32),
                    ((name, "n"), (), f32),
                ]
            elif kind in ("conv", "linear"):
                out_dim = info[0]
                param_entries += [((name, "w"), info, f32), ((name, "b"), (out_dim,), f32)]
                state_entries += [((name, "w"), info, f32), ((name, "b"), (out_dim,), f32)]
            elif kind == "lstm":
                ci, hdim = info
                shapes = [
                    (("lstm", "w_ih"), (4 * hdim, ci), f32),
                    (("lstm", "w_hh"), (4 * hdim, hdim), f32),
                    (("lstm", "b_ih"), (4 * hdim,), f32),
                    (("lstm", "b_hh"), (4 * hdim,), f32),
                ]
                param_entries += shapes
                state_entries += shapes
        self.param_spec = FlatSpec.make(param_entries)
        self.state_spec = FlatSpec.make(state_entries)

    # -- init: torch defaults (normc never fires for this policy) ----------------

    def init(self, seed: int):
        rng = np.random.RandomState(seed)
        params: Params = {}
        state: State = {}
        for name, kind, info in self._layers:
            if kind == "bn":
                params[name] = {"w": np.ones(info, np.float32), "b": np.zeros(info, np.float32)}
                state[name] = {
                    "mean": np.zeros(info, np.float32),
                    "var": np.ones(info, np.float32),
                    "n": np.zeros((), np.float32),
                }
            elif kind in ("conv", "linear"):
                fan_in = int(np.prod(info[1:]))
                bound = 1.0 / np.sqrt(fan_in)
                params[name] = {
                    "w": rng.uniform(-bound, bound, info).astype(np.float32),
                    "b": rng.uniform(-bound, bound, info[0]).astype(np.float32),
                }
            elif kind == "lstm":
                ci, hdim = info
                k = 1.0 / np.sqrt(hdim)
                params["lstm"] = {
                    "w_ih": rng.uniform(-k, k, (4 * hdim, ci)).astype(np.float32),
                    "w_hh": rng.uniform(-k, k, (4 * hdim, hdim)).astype(np.float32),
                    "b_ih": rng.uniform(-k, k, 4 * hdim).astype(np.float32),
                    "b_hh": rng.uniform(-k, k, 4 * hdim).astype(np.float32),
                }
        return params, state

    # -- forward pieces ----------------------------------------------------------

    def _torso(self, params, state, frames):
        """frames [B, C, H, W] (raw pixels) -> core features [B, 257]... minus
        the reward concat (caller appends)."""
        if self.conv_impl == "nhwc":
            return self._torso_nhwc(params, state, frames)
        cd = self.compute_dtype
        x = jnp.asarray(frames, jnp.float32) / 255.0
        for k in range(len(self.channels)):
            if self.conv_impl == "fused_feat" and fused_resblock.fused_supported(
                x.shape[2], x.shape[3]
            ) and x.shape[2] % 2 == 0 and x.shape[3] % 2 == 0 and (
                x.shape[1] % 8 == 0
            ):
                # (ci % 8: the tap concat stacks 9 ci-row blocks in sublanes;
                # misaligned blocks — the 3-channel stage-1 input — are kept
                # on the patches path, which is also where im2col is cheapest)
                # feature block (BN -> conv -> pool) fused in VMEM: no im2col
                # patches tensor in HBM — the dense-path memory wall at
                # production widths (round 4; docs/RESULTS.md)
                fw, fb, fs, ft = fused_resblock.feat_weights(
                    params, state, k, layers.BN_EPS
                )
                x = fused_resblock.fused_feat_pool(x, fw, fb, fs, ft, compute_dtype=cd)
            else:
                x = batchnorm2d_eval(params[f"feat{k}_bn"], state[f"feat{k}_bn"], x)
                x = self._conv(params[f"feat{k}_conv"], x, cd)
                x = maxpool3x3s2(x)
            if self.conv_impl in ("fused", "fused_feat") and fused_resblock.fused_supported(
                x.shape[2], x.shape[3]
            ):
                # both res blocks of the stage in one VMEM-resident kernel
                w, b, s, t = fused_resblock.stage_weights(
                    params, state, k, layers.BN_EPS
                )
                x = fused_resblock.fused_res_stage(x, w, b, s, t, compute_dtype=cd)
                continue
            for r in (1, 2):
                res = x
                y = batchnorm2d_eval(params[f"res{r}_{k}_bn1"], state[f"res{r}_{k}_bn1"], x)
                y = jax.nn.relu(y)
                y = self._conv(params[f"res{r}_{k}_conv1"], y, cd)
                y = batchnorm2d_eval(params[f"res{r}_{k}_bn2"], state[f"res{r}_{k}_bn2"], y)
                y = jax.nn.relu(y)
                y = self._conv(params[f"res{r}_{k}_conv2"], y, cd)
                x = y + res
        x = jax.nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = layers.batchnorm_eval(params["fc_bn"], state["fc_bn"], x)
        x = layers.linear(params["fc"], x, compute_dtype=cd)
        return jax.nn.relu(x)

    def _torso_nhwc(self, params, state, frames):
        """The same torso computed in NHWC (channels-minor) layout: one
        transpose in, one transpose out, zero relayouts in between.  The
        pre-flatten transpose back to NCHW preserves the reference's
        channel-major flatten order into the fc weights."""
        cd = self.compute_dtype
        x = jnp.asarray(frames, jnp.float32).transpose(0, 2, 3, 1) / 255.0
        bn = lambda name, v: layers.batchnorm_eval(params[name], state[name], v)
        for k in range(len(self.channels)):
            x = bn(f"feat{k}_bn", x)
            x = conv3x3_nhwc(params[f"feat{k}_conv"], x, cd)
            x = maxpool3x3s2_nhwc(x)
            for r in (1, 2):
                res = x
                y = jax.nn.relu(bn(f"res{r}_{k}_bn1", x))
                y = conv3x3_nhwc(params[f"res{r}_{k}_conv1"], y, cd)
                y = jax.nn.relu(bn(f"res{r}_{k}_bn2", y))
                y = conv3x3_nhwc(params[f"res{r}_{k}_conv2"], y, cd)
                x = y + res
        x = jax.nn.relu(x)
        x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
        x = layers.batchnorm_eval(params["fc_bn"], state["fc_bn"], x)
        x = layers.linear(params["fc"], x, compute_dtype=cd)
        return jax.nn.relu(x)

    def _head(self, params, state, core_output):
        x = layers.batchnorm_eval(params["policy_bn"], state["policy_bn"], core_output)
        logits = layers.linear(params["policy"], x)
        return layers.softmax(logits)

    def initial_carry(self):
        if not self.use_lstm:
            return ()
        return (jnp.zeros((self.hidden,), jnp.float32), jnp.zeros((self.hidden,), jnp.float32))

    def step_probs(self, params, state, frame, prev_reward, carry):
        """One timestep: probs [A] + new carry, for a single frame [C,H,W]."""
        feat = self._torso(params, state, frame[None])[0]
        clipped = jnp.clip(prev_reward, -1.0, 1.0)
        core_in = jnp.concatenate([feat, clipped[None].astype(jnp.float32)])
        if self.use_lstm:
            h, carry = lstm_step(params["lstm"], core_in, carry)
            core_out = h
        else:
            core_out = core_in
        return self._head(params, state, core_out[None])[0], carry

    def act_step(self, params, state, obs, prev_reward, prev_done, carry, key, deterministic):
        probs, carry = self.step_probs(params, state, obs, prev_reward, carry)
        action = jnp.where(
            deterministic,
            jnp.argmax(probs),
            jax.random.categorical(key, jnp.log(jnp.maximum(probs, 1e-38))),
        ).astype(jnp.int32)
        return action, layers.categorical_entropy(probs), carry

    def apply_seq(self, params, state, frames, rewards):
        """Whole-sequence probs [T, A]: torso batched over T, LSTM scanned."""
        feats = self._torso(params, state, frames)                       # [T, 256]
        clipped = jnp.clip(rewards, -1.0, 1.0).astype(jnp.float32)       # [T]
        core_in = jnp.concatenate([feats, clipped[:, None]], axis=-1)    # [T, 257]
        if self.use_lstm:
            def scan_fn(carry, x):
                h, carry = lstm_step(params["lstm"], x, carry)
                return carry, h
            _, hs = jax.lax.scan(scan_fn, self.initial_carry(), core_in)
            core_out = hs
        else:
            core_out = core_in
        return self._head(params, state, core_out)

    # apply() treats a batch of frames as a time sequence with zero rewards —
    # the shape the strategy/entropy paths need when zeta is a frame set.
    def apply(self, params, state, x):
        frames = jnp.asarray(x, jnp.float32)
        if frames.ndim == 3:
            frames = frames[None]
        return self.apply_seq(params, state, frames, jnp.zeros(frames.shape[0]))

    def entropy(self, params, state, xs):
        return layers.categorical_entropy(self.apply(params, state, xs)).mean()

    def strategy(self, params, state, zeta):
        return self.apply(params, state, zeta)

    def vbn(self, params, state, buffer, rewards=None):
        """Full-model VBN refresh: ONE train-mode forward over the buffer
        updates *every* BatchNorm's running statistics, with each BN seeing
        the train-mode (batch-stat-normalized) activations of the layers
        above it — exactly the reference's ``compute_vbn`` (reference
        policies/policy.py:31-34 flips all BNs to train mode; reference
        policies/impala.py:12-16 routes the stacked dict-obs buffer through
        the whole CNN incl. fc/policy heads and the LSTM).

        The reference stacks the buffer as (T=1, B=N) but its batch_first
        LSTM then reads that as (batch=1, seq=N): the buffer is consumed as
        a single sequence with a zero initial carry, which is what the scan
        below reproduces.  ``rewards`` defaults to zeros (the buffer here
        carries raw frames only)."""
        new_state = dict(state)
        conv = conv3x3_patches if self.conv_impl == "nhwc" else self._conv

        def bn2d(name, x):
            n, c, h, w = x.shape
            flat = x.transpose(0, 2, 3, 1).reshape(-1, c)
            y, new_state[name] = layers.batchnorm_train(params[name], state[name], flat)
            return y.reshape(n, h, w, c).transpose(0, 3, 1, 2)

        x = jnp.asarray(buffer, jnp.float32) / 255.0
        for k in range(len(self.channels)):
            x = bn2d(f"feat{k}_bn", x)
            x = maxpool3x3s2(conv(params[f"feat{k}_conv"], x))
            for r in (1, 2):
                res = x
                y = jax.nn.relu(bn2d(f"res{r}_{k}_bn1", x))
                y = conv(params[f"res{r}_{k}_conv1"], y)
                y = jax.nn.relu(bn2d(f"res{r}_{k}_bn2", y))
                y = conv(params[f"res{r}_{k}_conv2"], y)
                x = y + res
        x = jax.nn.relu(x).reshape(x.shape[0], -1)
        y, new_state["fc_bn"] = layers.batchnorm_train(params["fc_bn"], state["fc_bn"], x)
        feats = jax.nn.relu(layers.linear(params["fc"], y))
        n = feats.shape[0]
        rew = jnp.zeros((n,), jnp.float32) if rewards is None else jnp.asarray(rewards, jnp.float32)
        core_in = jnp.concatenate([feats, jnp.clip(rew, -1.0, 1.0)[:, None]], axis=-1)
        if self.use_lstm:
            def scan_fn(carry, xt):
                h, carry = lstm_step(params["lstm"], xt, carry)
                return carry, h
            _, core_out = jax.lax.scan(scan_fn, self.initial_carry(), core_in)
        else:
            core_out = core_in
        _, new_state["policy_bn"] = layers.batchnorm_train(
            params["policy_bn"], state["policy_bn"], core_out
        )
        return new_state

    # -- full-state (wire) view --------------------------------------------------

    def _merge_full(self, params, state):
        merged = {}
        for name, kind, _ in self._layers:
            merged[name] = dict(params[name])
            if kind == "bn":
                merged[name].update(state[name])
        return merged

    def _split_full(self, merged):
        params, state = {}, {}
        for name, kind, _ in self._layers:
            if kind == "bn":
                params[name] = {"w": merged[name]["w"], "b": merged[name]["b"]}
                state[name] = {k: merged[name][k] for k in ("mean", "var", "n")}
            else:
                params[name] = dict(merged[name])
        return params, state

    # -- reference-construction metadata -----------------------------------------

    def reference_module_specs(self):
        """torch modules that draw RNG during reference construction, in
        *construction* order (impala.py:62-111: per channel block the feature
        conv, then the two residual sub-blocks' convs — interleaved, unlike
        the registration order used by the flat views)."""
        specs, names = [], []
        in_ch = self.frame_chw[0]
        for k, ch in enumerate(self.channels):
            specs.append(("conv2d", in_ch, ch, 3, 3))
            names.append(f"feat{k}_conv")
            for r in (1, 2):
                specs += [("conv2d", ch, ch, 3, 3), ("conv2d", ch, ch, 3, 3)]
                names += [f"res{r}_{k}_conv1", f"res{r}_{k}_conv2"]
            in_ch = ch
        specs.append(("linear", self.flat_features, self.hidden))
        names.append("fc")
        if self.use_lstm:
            specs.append(("lstm", self.hidden + 1, self.hidden))
            names.append("lstm")
        specs.append(("linear", self.hidden, self.output_shape))
        names.append("policy")
        self._construction_names = names
        return specs

    def reference_construction_names(self):
        self.reference_module_specs()
        return self._construction_names
