"""Fused pallas kernel for one IMPALA stage's residual pair.

The production conv lowering (models/impala.py::conv3x3_patches) round-trips
an im2col patches tensor through HBM for every conv.  This kernel keeps one
member's activations resident in VMEM across the stage's two res blocks
(4 convs + BN affines + ReLUs + skips, reference policies/impala.py:75-111)
and builds the 3x3 taps in-register via lane/sublane rolls with boundary
masks — one MXU dot per conv, zero HBM traffic between them.

Measured on the v5e chip (tools/probe_pallas_wide.py, readback-synced):

    4x res-conv chain          XLA patches+einsum   this kernel
    128ch @ 16x16 (production)      3.87 ms          1.55 ms  (2.5x)
     64ch @ 32x32 (production)      3.43 ms          1.51 ms  (2.3x)
     16ch @ 32x32 (reference)       1.86 ms          1.41 ms  (1.3x)

At the reference's 16/32/32 widths the chain is MXU-pass-fill-bound
(docs/RESULTS.md round-2 roofline), so the win is modest; at production
widths (64/128/128) the passes carry full 128-lane payloads and eliminating
the patches round-trip pays 2.3-2.5x.

Layout: activations [C, S=H*W] — channels in sublanes, space in lanes;
conv as W[co, 9ci] x pat[9ci, S] (N-major).  Used when S is a lane-tile
multiple (S % 128 == 0); smaller stages fall back to the patches lowering.
Runs in interpret mode on CPU (jnp.roll stands in for pltpu.roll) so the
parity tests cover it without a TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def reorder_conv_weight(w) -> jnp.ndarray:
    """[co, ci, kh, kw] OIHW conv weight -> [co, 9ci] rows ordered
    (kw, kh, ci), matching the kernel's tap build order
    (dx-major, then dy, then channel)."""
    co = w.shape[0]
    return jnp.transpose(w, (0, 3, 2, 1)).reshape(co, -1)


def _build_pat(x, W: int, S: int, roll, masks):
    """[C, S] -> [9C, S] tap matrix: rows (dx, dy, c); 'same' padding via
    boundary masks (a roll is circular; the mask zeroes wrapped lanes)."""
    ml, mr, mt, mb = masks
    up = roll(x, W, 1) * mt          # in[y-1] contributes to out[y]
    dn = roll(x, S - W, 1) * mb      # in[y+1]
    pat3 = jnp.concatenate([up, x, dn], axis=0)          # (dy, c) rows
    left = roll(pat3, 1, 1) * ml     # in[x-1]
    right = roll(pat3, S - 1, 1) * mr
    return jnp.concatenate([left, pat3, right], axis=0)  # (dx, dy, c) rows


def _stage_kernel(x_ref, w_ref, b_ref, s_ref, t_ref, o_ref,
                  *, H: int, W: int, interpret: bool, compute_dtype):
    S = H * W
    roll = jnp.roll if interpret else pltpu.roll
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    col = lane % W
    row = lane // W
    masks = (
        (col != 0).astype(jnp.float32),      # reading x-1 is valid
        (col != W - 1).astype(jnp.float32),  # reading x+1 is valid
        (row != 0).astype(jnp.float32),
        (row != H - 1).astype(jnp.float32),
    )
    x = x_ref[:]
    for r in range(2):  # the stage's two residual blocks
        res = x
        h = x
        for c in range(2):
            j = 2 * r + c
            # BN-eval folded to a per-channel affine, then ReLU
            h = jnp.maximum(h * s_ref[j][:, None] + t_ref[j][:, None], 0.0)
            pat = _build_pat(h, W, S, roll, masks)
            w = w_ref[j]
            if compute_dtype is not None:
                pat = pat.astype(compute_dtype)
                w = w.astype(compute_dtype)
            h = jnp.dot(w, pat, preferred_element_type=jnp.float32)
            h = h + b_ref[j][:, None]
        x = res + h
    o_ref[:] = x


@functools.partial(
    jax.jit, static_argnames=("H", "W", "interpret", "compute_dtype")
)
def _stage_call(x, w, b, s, t, H, W, interpret, compute_dtype):
    C, S = x.shape
    kernel = functools.partial(
        _stage_kernel, H=H, W=W, interpret=interpret, compute_dtype=compute_dtype
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, S), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, w, b, s, t)


def fused_supported(H: int, W: int) -> bool:
    """Lane-tile constraint: space-in-lanes needs S to be a 128 multiple."""
    return (H * W) % 128 == 0


def fused_res_stage(x, w, b, s, t, interpret=None, compute_dtype=None):
    """One IMPALA stage's residual pair over a batch of frames.

    x: [B, C, H, W] activations (post feat-conv + pool);
    w: [4, C, 9C] tap-ordered conv weights (``reorder_conv_weight``);
    b: [4, C] conv biases; s, t: [4, C] folded BN-eval scale/shift
    (scale = gamma / sqrt(var + eps), shift = beta - mean * scale).
    Returns [B, C, H, W] float32.
    """
    if interpret is None:
        interpret = not _on_tpu()
    B, C, H, W = x.shape
    xs = x.reshape(B, C, H * W).astype(jnp.float32)
    call = functools.partial(
        _stage_call, H=H, W=W, interpret=interpret, compute_dtype=compute_dtype
    )
    out = jax.vmap(lambda xb: call(xb, w, b, s, t))(xs)
    return out.reshape(B, C, H, W)


def _dense_maxmap(y, W: int, S: int, roll, masks):
    """[C, S] -> [C, S] 3x3 'same' max map (-inf padding): the stride-1
    neighborhood max at every position.  The caller subsamples even rows/
    cols OUTSIDE the kernel — Mosaic rejects strided lane slices (round-2
    probe, docs/RESULTS.md), but a [C, H, W] ::2 slice is trivial for XLA,
    and the dense map costs one extra VPU max-tree while saving the whole
    im2col round-trip."""
    ml, mr, mt, mb = masks
    neg = jnp.float32(-jnp.inf)
    up = jnp.where(mt > 0, roll(y, W, 1), neg)
    dn = jnp.where(mb > 0, roll(y, S - W, 1), neg)
    v = jnp.maximum(jnp.maximum(up, dn), y)
    left = jnp.where(ml > 0, roll(v, 1, 1), neg)
    right = jnp.where(mr > 0, roll(v, S - 1, 1), neg)
    return jnp.maximum(jnp.maximum(left, right), v)


def _featpool_kernel(x_ref, w_ref, b_ref, s_ref, t_ref, o_ref,
                     *, H: int, W: int, interpret: bool, compute_dtype):
    """One IMPALA stage's feature block, fused: BN-eval affine -> 3x3 conv
    (one MXU dot against in-register taps) -> dense 3x3 max map, all
    VMEM-resident.  Kills the feat conv's [9ci, S] im2col patches tensor —
    the dense-path HBM wall at production widths (P=256: 17.2 GB,
    docs/RESULTS.md) — at the cost of writing the pre-subsample [co, S]
    map (4x the pooled output, but 9ci/4co times less than the patches
    round-trip it replaces).  Reference structure: policies/impala.py:62-75
    (BatchNorm -> Conv2d -> MaxPool, no ReLU in the feature block)."""
    S = H * W
    roll = jnp.roll if interpret else pltpu.roll
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    col = lane % W
    row = lane // W
    masks = (
        (col != 0).astype(jnp.float32),
        (col != W - 1).astype(jnp.float32),
        (row != 0).astype(jnp.float32),
        (row != H - 1).astype(jnp.float32),
    )
    # b/s/t arrive as column vectors [c, 1]: under the member-vmap they batch
    # to [P, c, 1] blocks whose last two dims equal the overall array dims —
    # a 1-D [c] operand would batch to [P, c] with an unsupported (1, c)
    # per-member block (Mosaic requires sublane blocks of 8 or full extent)
    h = x_ref[:] * s_ref[:] + t_ref[:]
    pat = _build_pat(h, W, S, roll, masks)
    w = w_ref[:]
    if compute_dtype is not None:
        pat = pat.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jnp.dot(w, pat, preferred_element_type=jnp.float32) + b_ref[:]
    o_ref[:] = _dense_maxmap(y, W, S, roll, masks)


@functools.partial(
    jax.jit, static_argnames=("H", "W", "interpret", "compute_dtype")
)
def _featpool_call(x, w, b, s, t, H, W, interpret, compute_dtype):
    co = w.shape[0]
    kernel = functools.partial(
        _featpool_kernel, H=H, W=W, interpret=interpret, compute_dtype=compute_dtype
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((co, H * W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, w, b, s, t)


def fused_feat_pool(x, w, b, s, t, interpret=None, compute_dtype=None):
    """One IMPALA stage's feature block (BN -> 3x3 conv -> maxpool 3x3 s2)
    over a batch of frames, with no HBM im2col tensor.

    x: [B, ci, H, W] stage input; w: [co, 9ci] tap-ordered conv weight
    (``reorder_conv_weight``); b: [co]; s, t: [ci] folded BN-eval
    scale/shift.  Returns [B, co, H//2, W//2] float32 (H, W even)."""
    if interpret is None:
        interpret = not _on_tpu()
    B, ci, H, W = x.shape
    xs = x.reshape(B, ci, H * W).astype(jnp.float32)
    call = functools.partial(
        _featpool_call, H=H, W=W, interpret=interpret, compute_dtype=compute_dtype
    )
    # column-vector layout for the per-channel tensors (see _featpool_kernel)
    assert b.ndim == s.ndim == t.ndim == 1, (
        "fused_feat_pool expects 1-D per-channel b/s/t (it builds the [c, 1] "
        f"column-vector Mosaic layout itself); got {b.shape}/{s.shape}/{t.shape}"
    )
    b2, s2, t2 = b[:, None], s[:, None], t[:, None]
    assert b2.shape == (w.shape[0], 1) and s2.shape == t2.shape == (ci, 1)
    dense = jax.vmap(lambda xb: call(xb, w, b2, s2, t2))(xs)
    co = w.shape[0]
    # stride-2 subsample of the dense max map = maxpool 3x3 s2 p1 (H even)
    return dense.reshape(B, co, H, W)[:, :, ::2, ::2]


def feat_weights(params, state, stage: int, eps: float):
    """One stage's feature-block tensors in the fused kernel's layout."""
    conv = params[f"feat{stage}_conv"]
    sc, sh = fold_bn_eval(params[f"feat{stage}_bn"], state[f"feat{stage}_bn"], eps)
    return reorder_conv_weight(conv["w"]), conv["b"], sc, sh


def fold_bn_eval(bn_params, bn_state, eps: float) -> tuple:
    """BN-eval (x - mean)/sqrt(var+eps)*gamma + beta -> (scale, shift)."""
    scale = bn_params["w"] / jnp.sqrt(bn_state["var"] + eps)
    shift = bn_params["b"] - bn_state["mean"] * scale
    return scale, shift


def stage_weights(params, state, stage: int, eps: float):
    """Collect one stage's res-pair tensors from the IMPALA param/state trees
    into the kernel's stacked [4, ...] layout."""
    ws, bs, ss, ts = [], [], [], []
    for r in (1, 2):
        for c in (1, 2):
            conv = params[f"res{r}_{stage}_conv{c}"]
            bn = f"res{r}_{stage}_bn{c}"
            ws.append(reorder_conv_weight(conv["w"]))
            bs.append(conv["b"])
            sc, sh = fold_bn_eval(params[bn], state[bn], eps)
            ss.append(sc)
            ts.append(sh)
    return (jnp.stack(ws), jnp.stack(bs), jnp.stack(ss), jnp.stack(ts))
