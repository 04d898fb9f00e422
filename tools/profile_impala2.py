"""Round-2 IMPALA perf: resolve conv-lowering variants with in-jit chained
timing (the tunneled TPU has a ~3ms dispatch floor that masks single-call
micro-timings; each variant here runs K chained iterations inside ONE jit).

Variants for the population-batched torso (per-member conv weights):
  A. current: vmap over lax.conv_general_dilated (grouped-conv lowering)
  B. patches + einsum (batched-GEMM lowering)
  C. patches + einsum with bf16 inputs/weights, f32 accumulation
  D. shared weights (lower bound: what the same FLOPs cost un-grouped)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dfd_tpu.models.impala import CHANNELS, ImpalaPolicy
from dfd_tpu.models.atari import batchnorm2d_eval

K = 8  # chained iterations per timed dispatch


def chain(fn):
    """Run fn K times inside one jit with a data dependence between runs."""

    @jax.jit
    def run(frames, *args):
        def body(f, _):
            out = fn(f, *args)
            f = f + jnp.tanh(jnp.sum(out)) * 1e-12
            return f, ()
        f, _ = jax.lax.scan(body, frames, None, length=K)
        return f
    return run


def timeit(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (n * K)


def torso_conv_variant(model, conv_fn, params, bn_state, frames):
    """The full IMPALA torso with conv3x3 swapped for ``conv_fn``;
    population axis explicit (params leaves have leading P)."""

    def one(p, f):
        x = f[None] / 255.0
        for k in range(len(CHANNELS)):
            x = batchnorm2d_eval(p[f"feat{k}_bn"], bn_state[f"feat{k}_bn"], x)
            x = conv_fn(p[f"feat{k}_conv"], x)
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
                ((0, 0), (0, 0), (1, 1), (1, 1)))
            for r in (1, 2):
                res = x
                y = batchnorm2d_eval(p[f"res{r}_{k}_bn1"], bn_state[f"res{r}_{k}_bn1"], x)
                y = jax.nn.relu(y)
                y = conv_fn(p[f"res{r}_{k}_conv1"], y)
                y = batchnorm2d_eval(p[f"res{r}_{k}_bn2"], bn_state[f"res{r}_{k}_bn2"], y)
                y = jax.nn.relu(y)
                y = conv_fn(p[f"res{r}_{k}_conv2"], y)
                x = y + res
        return x[0]

    return jax.vmap(one)(params, frames)


def conv_lax(p, x):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)
    return y + p["b"][None, :, None, None]


def conv_patches(p, x, dtype=None):
    w = p["w"]
    co, ci = w.shape[0], w.shape[1]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    pat = jax.lax.conv_general_dilated_patches(
        x, (3, 3), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))  # [1, ci*9, H, W]
    y = jnp.einsum("bkhw,ok->bohw", pat, w.reshape(co, ci * 9),
                   preferred_element_type=jnp.float32)
    return y + p["b"][None, :, None, None]


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    model = ImpalaPolicy((3, 64, 64), 15)
    params, bn_state = model.init(0)
    bn_state = jax.tree.map(jnp.asarray, bn_state)
    flat = jnp.asarray(model.get_flat(params))
    eps = jax.random.normal(jax.random.key(1), (P, model.num_params)) * 0.05
    pop_params = jax.jit(jax.vmap(lambda v: model.set_flat(v, xp=jnp)))(flat[None] + eps)
    # only the conv/bn params feed the torso
    frames = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (P, 3, 64, 64)).astype(np.float32))

    fA = chain(lambda f: torso_conv_variant(model, conv_lax, pop_params, bn_state, f))
    fB = chain(lambda f: torso_conv_variant(model, conv_patches, pop_params, bn_state, f))
    fC = chain(lambda f: torso_conv_variant(
        model, functools.partial(conv_patches, dtype=jnp.bfloat16), pop_params, bn_state, f))

    sp, _ = model.init(0)
    sp = jax.tree.map(jnp.asarray, sp)

    def shared(f):
        def one(ff):
            return torso_conv_variant(
                model, conv_lax, jax.tree.map(lambda x: x[None], sp), bn_state, ff[None])[0]
        # batch without per-member weights: single conv at batch P
        x = f / 255.0
        for k in range(len(CHANNELS)):
            x = batchnorm2d_eval(sp[f"feat{k}_bn"], bn_state[f"feat{k}_bn"], x)
            x = conv_lax(sp[f"feat{k}_conv"], x)
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
                ((0, 0), (0, 0), (1, 1), (1, 1)))
            for r in (1, 2):
                res = x
                y = batchnorm2d_eval(sp[f"res{r}_{k}_bn1"], bn_state[f"res{r}_{k}_bn1"], x)
                y = jax.nn.relu(y)
                y = conv_lax(sp[f"res{r}_{k}_conv1"], y)
                y = batchnorm2d_eval(sp[f"res{r}_{k}_bn2"], bn_state[f"res{r}_{k}_bn2"], y)
                y = jax.nn.relu(y)
                y = conv_lax(sp[f"res{r}_{k}_conv2"], y)
                x = y + res
        return x
    fD = chain(shared)

    for name, fn in (("A vmap-lax-conv", fA), ("B patches+einsum", fB),
                     ("C patches+einsum bf16", fC), ("D shared-weights", fD)):
        dt = timeit(fn, frames)
        print(f"[{name}] {dt*1e3:.3f} ms/iter -> {P/dt:,.0f} frames/s")

    # numerics check B vs A on one call
    a = torso_conv_variant(model, conv_lax, pop_params, bn_state, frames)
    b = torso_conv_variant(model, conv_patches, pop_params, bn_state, frames)
    c = torso_conv_variant(
        model, functools.partial(conv_patches, dtype=jnp.bfloat16), pop_params, bn_state, frames)
    print("maxerr B vs A:", float(jnp.max(jnp.abs(a - b))))
    print("maxerr C vs A:", float(jnp.max(jnp.abs(a - c))),
          " scale:", float(jnp.max(jnp.abs(a))))


if __name__ == "__main__":
    main()
