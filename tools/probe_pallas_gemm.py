"""Probe 2: understand in-pallas GEMM cost structure on this chip.

probe_pallas_torso.py measured ~23-35 us for tiny conv GEMMs inside a
fori_loop — 10x the cycle model.  Hypotheses: (a) per-dot fixed overhead,
(b) fori_loop carry cost, (c) chip runs slow via the tunnel.  Resolve with:
  - big-GEMM sanity (expect tens of TFLOP/s if the clock is fine)
  - chain-length scaling (fixed vs proportional cost)
  - accumulate-free chains (is the VPU add the cost?)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gemm_chain(M, K, N, iters, mode="acc"):
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(M, K).astype(np.float32) * 0.01)
    b = jnp.asarray(rng.randn(K, N).astype(np.float32) * 0.01)

    def k_acc(a_ref, b_ref, o_ref):
        def body(i, acc):
            return acc + jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)
        o_ref[:] = jax.lax.fori_loop(0, iters, body, jnp.zeros_like(o_ref))

    def k_feed(a_ref, b_ref, o_ref):
        # feed the output back through A's first K columns-worth via dynamic
        # dependence without an extra accumulator add
        def body(i, y):
            return jnp.dot(a_ref[:] * (1.0 + y[0, 0] * 1e-20), b_ref[:],
                           preferred_element_type=jnp.float32)
        o_ref[:] = jax.lax.fori_loop(0, iters, body, jnp.zeros((M, N), jnp.float32))

    kern = k_acc if mode == "acc" else k_feed
    f = jax.jit(lambda a, b: pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a, b))
    out = f(a, b)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        out = f(a, b)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (n * iters)
    fl = 2 * M * K * N
    print(f"[{mode}] [{M}x{K}]x[{K}x{N}] iters={iters}: {dt*1e6:8.2f} us/GEMM "
          f"-> {fl/dt/1e12:6.2f} TFLOP/s")
    return dt


def main():
    # big-GEMM sanity: the clock / MXU check (VMEM cap is 16M: keep <= 512^3)
    gemm_chain(512, 512, 512, 128)
    gemm_chain(512, 1024, 512, 128)
    # chain-length scaling at a tiny shape
    for it in (32, 256, 1024):
        gemm_chain(1024, 144, 16, it)
    # accumulate-free variant
    gemm_chain(1024, 144, 16, 256, mode="feed")
    # padded-N variant: does N=128 change the story?
    gemm_chain(1024, 144, 128, 256)
    gemm_chain(1024, 128, 128, 256)
    gemm_chain(128, 128, 128, 256)
    gemm_chain(8, 128, 128, 256)


if __name__ == "__main__":
    main()
