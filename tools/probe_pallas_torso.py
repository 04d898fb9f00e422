"""Feasibility probes for a fused pallas IMPALA-torso kernel (round 2).

The measured plateau of the pixel path is the fusion/relayout fabric around
15 small convs per step (docs/RESULTS.md roofline note).  A fused kernel
keeps the whole member torso in VMEM — IF the building blocks lower:

  1. pltpu.roll along lanes and sublanes (tap shifts in a [C, S] layout)
  2. strided slicing (pool subsample) on sublanes / lanes / major dims
  3. tiny-GEMM orientation: conv GEMMs with the big dim in M vs in N
  4. minor-dim reshapes ([C, S] <-> [C, H, W]) and sublane concat

Usage: python tools/probe_pallas_torso.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn, *args):
    try:
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        print(f"[ok]   {name}: {jax.tree.map(lambda x: x.shape, out)}")
        return out
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()[0][:160]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")
        return None


def main():
    x = jnp.asarray(np.random.RandomState(0).randn(128, 1024).astype(np.float32))

    # -- 1. rolls ---------------------------------------------------------------
    def roll_lanes(x):
        def k(x_ref, o_ref):
            o_ref[:] = pltpu.roll(x_ref[:], 1, 1)
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)

    def roll_sublanes(x):
        def k(x_ref, o_ref):
            o_ref[:] = pltpu.roll(x_ref[:], 1, 0)
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)

    r = run("roll lanes (axis=1, shift=1)", roll_lanes, x)
    if r is not None:
        ref = jnp.roll(x, 1, 1)
        print("       numerics:", bool(jnp.array_equal(r, ref)))
    r = run("roll sublanes (axis=0, shift=1)", roll_sublanes, x)
    if r is not None:
        ref = jnp.roll(x, 1, 0)
        print("       numerics:", bool(jnp.array_equal(r, ref)))

    # roll by W=64 on lanes (vertical tap at 64x64)
    def roll_lanes64(x):
        def k(x_ref, o_ref):
            o_ref[:] = pltpu.roll(x_ref[:], 64, 1)
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    run("roll lanes shift=64", roll_lanes64, x)

    # -- 2. strided slicing -------------------------------------------------------
    def sub_sublane(x):
        def k(x_ref, o_ref):
            o_ref[:] = x_ref[:][::2, :]
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((64, 1024), x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)

    def sub_lane(x):
        def k(x_ref, o_ref):
            o_ref[:] = x_ref[:][:, ::2]
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((128, 512), x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)

    run("strided slice sublanes x[::2, :]", sub_sublane, x)
    run("strided slice lanes x[:, ::2]", sub_lane, x)

    # 3D major-dim stride: [C, H, W] -> [C, ::2, :]
    x3 = x.reshape(128, 16, 64)

    def sub_mid(x3):
        def k(x_ref, o_ref):
            o_ref[:] = x_ref[:][:, ::2, :]
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((128, 8, 64), x3.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x3)
    run("strided slice mid dim of 3D x[:, ::2, :]", sub_mid, x3)

    # -- 4. reshapes + concat -----------------------------------------------------
    def reshape_split_lanes(x):
        def k(x_ref, o_ref):
            o_ref[:] = x_ref[:].reshape(128, 16, 64)
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((128, 16, 64), x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    run("reshape [128,1024]->[128,16,64] (split lanes)", reshape_split_lanes, x)

    def concat_sublanes(x):
        def k(x_ref, o_ref):
            a = x_ref[:]
            o_ref[:] = jnp.concatenate([a, a * 2.0, a * 3.0], axis=0)
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((384, 1024), x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    run("concat along sublanes x3", concat_sublanes, x)

    # -- 5. tiny-GEMM orientations --------------------------------------------------
    # conv-as-GEMM per member: big spatial dim in M (rows) vs in N (lanes).
    # Chained inside one kernel to avoid dispatch noise.
    ITER = 256

    def gemm_chain(a, b, transpose_out):
        def k(a_ref, b_ref, o_ref):
            def body(i, acc):
                y = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)
                return acc + y * (1.0 / ITER)
            o_ref[:] = jax.lax.fori_loop(0, ITER, body, jnp.zeros_like(o_ref))
        out_shape = (a.shape[0], b.shape[1])
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a, b)

    shapes = [
        # (name, M, K, N) — stage-0 res conv (16ch @ 32x32), both orientations
        ("im2col M-major [1024,144]x[144,16]", 1024, 144, 16),
        ("im2col N-major [16,144]x[144,1024]", 16, 144, 1024),
        ("split  M-major [1024,48]x[48,48]", 1024, 48, 48),
        ("split  N-major [48,48]x[48,1024]", 48, 48, 1024),
        # stage-1 res conv (32ch @ 16x16)
        ("s1 im2col N-major [32,288]x[288,256]", 32, 288, 256),
        ("s1 split  N-major [96,96]x[96,256]", 96, 96, 256),
        # feat0 (3->16 @ 64x64)
        ("feat0 im2col N-major [16,27]x[27,4096]", 16, 27, 4096),
    ]
    rng = np.random.RandomState(0)
    for name, M, K, N in shapes:
        a = jnp.asarray(rng.randn(M, K).astype(np.float32))
        b = jnp.asarray(rng.randn(K, N).astype(np.float32))
        try:
            f = jax.jit(lambda a, b: gemm_chain(a, b, False))
            out = f(a, b)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(5):
                out = f(a, b)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / (5 * ITER)
            fl = 2 * M * K * N
            print(f"[gemm] {name}: {dt*1e6:.2f} us/GEMM -> {fl/dt/1e12:.2f} TFLOP/s")
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] gemm {name}: {type(e).__name__}: {str(e).splitlines()[0][:160]}")


if __name__ == "__main__":
    main()
