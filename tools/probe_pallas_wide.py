"""Fused pallas res-conv chain at PRODUCTION widths vs the XLA lowering.

Round-2's probes (probe_pallas_pool.py) showed the fused kernel wins only
1.26x at the reference's 16-channel torso because co=16 conv GEMMs are
MXU-pass-fill-bound.  RESULTS.md's roofline note names the remaining lever:
production widths, where co=64..128 fills the systolic array's lanes and
the fill cost amortizes.  This probe measures that exact point — the same
fused 4x res-conv chain (per-member weights, grid over P, activations
resident in VMEM, taps via pltpu.roll + boundary masks, one dot per conv)
at the production-width stage shapes:

    stage0:  64ch @ 32x32  (pat [576, 1024] per member)
    stage1: 128ch @ 16x16  (pat [1152, 256] per member)

in both GEMM orientations and bf16, against the XLA patches+einsum chain
the trainer actually runs (models/impala.py::conv3x3_patches).

Usage: python tools/probe_pallas_wide.py [P]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(f, args, n=20):
    """Time n calls CHAINED through the first argument (out feeds back as x),
    closed by a host readback of a scalar.  The data dependency forces serial
    device execution and the readback forces real completion — on the
    tunneled backend ``block_until_ready`` can acknowledge early, which made
    a first version of this probe report >5x the chip's peak FLOP rate.
    Requires f's output shape == args[0] shape."""
    x, rest = args[0], args[1:]
    out = f(x, *rest)
    float(jax.device_get(jnp.sum(out)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(out, *rest)
    float(jax.device_get(jnp.sum(out)))
    return (time.perf_counter() - t0) / n


def probe_stage(P, C, H, W, n_convs=4):
    S = H * W
    rng = np.random.RandomState(2)
    xs = jnp.asarray(rng.randn(P, C, S).astype(np.float32) * 0.1)
    ws = jnp.asarray(rng.randn(P, n_convs, C, C * 9).astype(np.float32) * 0.02)
    bs = jnp.asarray(rng.randn(P, n_convs, C).astype(np.float32) * 0.01)
    fl = P * n_convs * 2 * S * C * C * 9
    rows = {}

    lane = np.arange(S) % W
    row = np.arange(S) // W
    mask_l = jnp.asarray((lane != 0).astype(np.float32))[None, :]
    mask_r = jnp.asarray((lane != W - 1).astype(np.float32))[None, :]
    mask_t = jnp.asarray((row != 0).astype(np.float32))[None, :]
    mask_b = jnp.asarray((row != H - 1).astype(np.float32))[None, :]

    def build_pat(x, ml, mr, mt, mb):
        up = pltpu.roll(x, W, 1) * mt
        dn = pltpu.roll(x, S - W, 1) * mb
        pat3 = jnp.concatenate([up, x, dn], axis=0)
        left = pltpu.roll(pat3, 1, 1) * ml
        right = pltpu.roll(pat3, S - 1, 1) * mr
        return jnp.concatenate([left, pat3, right], axis=0)  # [9C, S]

    def make_fused_n(dtype):
        def k(x_ref, w_ref, b_ref, ml, mr, mt, mb, o_ref):
            x = x_ref[0]
            for j in range(n_convs):
                pat = build_pat(x, ml[:], mr[:], mt[:], mb[:])
                w = w_ref[0, j]
                if dtype is not None:
                    pat, w = pat.astype(dtype), w.astype(dtype)
                y = jnp.dot(w, pat, preferred_element_type=jnp.float32)
                y = jnp.maximum(y + b_ref[0, j][:, None], 0.0)
                x = x + y * 0.25
            o_ref[0] = x
        return k

    grid_n = pl.GridSpec(
        grid=(P,),
        in_specs=[
            pl.BlockSpec((1, C, S), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_convs, C, C * 9), lambda p: (p, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_convs, C), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S), lambda p: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, S), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
    )
    for tag, dtype in (("f32", None), ("bf16", jnp.bfloat16)):
        try:
            f = jax.jit(lambda *a, _d=dtype: pl.pallas_call(
                make_fused_n(_d),
                out_shape=jax.ShapeDtypeStruct((P, C, S), jnp.float32),
                grid_spec=grid_n)(*a))
            dt = bench(f, (xs, ws, bs, mask_l, mask_r, mask_t, mask_b))
            rows[f"fused N-major {tag}"] = dt
            print(f"[fusedN {tag}] {n_convs}x res-conv {C}ch@{H}x{W} P={P}: "
                  f"{dt*1e3:.3f} ms -> {fl/dt/1e12:.2f} TFLOP/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] fusedN {tag}: {type(e).__name__}: {str(e).splitlines()[0][:140]}")

    # M-major orientation: pat [S, 9C] x W [9C, C]
    xs_m = jnp.swapaxes(xs, 1, 2)
    ws_m = jnp.swapaxes(ws, 2, 3)
    m_l = jnp.asarray((lane != 0).astype(np.float32))[:, None]
    m_r = jnp.asarray((lane != W - 1).astype(np.float32))[:, None]
    m_t = jnp.asarray((row != 0).astype(np.float32))[:, None]
    m_b = jnp.asarray((row != H - 1).astype(np.float32))[:, None]

    def build_pat_m(x, ml, mr, mt, mb):
        up = pltpu.roll(x, W, 0) * mt
        dn = pltpu.roll(x, S - W, 0) * mb
        pat3 = jnp.concatenate([up, x, dn], axis=1)
        left = pltpu.roll(pat3, 1, 0) * ml
        right = pltpu.roll(pat3, S - 1, 0) * mr
        return jnp.concatenate([left, pat3, right], axis=1)  # [S, 9C]

    def make_fused_m(dtype):
        def k(x_ref, w_ref, b_ref, ml, mr, mt, mb, o_ref):
            x = x_ref[0]
            for j in range(n_convs):
                pat = build_pat_m(x, ml[:], mr[:], mt[:], mb[:])
                w = w_ref[0, j]
                if dtype is not None:
                    pat, w = pat.astype(dtype), w.astype(dtype)
                y = jnp.dot(pat, w, preferred_element_type=jnp.float32)
                y = jnp.maximum(y + b_ref[0][j][None, :], 0.0)
                x = x + y * 0.25
            o_ref[0] = x
        return k

    grid_m = pl.GridSpec(
        grid=(P,),
        in_specs=[
            pl.BlockSpec((1, S, C), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_convs, C * 9, C), lambda p: (p, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_convs, C), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1), lambda p: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, C), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
    )
    for tag, dtype in (("f32", None), ("bf16", jnp.bfloat16)):
        try:
            f = jax.jit(lambda *a, _d=dtype: pl.pallas_call(
                make_fused_m(_d),
                out_shape=jax.ShapeDtypeStruct((P, S, C), jnp.float32),
                grid_spec=grid_m)(*a))
            dt = bench(f, (xs_m, ws_m, bs, m_l, m_r, m_t, m_b))
            rows[f"fused M-major {tag}"] = dt
            print(f"[fusedM {tag}] {n_convs}x res-conv {C}ch@{H}x{W} P={P}: "
                  f"{dt*1e3:.3f} ms -> {fl/dt/1e12:.2f} TFLOP/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] fusedM {tag}: {type(e).__name__}: {str(e).splitlines()[0][:140]}")

    # XLA production lowering: patches + einsum under vmap, f32 and bf16
    def make_xla(dtype):
        def xla_chain(x, w, b):
            def one(xm, wm, bm):
                xi = xm.reshape(C, H, W)[None]
                for j in range(n_convs):
                    pat = jax.lax.conv_general_dilated_patches(
                        xi, (3, 3), (1, 1), ((1, 1), (1, 1)),
                        dimension_numbers=("NCHW", "OIHW", "NCHW"))
                    wj = wm[j]
                    if dtype is not None:
                        pat, wj = pat.astype(dtype), wj.astype(dtype)
                    y = jnp.einsum("nkhw,ok->nohw", pat, wj,
                                   preferred_element_type=jnp.float32)
                    y = jnp.maximum(y + bm[j][None, :, None, None], 0.0)
                    xi = xi + y * 0.25
                return xi[0].reshape(C, S)
            return jax.vmap(one)(x, w, b)
        return xla_chain

    for tag, dtype in (("f32", None), ("bf16", jnp.bfloat16)):
        f = jax.jit(make_xla(dtype))
        dt = bench(f, (xs, ws, bs))
        rows[f"xla {tag}"] = dt
        print(f"[xla {tag}]   {n_convs}x res-conv {C}ch@{H}x{W} P={P}: "
              f"{dt*1e3:.3f} ms -> {fl/dt/1e12:.2f} TFLOP/s", flush=True)
    return rows


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    print(f"== production stage1: 128ch @ 16x16, P={P} ==", flush=True)
    probe_stage(P, 128, 16, 16)
    print(f"== production stage0: 64ch @ 32x32, P={P} ==", flush=True)
    probe_stage(P, 64, 32, 32)
    print("== reference stage0 (control): 16ch @ 32x32 ==", flush=True)
    probe_stage(P, 16, 32, 32)


if __name__ == "__main__":
    main()
