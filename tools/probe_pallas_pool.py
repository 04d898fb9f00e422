"""Probe 3: lane-subsample candidates (maxpool stride-2) + a REAL fused
res-conv chain vs the XLA lowering.

Layout under test: activations [C, S] with space in lanes (N-major conv GEMMs
W[co, 9ci] x pat[9ci, S]).  The pool needs out[c, s'=(y',x')] = in[c, 2y'.., 2x'..]
i.e. a stride-2 lane selection.  Candidates:
  A. jnp.take(x, idx, axis=1) with static even indices
  B. jax.lax.slice with strides (2 on lanes)
  C. transpose -> sublane ops -> transpose back
  D. Sel-GEMM: x @ Sel with a 0/1 [S, S/4] matrix (guaranteed, costs MXU cycles)

Then: fused 4x res-conv chain per member (grid over P) vs XLA vmap equivalent.
"""

import sys
import time
import functools

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn, *args, check=None):
    try:
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        ok = "" if check is None else f" correct={bool(jnp.allclose(out, check))}"
        print(f"[ok]   {name}: {out.shape}{ok}")
        return out
    except Exception as e:  # noqa: BLE001
        print(f"[FAIL] {name}: {type(e).__name__}: {str(e).splitlines()[0][:140]}")
        return None


def pcall(k, out_shape, n_in):
    return pl.pallas_call(
        k, out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))


def main():
    C, H, W = 16, 64, 64
    S = H * W
    x = jnp.asarray(np.random.RandomState(0).randn(C, S).astype(np.float32))
    # even (y, x) lanes of a [C, H*W] buffer
    yy, xx = np.meshgrid(np.arange(0, H, 2), np.arange(0, W, 2), indexing="ij")
    idx = jnp.asarray((yy * W + xx).reshape(-1).astype(np.int32))
    want = np.asarray(x)[:, np.asarray(idx)]

    def k_take(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], i_ref[:], axis=1)
    run("A jnp.take lanes", lambda x, i: pcall(
        k_take, jax.ShapeDtypeStruct((C, S // 4), x.dtype), 2)(x, i), x, idx,
        check=want)

    # (take_along_axis crashes Mosaic lowering with a hard AssertionError —
    # removed after the first probe run)

    def k_slice(x_ref, o_ref):
        o_ref[:] = jax.lax.slice(x_ref[:], (0, 0), (C, S), (1, 2))
    run("B lax.slice stride-2 lanes", lambda x: pcall(
        k_slice, jax.ShapeDtypeStruct((C, S // 2), x.dtype), 1)(x), x)

    def k_transpose(x_ref, o_ref):
        o_ref[:] = x_ref[:].T
    run("C transpose [16,4096]->[4096,16]", lambda x: pcall(
        k_transpose, jax.ShapeDtypeStruct((S, C), x.dtype), 1)(x), x)

    xt = jnp.asarray(np.random.RandomState(1).randn(48, 1024).astype(np.float32))
    run("C2 transpose [48,1024]->[1024,48]", lambda x: pcall(
        k_transpose, jax.ShapeDtypeStruct((1024, 48), x.dtype), 1)(xt), xt)

    sel = np.zeros((S, S // 4), np.float32)
    sel[np.asarray(idx), np.arange(S // 4)] = 1.0
    sel = jnp.asarray(sel)

    def k_sel(x_ref, s_ref, o_ref):
        o_ref[:] = jnp.dot(x_ref[:], s_ref[:], preferred_element_type=jnp.float32)
    run("D Sel-GEMM", lambda x, s: pcall(
        k_sel, jax.ShapeDtypeStruct((C, S // 4), x.dtype), 2)(x, s), x, sel,
        check=want)

    # -------- fused 4x res-conv chain (one stage-0 worth) vs XLA ---------------
    P = 64
    Cs, Hs, Ws = 16, 32, 32
    Ss = Hs * Ws
    rng = np.random.RandomState(2)
    xs = jnp.asarray(rng.randn(P, Cs, Ss).astype(np.float32) * 0.1)
    ws = jnp.asarray(rng.randn(P, 4, Cs, Cs * 9).astype(np.float32) * 0.05)
    bs = jnp.asarray(rng.randn(P, 4, Cs).astype(np.float32) * 0.01)

    # lane masks for dx shifts (x=0 / x=W-1 columns) — precomputed constants
    lane = np.arange(Ss) % Ws
    mask_l = jnp.asarray((lane != 0).astype(np.float32))[None, :]       # valid when reading x-1
    mask_r = jnp.asarray((lane != Ws - 1).astype(np.float32))[None, :]
    row = np.arange(Ss) // Ws
    mask_t = jnp.asarray((row != 0).astype(np.float32))[None, :]
    mask_b = jnp.asarray((row != Hs - 1).astype(np.float32))[None, :]

    def build_pat(x, ml, mr, mt, mb):
        # vertical first: [3C, S] rows (dy, c).  pltpu.roll requires
        # non-negative shifts; roll is circular so -k == S-k.
        up = pltpu.roll(x, Ws, 1) * mt          # in[y-1]
        dn = pltpu.roll(x, Ss - Ws, 1) * mb     # in[y+1]
        pat3 = jnp.concatenate([up, x, dn], axis=0)
        left = pltpu.roll(pat3, 1, 1) * ml
        right = pltpu.roll(pat3, Ss - 1, 1) * mr
        # im2col channel order (ci, dy, dx): rows grouped (dx, dy, c) here —
        # weights are reordered outside to match, fine for a perf probe
        return jnp.concatenate([left, pat3, right], axis=0)  # [9C, S]

    def fused_kernel(x_ref, w_ref, b_ref, ml, mr, mt, mb, o_ref):
        x = x_ref[:]
        for j in range(4):
            pat = build_pat(x, ml[:], mr[:], mt[:], mb[:])
            y = jnp.dot(w_ref[j], pat, preferred_element_type=jnp.float32)
            y = jnp.maximum(y + b_ref[j][:, None], 0.0)
            x = x + y * 0.25
        o_ref[:] = x

    grid_spec = pl.GridSpec(
        grid=(P,),
        in_specs=[
            pl.BlockSpec((1, Cs, Ss), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, Cs, Cs * 9), lambda p: (p, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, Cs), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ss), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ss), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ss), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ss), lambda p: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Cs, Ss), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
    )

    def fused_kernel_sq(x_ref, w_ref, b_ref, ml, mr, mt, mb, o_ref):
        # refs carry a leading block dim of 1
        x = x_ref[0]
        for j in range(4):
            pat = build_pat(x, ml[:], mr[:], mt[:], mb[:])
            y = jnp.dot(w_ref[0, j], pat, preferred_element_type=jnp.float32)
            y = jnp.maximum(y + b_ref[0, j][:, None], 0.0)
            x = x + y * 0.25
        o_ref[0] = x

    try:
        f = jax.jit(lambda *a: pl.pallas_call(
            fused_kernel_sq,
            out_shape=jax.ShapeDtypeStruct((P, Cs, Ss), jnp.float32),
            grid_spec=grid_spec)(*a))
        args = (xs, ws, bs, mask_l, mask_r, mask_t, mask_b)
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        n = 20
        for _ in range(n):
            out = f(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        fl = P * 4 * 2 * Ss * Cs * Cs * 9
        print(f"[fused] 4x res-conv chain P={P}: {dt*1e3:.3f} ms -> {fl/dt/1e12:.2f} TFLOP/s")
    except Exception as e:  # noqa: BLE001
        print(f"[FAIL] fused chain: {type(e).__name__}: {str(e).splitlines()[:3]}")

    # ---- M-major fused variant: activations [S, C], sublane rolls,
    # pat [S, 9C] by lane concat, dot [S,144]x[144,16] (2 passes of M=1024
    # streaming vs 16 fill-bound passes in the N-major version) -------------
    xs_m = jnp.swapaxes(xs, 1, 2)  # [P, Ss, Cs]
    ws_m = jnp.swapaxes(ws, 2, 3)  # [P, 4, Cs*9, Cs]
    col = np.arange(Ss) % Ws
    rowi = np.arange(Ss) // Ws
    m_l = jnp.asarray((col != 0).astype(np.float32))[:, None]
    m_r = jnp.asarray((col != Ws - 1).astype(np.float32))[:, None]
    m_t = jnp.asarray((rowi != 0).astype(np.float32))[:, None]
    m_b = jnp.asarray((rowi != Hs - 1).astype(np.float32))[:, None]

    def build_pat_m(x, ml, mr, mt, mb):
        up = pltpu.roll(x, Ws, 0) * mt
        dn = pltpu.roll(x, Ss - Ws, 0) * mb
        pat3 = jnp.concatenate([up, x, dn], axis=1)          # [S, 3C]
        left = pltpu.roll(pat3, 1, 0) * ml
        right = pltpu.roll(pat3, Ss - 1, 0) * mr
        return jnp.concatenate([left, pat3, right], axis=1)  # [S, 9C]

    def make_fused_m(dtype):
        def fused_m(x_ref, w_ref, b_ref, ml, mr, mt, mb, o_ref):
            x = x_ref[0]
            for j in range(4):
                pat = build_pat_m(x, ml[:], mr[:], mt[:], mb[:])
                w = w_ref[0, j]
                if dtype is not None:
                    pat = pat.astype(dtype)
                    w = w.astype(dtype)
                y = jnp.dot(pat, w, preferred_element_type=jnp.float32)
                y = jnp.maximum(y + b_ref[0][j][None, :], 0.0)
                x = x + y * 0.25
            o_ref[0] = x
        return fused_m

    grid_spec_m = pl.GridSpec(
        grid=(P,),
        in_specs=[
            pl.BlockSpec((1, Ss, Cs), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, Cs * 9, Cs), lambda p: (p, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, Cs), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ss, 1), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ss, 1), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ss, 1), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ss, 1), lambda p: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Ss, Cs), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
    )

    for tag, dtype in (("f32", None), ("bf16", jnp.bfloat16)):
        try:
            fm = jax.jit(lambda *a, _d=dtype: pl.pallas_call(
                make_fused_m(_d),
                out_shape=jax.ShapeDtypeStruct((P, Ss, Cs), jnp.float32),
                grid_spec=grid_spec_m)(*a))
            args_m = (xs_m, ws_m, bs, m_l, m_r, m_t, m_b)
            out = fm(*args_m)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            n = 20
            for _ in range(n):
                out = fm(*args_m)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / n
            fl = P * 4 * 2 * Ss * Cs * Cs * 9
            print(f"[fusedM {tag}] 4x res-conv chain P={P}: {dt*1e3:.3f} ms "
                  f"-> {fl/dt/1e12:.2f} TFLOP/s")
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] fusedM {tag}: {type(e).__name__}: {str(e).splitlines()[:3]}")

    # XLA equivalent: patches+einsum under vmap (the current production lowering)
    def xla_chain(x, w, b):
        def one(xm, wm, bm):
            xi = xm.reshape(Cs, Hs, Ws)[None]
            for j in range(4):
                pat = jax.lax.conv_general_dilated_patches(
                    xi, (3, 3), (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NCHW", "OIHW", "NCHW"))
                y = jnp.einsum("nkhw,ok->nohw", pat, wm[j],
                               preferred_element_type=jnp.float32)
                y = jnp.maximum(y + bm[j][None, :, None, None], 0.0)
                xi = xi + y * 0.25
            return xi[0].reshape(Cs, Ss)
        return jax.vmap(one)(x, w, b)

    fx = jax.jit(xla_chain)
    # match weight layout [co, ci*9]: probe uses (dx, dy, c) grouping; for a
    # *timing* comparison the exact permutation doesn't matter
    out = fx(xs, ws, bs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        out = fx(xs, ws, bs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    fl = P * 4 * 2 * Ss * Cs * Cs * 9
    print(f"[xla]   4x res-conv chain P={P}: {dt*1e3:.3f} ms -> {fl/dt/1e12:.2f} TFLOP/s")


if __name__ == "__main__":
    main()
