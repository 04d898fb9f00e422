"""Parallel host-env backend measurements (SURVEY section 7 hard part 5).

Two questions, answered on real hardware:

  1. backend: does :class:`ThreadPoolVectorEnv` beat the serial
     :class:`PythonVectorEnv` loop for C-engine-style envs whose ``step``
     releases the GIL?  Stand-in env: a numpy-GEMM step of ~MuJoCo-step cost
     (numpy releases the GIL inside BLAS, like the MuJoCo/ALE/procgen
     bindings do around their C cores — the engines themselves are not in
     this image).  Also measured: the native C++ trap pool, whose per-step
     cost is so small that any python-side dispatch dominates — the reason
     the lockstep single-FFI design exists.

  2. pipeline: does the lane-pipelined :class:`BatchedHostEvaluator`
     (device forwards lane k while the host steps lane k-1) beat the serial
     lockstep loop end-to-end?  Measured as full population-window
     throughput, 1 lane vs 2 lanes, over the GEMM stand-in envs.

Usage: python tools/bench_host_pipeline.py [n_envs] [horizon]
One JSON line per measurement.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from dfd_tpu.core.noise import CounterNoise
from dfd_tpu.envs.vector_host import PythonVectorEnv, ThreadPoolVectorEnv
from dfd_tpu.models import DiscreteMLP
from dfd_tpu.runners.host_evaluator import BatchedHostEvaluator


class GemmEnv:
    """C-engine stand-in: each step runs a ~0.3 ms numpy GEMM (BLAS releases
    the GIL, like MuJoCo's mj_step / ALE's act through their bindings).
    Observation is 2-d so the trap-shaped DiscreteMLP drives it unchanged."""

    # GEMM size per step.  Measured on this host (1-thread BLAS): K=192 is
    # ~0.4 ms/step — MuJoCo-class per-step cost, where the thread pool pays
    # (1.7x of the 2-core ceiling); K=96 is ~0.03 ms, where python dispatch
    # dominates and the serial loop wins (the same regime as the native trap
    # pool, whose lockstep single-FFI design exists for exactly that reason).
    # Settable via the CLI; every JSON row echoes the K it ran at, so rows
    # recorded in different regimes stay self-describing (round-4 advisor).
    K = 192

    def __init__(self, i, horizon=200):
        self.i = int(i)
        self.horizon = horizon
        self.t = 0
        rng = np.random.RandomState(1000 + self.i)
        self.a = rng.rand(self.K, self.K).astype(np.float32)
        self.b = rng.rand(self.K, self.K).astype(np.float32)

    def _obs(self):
        return np.array([self.t / self.horizon, self.i / 100.0], np.float32)

    def reset(self):
        self.t = 0
        return self._obs()

    def step(self, action):
        self.a = np.tanh(self.a @ self.b)  # the GIL-releasing "engine"
        self.t += 1
        rew = float(self.a[0, 0])
        return self._obs(), rew, self.t >= self.horizon, {}


def bench_backend(n_envs: int, horizon: int):
    rng = np.random.RandomState(0)
    actions = rng.randint(0, 9, (horizon, n_envs))
    out = {}
    for name, make in (
        ("python_loop", lambda: PythonVectorEnv(lambda i: GemmEnv(i, horizon), n_envs)),
        ("thread_pool", lambda: ThreadPoolVectorEnv(lambda i: GemmEnv(i, horizon), n_envs)),
    ):
        env = make()
        env.reset_all()
        for t in range(3):  # warm (thread pool spin-up, BLAS init)
            env.step(actions[t])
        env.reset_all()
        t0 = time.perf_counter()
        for t in range(horizon):
            env.step(actions[t])
        dt = time.perf_counter() - t0
        out[name] = n_envs * horizon / dt
        if hasattr(env, "close"):
            env.close()
    out["speedup"] = round(out["thread_pool"] / out["python_loop"], 2)
    print(json.dumps({"bench": "vector_backend_gemm_env", "K": GemmEnv.K,
                      "n_envs": n_envs, "horizon": horizon,
                      **{k: round(v, 1) for k, v in out.items()}}), flush=True)

    # the native C++ trap pool for scale: one FFI call per batch
    try:
        from dfd_tpu.envs.native_pool import NativeTrapPool, native_pool_available

        if native_pool_available():
            pool = NativeTrapPool(n_envs)
            pool.reset_all()
            acts = rng.randint(0, 9, (horizon, n_envs)).astype(np.int32)
            t0 = time.perf_counter()
            for t in range(horizon):
                pool.step(acts[t])
            dt = time.perf_counter() - t0
            print(json.dumps({"bench": "native_trap_pool", "n_envs": n_envs,
                              "steps_per_s": round(n_envs * horizon / dt, 1)}),
                  flush=True)
            pool.close()
    except Exception as e:  # pragma: no cover - informational
        print(json.dumps({"bench": "native_trap_pool", "error": str(e)}), flush=True)


def bench_pipeline(n_envs: int, horizon: int, lane_counts=(1, 2, 4), reps: int = 3):
    """Window throughput of the lane-pipelined evaluator: device forwards
    lane k while the host steps lane k-1 (JAX async dispatch as the double
    buffer).  Best-of-``reps`` windows per lane count (host timing jitters
    with the shared relay process)."""
    model = DiscreteMLP(2, 9)
    params, state = model.init(0)
    flat = model.get_flat(params)

    results = {}
    for lanes in lane_counts:
        if n_envs % lanes != 0:
            continue
        per = n_envs // lanes
        vec = (
            ThreadPoolVectorEnv(lambda i: GemmEnv(i, horizon), n_envs)
            if lanes == 1
            else [
                ThreadPoolVectorEnv(lambda i, o=l * per: GemmEnv(o + i, horizon), per)
                for l in range(lanes)
            ]
        )
        noise = CounterNoise(model.num_params, random_seed=1)
        ev = BatchedHostEvaluator(model, vec, noise, sigma=0.05)
        # warm: compile the act path
        ev.evaluate_population(flat, state, epoch=0, horizon=3, key=jax.random.key(0))
        best = 0.0
        for r in range(reps):
            t0 = time.perf_counter()
            rets = ev.evaluate_population(
                flat, state, epoch=1 + r, horizon=horizon, key=jax.random.key(1 + r)
            )
            dt = time.perf_counter() - t0
            steps = sum(r.timesteps for r in rets)
            best = max(best, steps / dt)
        results[lanes] = best
        print(json.dumps({"bench": "host_evaluator_window", "lanes": lanes,
                          "K": GemmEnv.K, "n_envs": n_envs, "horizon": horizon,
                          "env_steps_per_s": round(best, 1)}), flush=True)
    base = results.get(1)
    if base:
        print(json.dumps({"bench": "pipeline_speedup", "K": GemmEnv.K,
                          **{f"x{l}": round(v / base, 2)
                             for l, v in results.items() if l != 1}}), flush=True)
    return results


def main():
    n_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    horizon = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    if len(sys.argv) > 3:
        GemmEnv.K = int(sys.argv[3])
    bench_backend(n_envs, horizon)
    bench_pipeline(n_envs, horizon)


if __name__ == "__main__":
    main()
