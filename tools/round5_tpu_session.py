"""Round-5 single-process real-chip session.

The relayed TPU tunnel imposes a 20-60 min cooldown after ANY client
disconnect (verify skill), so every real-chip measurement this round rides
ONE long-lived process, in phases:

  1. fused_feat HW parity probe — the round-4 feature-block kernel
     (ops/fused_resblock.py::fused_feat_pool) exercises its REAL Mosaic
     lowering for the first time (interpret-mode tests cannot catch layout
     violations); forward outputs vs the patches lowering.
  2. IMPALA epoch sweep — ms/epoch + env-steps/s for conv lowerings
     {patches, fused, fused_feat} x widths {ref, prod} x bf16, P=64
     (VERDICT r4 missing #1: the kernel was built, never timed).
  3. P=256-dense production operating point — the run fused_feat exists to
     unlock (the patches feat conv's im2col tensor is 17.2 GB there).
  4. cnn_pixelgrid perf pass — scan_unroll / E levers on the bench row
     (VERDICT r4 next #6).
  5. device-lane pipeline window throughput, lanes 1/2/4 (VERDICT r4
     missing #3) + the backend crossover rerun at both K regimes.
  6. 50M-timestep soak on the fast path — with round-5's single-transfer
     metric fetch the sustained rate should sit within ~2x of the bench
     rate, not 7.5x (VERDICT r4 weak #3).
  7. wide-distribution long run: P=16384 x E=4 on 200-level ProcMaze (the
     dose point the P=1024/4096 dose-response extrapolates to "hold" at)
     with a FIXED 64-level deterministic eval panel; checkpointed; runs to
     the wall-clock deadline in tools/round5_phase2.json (re-read every
     epoch, so the deadline/budget can be adjusted live).

Every result is appended as a JSON line to docs/curves/round5_session.jsonl
(flushed immediately: a late crash loses nothing).

Usage: python tools/round5_tpu_session.py [phase ...]   (default: all)
"""

import gc
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "docs", "curves")
LOG = os.path.join(OUT, "round5_session.jsonl")
PHASE2_CFG = os.path.join(os.path.dirname(__file__), "round5_phase2.json")
T0 = time.time()


def log(row: dict) -> None:
    row = {"t": round(time.time(), 1), **row}
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def _sync(x) -> float:
    # scalar host readback: the tunnel can ack block_until_ready early
    return float(jax.device_get(jnp.sum(x)))


# ---------------------------------------------------------------- phase 1


def phase_parity():
    """fused_feat vs patches forward parity ON THE CHIP (f32 and bf16)."""
    from dfd_tpu.models.impala import ImpalaPolicy

    for widths, channels, hidden in (("ref", (16, 32, 32), 256),
                                     ("prod", (64, 128, 128), 512)):
        ref = ImpalaPolicy((3, 64, 64), 15, conv_impl="patches",
                           channels=channels, hidden=hidden)
        params, state = ref.init(0)
        params = jax.tree.map(jnp.asarray, params)
        state = jax.tree.map(jnp.asarray, state)
        frames = jnp.asarray(
            np.random.RandomState(0).rand(4, 3, 64, 64) * 255, jnp.float32
        )
        rewards = jnp.zeros((4,), jnp.float32)
        base = jax.jit(lambda p, f, r: ref.apply_seq(p, state, f, r))(
            params, frames, rewards
        )
        base_probs = np.asarray(jax.device_get(base[0] if isinstance(base, tuple) else base))
        for impl in ("fused", "fused_feat"):
            for cd in (None, jnp.bfloat16):
                m = ImpalaPolicy((3, 64, 64), 15, conv_impl=impl,
                                 channels=channels, hidden=hidden,
                                 compute_dtype=cd)
                out = jax.jit(lambda p, f, r: m.apply_seq(p, state, f, r))(
                    params, frames, rewards
                )
                probs = np.asarray(jax.device_get(out[0] if isinstance(out, tuple) else out))
                dev = float(np.max(np.abs(probs - base_probs)))
                log({"phase": "parity", "widths": widths, "impl": impl,
                     "dtype": "bf16" if cd is not None else "f32",
                     "max_abs_dev_vs_patches_f32": dev,
                     "ok": bool(dev < (0.05 if cd is not None else 2e-4))})
        del ref, params, state
        gc.collect()


# ---------------------------------------------------------------- phase 2+3


SWEEP_ROWS = [
    # reference widths, P=64: the parity-model regime
    ("patches", 64, "ref"), ("fused", 64, "ref"), ("fused_feat", 64, "ref"),
    # production widths, P=64: the bench impala_prod_bf16 operating point
    ("patches", 64, "prod"), ("fused", 64, "prod"), ("fused_feat", 64, "prod"),
    ("fused+bf16", 64, "prod"), ("fused_feat+bf16", 64, "prod"),
    # the P-dense sweep fused_feat exists to unlock (phase 3)
    ("fused_feat+bf16", 128, "prod"), ("fused_feat+bf16", 256, "prod"),
    ("fused+bf16", 128, "prod"),
    # does the dense patches path really hit the wall at P=256 prod?
    ("fused+bf16", 256, "prod"),
]


def phase_epoch_sweep():
    from bench_impala_epoch import bench

    for impl, P, widths in SWEEP_ROWS:
        t0 = time.time()
        try:
            sps = bench(impl, P, widths)
            log({"phase": "epoch_sweep", "impl": impl, "P": P, "widths": widths,
                 "env_steps_per_s": round(sps, 1), "wall_s": round(time.time() - t0, 1)})
        except Exception as e:
            log({"phase": "epoch_sweep", "impl": impl, "P": P, "widths": widths,
                 "error": f"{type(e).__name__}: {str(e)[:300]}",
                 "wall_s": round(time.time() - t0, 1)})
        gc.collect()


# ---------------------------------------------------------------- phase 4


CNN_VARIANTS = [
    {"name": "base_P256", "P": 256, "unroll": 1, "E": 1},
    {"name": "bf16", "P": 256, "unroll": 1, "E": 1, "bf16": True},
    {"name": "unroll4", "P": 256, "unroll": 4, "E": 1},
    {"name": "bf16_unroll4", "P": 256, "unroll": 4, "E": 1, "bf16": True},
    {"name": "E4", "P": 256, "unroll": 1, "E": 4},
    {"name": "E4_unroll2", "P": 256, "unroll": 2, "E": 4},
    {"name": "E4_flat", "P": 256, "unroll": 1, "E": 4, "lowering": "flat"},
    {"name": "P512_E2", "P": 512, "unroll": 1, "E": 2},
    {"name": "bf16_E4_unroll2", "P": 256, "unroll": 2, "E": 4, "bf16": True},
]


def phase_cnn():
    from dfd_tpu.config import TrainConfig
    from dfd_tpu.envs.pixelgrid import PixelGridEnv
    from dfd_tpu.models.atari import AtariCNN
    from dfd_tpu.ops import distances
    from dfd_tpu.runners.vectorized import VectorizedTrainer
    from dfd_tpu.utils.metrics import EpochReporter

    env = PixelGridEnv(grid=8, scale=8, max_steps=40, intensity=1.0)
    for v in CNN_VARIANTS:
        try:
            model = AtariCNN((64, 64), env.n_actions, in_channels=3,
                             compute_dtype=jnp.bfloat16 if v.get("bf16") else None)
            cfg = TrainConfig(batch_size=v["P"], zeta_size=16,
                              max_strategy_history_size=8, episode_length=40,
                              random_seed=0, scan_unroll=v["unroll"],
                              envs_per_perturbation=v["E"],
                              e_lowering=v.get("lowering", "nested"))
            tr = VectorizedTrainer(model, env, distances.categorical_tvd, cfg,
                                   reporter=EpochReporter(quiet=True))
            archive, count = tr._archive_inputs()
            t0 = time.perf_counter()
            state, _ = tr._step(tr.state, archive, count)
            _sync(state.flat)
            compile_s = time.perf_counter() - t0
            n = 8
            t0 = time.perf_counter()
            steps = 0
            for _ in range(n):
                state, metrics = tr._step(state, archive, count)
                steps += metrics["_timesteps"]
            _sync(state.flat)
            dt = time.perf_counter() - t0
            log({"phase": "cnn", **v, "env_steps_per_s": round(int(jax.device_get(steps)) / dt, 1),
                 "ms_per_epoch": round(dt / n * 1e3, 1), "compile_s": round(compile_s, 1)})
            del tr, model
        except Exception as e:
            log({"phase": "cnn", **v, "error": f"{type(e).__name__}: {str(e)[:300]}"})
        gc.collect()


# ---------------------------------------------------------------- phase 5


def phase_pipeline():
    import bench_host_pipeline as bhp

    for K in (192, 96):
        bhp.GemmEnv.K = K
        # capture the tool's JSON lines into the session log as well
        res = bhp.bench_pipeline(16, 100, lane_counts=(1, 2, 4), reps=3)
        base = res.get(1)
        log({"phase": "pipeline", "K": K,
             "env_steps_per_s": {str(l): round(v, 1) for l, v in res.items()},
             "speedup_vs_1lane": {str(l): round(v / base, 2)
                                  for l, v in res.items() if l != 1}})


# ---------------------------------------------------------------- phase 6


def phase_soak():
    """50M-step soak via tools/soak_run.py main() (fast-dispatch rate fix)."""
    import soak_run

    argv = sys.argv
    sys.argv = ["soak_run.py", "50000000"]
    try:
        soak_run.main()
        log({"phase": "soak", "ok": True,
             "note": "full JSON line printed by soak_run (stdout above)"})
    finally:
        sys.argv = argv


# ---------------------------------------------------------------- phase 7


PANEL_K = 64
PANEL_SEED = 977


def _p2_cfg() -> dict:
    # fallback deadline is anchored to SESSION start (a per-call default
    # would never be reached); the file, re-read every epoch, overrides it
    cfg = {"deadline_ts": T0 + 5.0 * 3600, "max_epochs": 400, "ckpt_every": 4}
    if os.path.exists(PHASE2_CFG):
        with open(PHASE2_CFG) as f:
            cfg.update(json.load(f))
    return cfg


def phase_panel_band():
    """Random band FOR THE PANEL: distribution over untrained policies of
    the 64-episode fixed-panel MEAN.  'Decisively holds' for the long run =
    sustained panel mean > band_mean + 3*band_std (no EMA correction
    needed: the panel mean is a plain mean of fixed episodes)."""
    from dfd_tpu.config import TrainConfig
    from dfd_tpu.envs.procmaze import ProcMazeEnv
    from dfd_tpu.models.impala import ImpalaPolicy
    from dfd_tpu.ops import distances
    from dfd_tpu.runners.vectorized import VectorizedTrainer
    from dfd_tpu.utils.metrics import EpochReporter

    env = ProcMazeEnv(num_levels=200, grid=4, scale=16, max_steps=14)
    model = ImpalaPolicy(env.obs_shape, env.n_actions, use_lstm=False)
    cfg = TrainConfig(batch_size=2, zeta_size=4, max_strategy_history_size=2,
                      episode_length=14, random_seed=1000)
    tr = VectorizedTrainer(model, env, distances.categorical_tvd, cfg,
                           reporter=EpochReporter(quiet=True))
    means = []
    for seed in range(24):
        # swap only the trainable flat: untrained BN state is identical
        # across seeds, and the panel closure takes state as an argument,
        # so all 24 policies ride ONE compile
        p, _ = model.init(1000 + seed)
        tr.state = tr.state._replace(flat=jnp.asarray(model.get_flat(p)))
        means.append(float(np.mean(tr.eval_panel(PANEL_K, PANEL_SEED))))
    band = {"n_policies": len(means), "mean": round(float(np.mean(means)), 3),
            "std": round(float(np.std(means)), 3),
            "max": round(float(np.max(means)), 3)}
    band["threshold_3sigma"] = round(band["mean"] + 3 * band["std"], 3)
    with open(os.path.join(OUT, "procmaze_panel_band.json"), "w") as f:
        json.dump({"panel_k": PANEL_K, "panel_seed": PANEL_SEED, **band}, f)
    log({"phase": "panel_band", **band})
    return band


def phase_longrun():
    from dfd_tpu.config import TrainConfig
    from dfd_tpu.envs.procmaze import ProcMazeEnv
    from dfd_tpu.models.impala import ImpalaPolicy
    from dfd_tpu.ops import distances
    from dfd_tpu.runners.vectorized import VectorizedTrainer
    from dfd_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from dfd_tpu.utils.metrics import EpochReporter

    cfg2 = _p2_cfg()
    name = cfg2.get("name", "procmaze_impala_P16384")
    path = os.path.join(OUT, f"{name}.jsonl")
    panel_path = os.path.join(OUT, f"{name}_panel.jsonl")
    ckpt_path = os.path.join(OUT, f"{name}.ckpt.npz")
    resuming = os.path.exists(ckpt_path)

    env = ProcMazeEnv(num_levels=int(cfg2.get("num_levels", 200)),
                      grid=4, scale=16, max_steps=14)
    model = ImpalaPolicy(env.obs_shape, env.n_actions, use_lstm=False)
    # identical lr/sigma/E to the P=1024/4096 dose points: a clean 4x
    # population control (tools/procmaze_learning.py RUNS)
    cfg = TrainConfig(batch_size=int(cfg2.get("batch_size", 16384)),
                      learning_rate=0.02, noise_std=0.1,
                      envs_per_perturbation=int(cfg2.get("E", 4)),
                      population_chunk=cfg2.get("population_chunk", 1024),
                      zeta_size=8, max_strategy_history_size=8, random_seed=0,
                      episode_length=14)
    sink_f = open(path, "a" if resuming else "w", buffering=1)
    rep = EpochReporter(quiet=True, sink=lambda r: sink_f.write(json.dumps(r) + "\n"))
    tr = VectorizedTrainer(model, env, distances.categorical_tvd, cfg, reporter=rep)
    if resuming:
        load_checkpoint(ckpt_path, tr)
        log({"phase": "longrun", "resumed_at_epoch": int(tr.state.epoch)})
    panel_f = open(panel_path, "a" if resuming else "w", buffering=1)

    t_start = time.time()
    while True:
        cfg2 = _p2_cfg()
        e = int(tr.state.epoch)
        if e >= int(cfg2["max_epochs"]):
            log({"phase": "longrun", "stop": "max_epochs", "epoch": e})
            break
        if time.time() >= float(cfg2["deadline_ts"]):
            log({"phase": "longrun", "stop": "deadline", "epoch": e})
            break
        t0 = time.time()
        tr.train_fast(1, sync_every=1)
        panel = tr.eval_panel(int(cfg2.get("panel_k", PANEL_K)), PANEL_SEED)
        row = {"epoch": int(tr.state.epoch),
               "panel_mean": round(float(np.mean(panel)), 4),
               "panel_solved_frac": round(float(np.mean(panel > 9.0)), 4),
               "epoch_wall_s": round(time.time() - t0, 1)}
        panel_f.write(json.dumps(row) + "\n")
        if int(tr.state.epoch) % int(cfg2["ckpt_every"]) == 0:
            save_checkpoint(ckpt_path, tr)
        if int(tr.state.epoch) % 10 == 0:
            log({"phase": "longrun", **row,
                 "noisy": round(tr.reporter.history[-1]["Noisy Reward"], 3),
                 "eval_ema": round(tr.reporter.history[-1]["Policy Reward"], 3)})
    save_checkpoint(ckpt_path, tr)
    sink_f.close()
    panel_f.close()
    log({"phase": "longrun", "done": True, "epochs": int(tr.state.epoch),
         "wall_s": round(time.time() - t_start, 1),
         "steps": tr.cumulative_timesteps})


PHASES = {
    "parity": phase_parity,
    "epoch_sweep": phase_epoch_sweep,
    "cnn": phase_cnn,
    "pipeline": phase_pipeline,
    "soak": phase_soak,
    "panel_band": phase_panel_band,
    "longrun": phase_longrun,
}


def main():
    names = sys.argv[1:] or list(PHASES)
    log({"phase": "session_start", "phases": names,
         "backend": jax.default_backend(), "devices": len(jax.devices())})
    for name in names:
        # no in-process retry: a TPU worker crash poisons the whole process
        # (every later op raises UNAVAILABLE — verify-skill gotcha), so
        # longrun recovery is the PROCESS-level wrapper + checkpoint resume
        attempts = 1
        for a in range(attempts):
            t0 = time.time()
            log({"phase": name, "event": "start", "attempt": a})
            try:
                PHASES[name]()
                log({"phase": name, "event": "end",
                     "wall_s": round(time.time() - t0, 1)})
                break
            except Exception:
                log({"phase": name, "event": "CRASH",
                     "tb": traceback.format_exc()[-1200:],
                     "wall_s": round(time.time() - t0, 1)})
                time.sleep(30)
    log({"phase": "session_end"})


if __name__ == "__main__":
    main()
