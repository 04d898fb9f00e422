"""Decisive config-[3]/[4] learning on ProcMaze: quantified random band +
longer-budget curriculum runs (VERDICT r2 weak #3 / next #6).

The maze's shaped reward telescopes: an episode's return is
(initial L1 distance - final L1 distance) + 10 * reached, so a policy that
never finds the goal nets ~0 (random walk) while a competent one earns
~E[initial distance] + 10 (grid=4: ~12).  "Decisively clear of the random
band" therefore means an eval EMA several sigma above the measured
random-policy return distribution.

  1. ``random_band``: deterministic greedy episodes of N freshly-initialized
     (untrained) policies across random levels -> mean/std of the return an
     untrained agent's eval produces;
  2. training runs (IMPALA curriculum, IMPALA flat, AtariCNN) with per-epoch
     curves dumped to docs/curves/;
  3. a summary line per run: best/final eval EMA vs the band.

Usage: python tools/procmaze_learning.py [run ...]   (default: band + all)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dfd_tpu.config import TrainConfig
from dfd_tpu.envs.procmaze import ProcMazeEnv
from dfd_tpu.fd import rollout as fd_rollout
from dfd_tpu.models.atari import AtariCNN
from dfd_tpu.models.impala import ImpalaPolicy
from dfd_tpu.ops import distances
from dfd_tpu.runners import VectorizedTrainer
from dfd_tpu.utils.metrics import EpochReporter

OUT = os.path.join(os.path.dirname(__file__), "..", "docs", "curves")
os.makedirs(OUT, exist_ok=True)

ENV = dict(grid=4, scale=16, max_steps=14)


def random_band(n_policies=64, seed=0):
    """Eval-return distribution of untrained policies: one deterministic
    greedy episode per freshly-initialized IMPALA policy on a random level
    (exactly what the trainer's fused eval measures at epoch 0).  All
    episodes run under ONE jitted vmap (single compile)."""
    env = ProcMazeEnv(num_levels=10_000, **ENV)
    model = ImpalaPolicy(env.obs_shape, env.n_actions)

    inits = [model.init(seed * 1000 + i) for i in range(n_policies)]
    params = jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                          *[p for p, _ in inits])
    bn_state = jax.tree.map(jnp.asarray, inits[0][1])
    keys = jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.key(seed), jnp.arange(n_policies)
    )
    obs0 = jnp.zeros(model.input_shape, jnp.float32)

    @jax.jit
    def run_all(params, keys):
        def one(p, k):
            return fd_rollout.episode_rollout(
                model, env, p, bn_state, k, env.max_episode_steps,
                deterministic=jnp.asarray(True),
                obs_mean=obs0, obs_std=obs0 + 1.0,
                normalize_obs=False, obs_stats_update_chance=0.0,
                collect_states=False,
            ).reward
        return jax.vmap(one)(params, keys)

    rewards = np.asarray(run_all(params, keys))
    band = {
        "n": n_policies,
        "mean": round(float(rewards.mean()), 3),
        "std": round(float(rewards.std()), 3),
        "max": round(float(rewards.max()), 3),
    }
    with open(os.path.join(OUT, "procmaze_random_band.json"), "w") as f:
        json.dump(band, f)
    print(json.dumps({"run": "random_band", **band}), flush=True)
    return band


RUNS = {
    # longer-budget curriculum: 1 -> 5 -> 50 -> 200 levels, bigger population
    "procmaze_impala_decisive": dict(
        env=lambda: ProcMazeEnv(num_levels=1, **ENV),
        model=lambda env: ImpalaPolicy(env.obs_shape, env.n_actions),
        cfg=dict(batch_size=128, learning_rate=0.1, noise_std=0.1,
                 zeta_size=8, max_strategy_history_size=8, random_seed=0,
                 episode_length=ENV["max_steps"]),
        phases=[(20, 1), (20, 5), (50, 50), (90, 200)],
    ),
    # ES-style plain-SGD variant (the optimizer that made CartPole/Pendulum/
    # swimmer decisive)
    "procmaze_impala_decisive_sgd": dict(
        env=lambda: ProcMazeEnv(num_levels=1, **ENV),
        model=lambda env: ImpalaPolicy(env.obs_shape, env.n_actions),
        cfg=dict(batch_size=128, learning_rate=0.5, noise_std=0.1,
                 optimizer="sgd", zeta_size=8, max_strategy_history_size=8,
                 random_seed=0, episode_length=ENV["max_steps"]),
        phases=[(20, 1), (20, 5), (50, 50), (90, 200)],
    ),
    # the CNN family on the SAME procgen-shaped env (config [3] demonstration)
    "procmaze_atari_cnn": dict(
        env=lambda: ProcMazeEnv(num_levels=1, **ENV),
        model=lambda env: AtariCNN(
            (env.obs_shape[1], env.obs_shape[2]), env.n_actions,
            in_channels=env.obs_shape[0]),
        cfg=dict(batch_size=128, learning_rate=0.1, noise_std=0.1,
                 zeta_size=8, max_strategy_history_size=8, random_seed=0,
                 episode_length=ENV["max_steps"]),
        phases=[(20, 1), (20, 5), (50, 50), (90, 200)],
    ),
    # flat full-distribution control at the same budget
    "procmaze_impala_flat_long": dict(
        env=lambda: ProcMazeEnv(num_levels=200, **ENV),
        model=lambda env: ImpalaPolicy(env.obs_shape, env.n_actions),
        cfg=dict(batch_size=128, learning_rate=0.1, noise_std=0.1,
                 zeta_size=8, max_strategy_history_size=8, random_seed=0,
                 episode_length=ENV["max_steps"]),
        phases=[(180, 200)],
    ),
    # level-luck fix: fitness averaged over E=8 levels per member
    # (envs_per_perturbation) + a step size scaled to the 622k-param model
    # (DSGD's sqrt(d) coefficient makes lr 0.1 a ~0.5-2x-of-theta step at
    # this width — the collapse mode of the first decisive attempt)
    "procmaze_impala_e8": dict(
        env=lambda: ProcMazeEnv(num_levels=1, **ENV),
        model=lambda env: ImpalaPolicy(env.obs_shape, env.n_actions),
        cfg=dict(batch_size=64, learning_rate=0.01, noise_std=0.05,
                 envs_per_perturbation=8,
                 zeta_size=8, max_strategy_history_size=8, random_seed=0,
                 episode_length=ENV["max_steps"]),
        phases=[(15, 1), (15, 5), (40, 50), (80, 200)],
    ),
    "procmaze_impala_e8_flat": dict(
        env=lambda: ProcMazeEnv(num_levels=200, **ENV),
        model=lambda env: ImpalaPolicy(env.obs_shape, env.n_actions),
        cfg=dict(batch_size=64, learning_rate=0.01, noise_std=0.05,
                 envs_per_perturbation=8,
                 zeta_size=8, max_strategy_history_size=8, random_seed=0,
                 episode_length=ENV["max_steps"]),
        phases=[(150, 200)],
    ),
    "procmaze_cnn_e8": dict(
        env=lambda: ProcMazeEnv(num_levels=1, **ENV),
        model=lambda env: AtariCNN(
            (env.obs_shape[1], env.obs_shape[2]), env.n_actions,
            in_channels=env.obs_shape[0]),
        cfg=dict(batch_size=64, learning_rate=0.01, noise_std=0.05,
                 envs_per_perturbation=8,
                 zeta_size=8, max_strategy_history_size=8, random_seed=0,
                 episode_length=ENV["max_steps"]),
        phases=[(15, 1), (15, 5), (40, 50), (80, 200)],
    ),
    # longer narrow phases + moderate step + E-averaging
    "procmaze_impala_long": dict(
        env=lambda: ProcMazeEnv(num_levels=1, **ENV),
        model=lambda env: ImpalaPolicy(env.obs_shape, env.n_actions),
        cfg=dict(batch_size=64, learning_rate=0.03, noise_std=0.1,
                 envs_per_perturbation=8,
                 zeta_size=8, max_strategy_history_size=8, random_seed=0,
                 episode_length=ENV["max_steps"]),
        phases=[(40, 1), (40, 5), (60, 50), (100, 200)],
    ),
    # IMPALA ResNet torso, feedforward variant (the reference's use_lstm
    # flag, policies/impala.py:119): the maze is fully observed, so the
    # LSTM only adds ES-hostile parameters
    "procmaze_impala_ff": dict(
        env=lambda: ProcMazeEnv(num_levels=1, **ENV),
        model=lambda env: ImpalaPolicy(env.obs_shape, env.n_actions,
                                       use_lstm=False),
        cfg=dict(batch_size=64, learning_rate=0.03, noise_std=0.1,
                 envs_per_perturbation=8,
                 zeta_size=8, max_strategy_history_size=8, random_seed=0,
                 episode_length=ENV["max_steps"]),
        phases=[(40, 1), (40, 5), (60, 50), (100, 200)],
    ),
    "procmaze_cnn_long": dict(
        env=lambda: ProcMazeEnv(num_levels=1, **ENV),
        model=lambda env: AtariCNN(
            (env.obs_shape[1], env.obs_shape[2]), env.n_actions,
            in_channels=env.obs_shape[0]),
        cfg=dict(batch_size=64, learning_rate=0.03, noise_std=0.1,
                 envs_per_perturbation=8,
                 zeta_size=8, max_strategy_history_size=8, random_seed=0,
                 episode_length=ENV["max_steps"]),
        phases=[(40, 1), (40, 5), (60, 50), (100, 200)],
    ),
    # train directly on the full distribution at scale (curricula transfer
    # poorly here: narrow phases produce layout memorizers)
    "procmaze_impala_flat_scale": dict(
        env=lambda: ProcMazeEnv(num_levels=200, **ENV),
        model=lambda env: ImpalaPolicy(env.obs_shape, env.n_actions,
                                       use_lstm=False),
        cfg=dict(batch_size=256, learning_rate=0.02, noise_std=0.1,
                 envs_per_perturbation=4,
                 zeta_size=8, max_strategy_history_size=8, random_seed=0,
                 episode_length=ENV["max_steps"]),
        phases=[(400, 200)],
    ),
    # per-level tints scale the raw pixels; running obs normalization
    # removes the scale cue a layout-memorizer keys on
    "procmaze_impala_flat_norm": dict(
        env=lambda: ProcMazeEnv(num_levels=200, **ENV),
        model=lambda env: ImpalaPolicy(env.obs_shape, env.n_actions,
                                       use_lstm=False),
        cfg=dict(batch_size=256, learning_rate=0.02, noise_std=0.1,
                 envs_per_perturbation=4, normalize_obs=True,
                 zeta_size=8, max_strategy_history_size=8, random_seed=0,
                 episode_length=ENV["max_steps"]),
        phases=[(400, 200)],
    ),
    # from-scratch FIXED procedural distributions (no curriculum: narrow
    # warm-starts produce layout memorizers that transfer poorly)
    "procmaze_impala_L5": dict(
        env=lambda: ProcMazeEnv(num_levels=5, **ENV),
        model=lambda env: ImpalaPolicy(env.obs_shape, env.n_actions),
        cfg=dict(batch_size=64, learning_rate=0.03, noise_std=0.1,
                 envs_per_perturbation=8,
                 zeta_size=8, max_strategy_history_size=8, random_seed=0,
                 episode_length=ENV["max_steps"]),
        phases=[(150, 5)],
    ),
    "procmaze_impala_L20": dict(
        env=lambda: ProcMazeEnv(num_levels=20, **ENV),
        model=lambda env: ImpalaPolicy(env.obs_shape, env.n_actions),
        cfg=dict(batch_size=64, learning_rate=0.03, noise_std=0.1,
                 envs_per_perturbation=8,
                 zeta_size=8, max_strategy_history_size=8, random_seed=0,
                 episode_length=ENV["max_steps"]),
        phases=[(250, 20)],
    ),
    # pod-scale population simulated on one chip: P=1024 x E=4 = 4096
    # episodes per update on the full 200-level distribution
    "procmaze_impala_P1024": dict(
        env=lambda: ProcMazeEnv(num_levels=200, **ENV),
        model=lambda env: ImpalaPolicy(env.obs_shape, env.n_actions,
                                       use_lstm=False),
        cfg=dict(batch_size=1024, learning_rate=0.02, noise_std=0.1,
                 envs_per_perturbation=4,
                 zeta_size=8, max_strategy_history_size=8, random_seed=0,
                 episode_length=ENV["max_steps"]),
        phases=[(300, 200)],
    ),
    # the next dose point the P1024 dose-response predicts clears the band:
    # P=4096 x E=4 = 16384 episodes/update, identical lr/sigma/E (a clean 4x
    # population control), fit onto the one chip via population_chunk — the
    # round-3 chunk+E composition is exactly what makes this run possible
    "procmaze_impala_P4096": dict(
        env=lambda: ProcMazeEnv(num_levels=200, **ENV),
        model=lambda env: ImpalaPolicy(env.obs_shape, env.n_actions,
                                       use_lstm=False),
        cfg=dict(batch_size=4096, learning_rate=0.02, noise_std=0.1,
                 envs_per_perturbation=4, population_chunk=1024,
                 zeta_size=8, max_strategy_history_size=8, random_seed=0,
                 episode_length=ENV["max_steps"]),
        phases=[(320, 200)],
        checkpoint=True,
    ),
}


def run_one(name, spec):
    from dfd_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from dfd_tpu.utils.curriculum import train_level_curriculum

    env = spec["env"]()
    model = spec["model"](env)
    path = os.path.join(OUT, f"{name}.jsonl")
    ckpt_path = os.path.join(OUT, f"{name}.ckpt.npz") if spec.get("checkpoint") else None
    resuming = ckpt_path is not None and os.path.exists(ckpt_path)
    # incremental curve sink: hours-long runs must not lose their history to
    # a late crash — each epoch row is appended to the jsonl as it lands
    sink_f = open(path, "a" if resuming else "w", buffering=1)
    rep = EpochReporter(quiet=True, sink=lambda row: sink_f.write(json.dumps(row) + "\n"))
    tr = VectorizedTrainer(model, env, distances.categorical_tvd,
                           TrainConfig(**spec["cfg"]), reporter=rep)
    t0 = time.time()
    if ckpt_path is None:
        train_level_curriculum(tr, spec["phases"], sync_every=10)
    else:
        # checkpointed single-phase run: save every sync so a crash or a
        # wedged device tunnel costs at most 10 epochs
        assert len(spec["phases"]) == 1, "checkpointing supports single-phase runs"
        total = spec["phases"][0][0]
        if resuming:
            load_checkpoint(ckpt_path, tr)
            print(json.dumps({"run": name, "resumed_at_epoch": int(tr.state.epoch)}),
                  flush=True)
        while int(tr.state.epoch) < total:
            tr.train_fast(min(10, total - int(tr.state.epoch)), sync_every=10)
            save_checkpoint(ckpt_path, tr)
    wall = time.time() - t0
    sink_f.close()
    with open(path) as f:
        h = [json.loads(line) for line in f if line.strip()]
    evals = [r["Policy Reward"] for r in h]
    out = {
        "run": name,
        "wall_s": round(wall, 1),
        "epochs": len(h),
        "steps": h[-1]["Cumulative Timesteps"],
        "first_noisy": round(h[0]["Noisy Reward"], 2),
        "last_noisy": round(h[-1]["Noisy Reward"], 2),
        "best_eval_ema": round(max(evals), 2),
        "final_eval_ema": round(float(np.mean(evals[-10:])), 2),
    }
    print(json.dumps(out), flush=True)
    return out


# the no-arg default: the band + the runs RESULTS.md headlines.  The
# exploratory/expensive configs (P=1024, flat-200 sweeps) run only when
# named explicitly, so a reproduction pass neither balloons to hours nor
# overwrites every committed docs/curves artifact.
DEFAULT_RUNS = [
    "procmaze_impala_long", "procmaze_impala_L5", "procmaze_impala_L20",
]


def main():
    names = sys.argv[1:] or ["band"] + DEFAULT_RUNS
    band = None
    for name in names:
        if name == "band":
            band = random_band()
        else:
            run_one(name, RUNS[name])
    if band is not None:
        # the trainer's eval metric is an EMA (0.9/0.1) of single-episode
        # returns; a stationary random policy's EMA has
        # var_EMA = var * (1-rho)/(1+rho), rho=0.9 -> sigma_EMA = 0.229 sigma.
        # "decisive" = the trained eval EMA sits >3 sigma_EMA above the
        # untrained mean (the raw per-episode band would compare a single
        # draw against an average of ~19 effective draws).
        sigma_ema = band["std"] * np.sqrt((1 - 0.9) / (1 + 0.9))
        print(json.dumps({
            "note": "decisive = eval EMA > band mean + 3*sigma_EMA",
            "band_mean": band["mean"],
            "sigma_episode": band["std"],
            "sigma_ema": round(float(sigma_ema), 3),
            "threshold": round(band["mean"] + 3 * float(sigma_ema), 2),
        }))


if __name__ == "__main__":
    main()
