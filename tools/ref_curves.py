"""Seeded learning-curve comparison: reference loop vs the rebuild.

The north-star criterion (BASELINE.md) asks for learning curves "within
seed variance" of the reference.  This harness measures it directly:

  - the REFERENCE side runs the reference's own torch components
    (DiscretePolicy/MujocoPolicy + DSGD + AdaptiveOmega + Worker/Agent +
    FiniteDifferences, loaded from /root/reference via tests/_reference.py)
    through run_sequential.py's exact loop (reference run_sequential.py:
    113-182), over this repo's host env adapters so both sides step the
    identical environment dynamics;
  - the REBUILD side runs the production VectorizedTrainer on the same
    JaxEnv with the same seeds, hyperparameters, and per-epoch population
    budget.

3 seeds per family (trap / CartPole / Pendulum).  Curves land in
docs/curves/ref_{env}_s{seed}.jsonl and ours_{env}_s{seed}.jsonl; the
summary (tail-window means, the reference's seed band, pass/fail) prints
as one JSON line per family and is appended to docs/curves/ref_band.json.

Usage: python tools/ref_curves.py [trap cartpole pendulum] [--seeds 3]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# host-loop curve runs: per-step dispatch over the TPU tunnel would dominate
# wall-clock; the comparison is about learning dynamics, not throughput
jax.config.update("jax_platforms", "cpu")

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "docs", "curves")
os.makedirs(OUT, exist_ok=True)

# one hyperparameter set per family, identical on both sides
FAMILIES = {
    "trap": dict(obs=2, act=9, discrete=True, epochs=60, batch=16,
                 lr=0.05, sigma=0.05, zeta=32, history=16, eval_prob=0.1),
    "cartpole": dict(obs=4, act=2, discrete=True, epochs=80, batch=16,
                     lr=0.05, sigma=0.05, zeta=32, history=16, eval_prob=0.1),
    "pendulum": dict(obs=3, act=1, discrete=False, epochs=60, batch=16,
                     lr=0.02, sigma=0.05, zeta=32, history=16, eval_prob=0.1),
    # CartPole band where the reference LEARNS (round-4 item: the DSGD band
    # above is a matched stall — measured grid: DSGD stalls CartPole at every
    # corner of the reference's own sweep ranges, lr 0.005-0.1 x sigma
    # 0.025-0.1 x batch 16-100, run_server.py:266-276).  The reference's
    # pluggable ``opt_fn`` (run_sequential.py:19) with torch.optim.SGD is the
    # configuration that does learn; both sides run plain SGD here
    # (probe: rebuild noisy reward 21 -> 83+ and climbing at epoch 100).
    "cartpole_sgd": dict(obs=4, act=2, discrete=True, epochs=120, batch=128,
                         lr=2.0, sigma=0.1, zeta=32, history=16,
                         eval_prob=0.1, opt="sgd"),
    # pixel families (round 4): the reference's torch AtariPolicy
    # (policies/atari.py:7-51) and ImpalaPolicy (policies/impala.py:8-186)
    # through the identical run_sequential.py loop.  Both train on 1-level
    # ProcMaze — the procgen branch's env family (init_helper.py:9-12) and
    # the env where this config DEMONSTRABLY LEARNS (probe: rebuild eval
    # EMA ~11.7 of ~12.5 optimal in 40 epochs — the band measures matched
    # learning, not a matched stall).  AtariPolicy hardcodes 4 stacked
    # input channels and an 84x84 Linear(2592) (atari.py:10,45), so its
    # env renders at scale 21 (84px) with the channel axis zero-padded
    # 3->4 (an unused stacked-frame slot).  IMPALA runs with its LSTM, as
    # the reference _build_model hardcodes (impala.py:33).
    "atari": dict(kind="atari", act=5, discrete=True, epochs=40, batch=32,
                  lr=0.03, sigma=0.1, zeta=8, history=8, eval_prob=0.1),
    "impala": dict(kind="impala", act=5, discrete=True, epochs=40, batch=32,
                   lr=0.03, sigma=0.1, zeta=8, history=8, eval_prob=0.1),
}

TAIL = 0.25  # summary window: last 25% of epochs


def make_host_env(name, seed):
    from dfd_tpu.runners import HostEnv

    return HostEnv(make_jax_env(name), seed=seed)


def make_jax_env(name):
    from dfd_tpu.envs import (
        CartPoleEnv, PadChannelsEnv, PendulumEnv, ProcMazeEnv, TrapEnv,
    )

    if name == "atari":
        # 4x21 = 84px ProcMaze, channel axis zero-padded 3 -> 4: the
        # (4, 84, 84) pre-scaled 0-1 input AtariPolicy hardcodes
        return PadChannelsEnv(
            ProcMazeEnv(num_levels=1, grid=4, scale=21, max_steps=14, intensity=1.0),
            to_channels=4,
        )
    if name == "impala":
        return ProcMazeEnv(num_levels=1, grid=4, scale=16, max_steps=14)
    return {"trap": TrapEnv, "cartpole": CartPoleEnv,
            "cartpole_sgd": CartPoleEnv, "pendulum": PendulumEnv}[name]()


def _ref_atari_policy_cls(ref):
    """Reference AtariPolicy with its latent obs-marshalling bug fixed.

    ``Policy.forward`` reshapes non-tensor input with
    ``view(-1, self.input_shape)`` (policy.py:26-28) — valid only when
    input_shape is an int, but AtariPolicy sets it to a TUPLE
    (atari.py:10-11), so any numpy observation (what Agent passes,
    agent.py:43) raises TypeError.  The subclass unpacks the tuple —
    ``view(-1, *input_shape)`` — changing nothing about the model, init, or
    math; every weight and forward op is the reference's own."""
    import torch

    class _RefAtariPolicy(ref.AtariPolicy):
        def forward(self, x):
            if type(x) is not torch.Tensor:
                x = torch.as_tensor(np.asarray(x), dtype=torch.float32)
            return self.model(x.view((-1,) + tuple(self.input_shape)))

    return _RefAtariPolicy


class _RefImpalaEnv:
    """The reference ImpalaEnvWrapper's obs format
    (utils/impala_env_wrapper.py:13-28) over a host env: dict observations
    of torch tensors — frame (1, 1, C, H, W) float32, previous transition's
    reward/done as (1, 1) tensors."""

    def __init__(self, host_env):
        self._env = host_env

    def reset(self):
        return self._format(self._env.reset(), 0, False)

    def step(self, action):
        obs, rew, done, etc = self._env.step(action)
        return self._format(obs, rew, done), rew, done, etc

    def _format(self, obs, rew, done):
        import torch

        obs = np.asarray(obs)
        return {
            "frame": torch.as_tensor(obs, dtype=torch.float32).view(1, 1, *obs.shape),
            "reward": torch.as_tensor(rew, dtype=torch.float32).view(1, 1),
            "done": torch.as_tensor(1 if done else 0, dtype=torch.bool).view(1, 1),
        }


class ReferenceLoop:
    """run_sequential.py's training loop over the reference's components
    (the generalized form of tests/test_sequential_parity.py::_OracleLoop),
    on an arbitrary host env."""

    def __init__(self, name, spec, seed):
        import torch

        from dfd_tpu.core.noise import RNGNoiseSource
        from tests._reference import load_reference

        ref = load_reference()
        torch.manual_seed(seed)
        self.spec = spec
        kind = spec.get("kind", "mlp")
        if kind == "atari":
            cls = _ref_atari_policy_cls(ref)
            self.policy = cls((84, 84), spec["act"], seed=seed)
            distance_fn = ref.math_helpers.categorical_tvd
            self.env = make_host_env(name, seed)
        elif kind == "impala":
            self.policy = ref.ImpalaPolicy((64, 64, 3), spec["act"], seed=seed)
            distance_fn = ref.math_helpers.categorical_tvd
            self.env = _RefImpalaEnv(make_host_env(name, seed))
        elif spec["discrete"]:
            self.policy = ref.DiscretePolicy(spec["obs"], spec["act"], seed=seed)
            distance_fn = ref.math_helpers.categorical_tvd
            self.env = make_host_env(name, seed)
        else:
            self.policy = ref.MujocoPolicy(spec["obs"], spec["act"], seed=seed)
            distance_fn = ref.math_helpers.gaussian_wasserstein_dist_from_strategies
            self.env = make_host_env(name, seed)
        self.rng = np.random.RandomState(seed)
        self.buffer_rng = np.random.RandomState(seed)

        # run_sequential.py's constructor defaults (run_sequential.py:18-42)
        self.omega = ref.AdaptiveOmega(
            default_value=0, improvement_threshold=1.035, reward_history_size=20,
            min_value=0, max_value=1, steps_to_min=25, steps_to_max=75,
        )
        if spec.get("opt") == "sgd":
            # the reference's pluggable opt_fn (run_sequential.py:19, :86):
            # any torch optimizer; FiniteDifferences only special-cases DSGD
            # for adjust_lr (finite_differences.py:22, :51-52)
            opt = torch.optim.SGD(self.policy.parameters(), lr=spec["lr"])
        else:
            opt = ref.DSGD(self.policy.parameters(), lr=spec["lr"])
        noise = RNGNoiseSource(self.policy.num_params, random_seed=seed)
        self.handler = ref.StrategyHandler(
            self.policy, distance_fn, max_history_size=spec["history"]
        )
        self.agent = ref.Agent(self.policy, self.env, seed, normalize_obs=False)
        self.worker = ref.Worker(
            self.policy, self.agent, noise, self.handler,
            sigma=spec["sigma"], random_seed=seed, eval_prob=spec["eval_prob"],
        )
        self.learner = ref.FiniteDifferences(
            self.policy, opt, self.omega, noise,
            noise_std=spec["sigma"], batch_size=spec["batch"],
            ent_coef=0.0, max_delayed_return=10,
        )
        self.policy_reward = 0.0
        self.policy_entropy = 0.0
        self.policy_novelty = 0.0
        self.zeta = self._seed_zeta(spec["zeta"])
        self.history = []

    def _random_action(self):
        if self.spec["discrete"]:
            return int(self.buffer_rng.randint(self.spec["act"]))
        return self.buffer_rng.uniform(-1, 1, self.spec["act"]).astype(np.float32)

    def _seed_zeta(self, n):
        zeta = []
        obs = self.env.reset()
        for _ in range(n):
            zeta.append(obs)
            obs, _, done, _ = self.env.step(self._random_action())
            if done:
                obs = self.env.reset()
        if isinstance(zeta[0], dict):
            # IMPALA's dict observations: zeta is an object array so shuffle/
            # slot-replacement semantics match the ndarray path
            arr = np.empty(n, dtype=object)
            for i, o in enumerate(zeta):
                arr[i] = o
            return arr
        return np.asarray(zeta, np.float32)

    def train(self, n_epochs):
        zeta = self.zeta
        idxs = list(range(len(zeta)))
        self.handler.add_policy(self.policy)
        self.worker.epoch = 0
        for _ in range(n_epochs):
            rets, ret_rewards = [], []
            any_eval = False
            while len(rets) < self.spec["batch"]:
                for ret in self.worker.collect_returns():
                    if ret.is_eval:
                        any_eval = True
                        self.policy_reward = self.policy_reward * 0.9 + ret.reward * 0.1
                        self.policy_entropy = self.policy_entropy * 0.9 + ret.entropy * 0.1
                        self.policy_novelty = self.policy_novelty * 0.9 + ret.novelty * 0.1
                        self.rng.shuffle(idxs)
                        k = min(len(ret.eval_states), len(zeta))
                        if zeta.dtype == object:  # dict obs (IMPALA)
                            for j in range(k):
                                zeta[idxs[j]] = ret.eval_states[j]
                        else:
                            zeta[idxs[:k]] = np.asarray(ret.eval_states, np.float32)[: len(zeta)][:k]
                    else:
                        rets.append(ret)
                        ret_rewards.append(ret.reward)
            if any_eval:
                self.handler.set_zeta(zeta)
                self.omega.step(np.mean(ret_rewards))
            self.learner.step(rets, self.policy_reward, self.policy_novelty, self.policy_entropy)
            self.handler.add_policy(self.policy)
            self.worker.epoch = self.learner.epoch
            self.history.append({
                "Epoch": self.learner.epoch,
                "Noisy Reward": float(np.mean(ret_rewards)),
                "Policy Reward": float(self.policy_reward),
                "Cumulative Timesteps": int(self.agent.cumulative_timesteps),
            })


def run_reference(name, spec, seed):
    loop = ReferenceLoop(name, spec, seed)
    loop.train(spec["epochs"])
    path = os.path.join(OUT, f"ref_{name}_s{seed}.jsonl")
    with open(path, "w") as f:
        for row in loop.history:
            f.write(json.dumps(row) + "\n")
    return loop.history


def run_rebuild(name, spec, seed):
    from dfd_tpu.config import TrainConfig
    from dfd_tpu.models import DiscreteMLP, GaussianMLP
    from dfd_tpu.models.atari import AtariCNN
    from dfd_tpu.models.impala import ImpalaPolicy
    from dfd_tpu.ops import distances
    from dfd_tpu.runners import VectorizedTrainer
    from dfd_tpu.utils.metrics import EpochReporter

    env = make_jax_env(name)
    kind = spec.get("kind", "mlp")
    if kind == "atari":
        model = AtariCNN((84, 84), spec["act"], in_channels=4)
        distance_fn = distances.categorical_tvd
    elif kind == "impala":
        model = ImpalaPolicy(env.obs_shape, spec["act"], use_lstm=True)
        distance_fn = distances.categorical_tvd
    elif spec["discrete"]:
        model = DiscreteMLP(spec["obs"], spec["act"])
        distance_fn = distances.categorical_tvd
    else:
        model = GaussianMLP(spec["obs"], spec["act"])
        distance_fn = distances.gaussian_wasserstein_from_strategies
    cfg = TrainConfig(
        batch_size=spec["batch"], learning_rate=spec["lr"], noise_std=spec["sigma"],
        zeta_size=spec["zeta"], max_strategy_history_size=spec["history"],
        random_seed=seed, optimizer=spec.get("opt", "dsgd"),
    )
    rep = EpochReporter(quiet=True)
    tr = VectorizedTrainer(model, env, distance_fn, cfg, reporter=rep)
    tr.train(spec["epochs"])
    rep.dump_jsonl(os.path.join(OUT, f"ours_{name}_s{seed}.jsonl"))
    return rep.history


def tail_mean(history, key="Noisy Reward"):
    n = max(int(len(history) * TAIL), 1)
    return float(np.mean([row[key] for row in history[-n:]]))


def main():
    argv = sys.argv[1:]
    n_seeds = 3
    if "--seeds" in argv:
        i = argv.index("--seeds")
        n_seeds = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    names = [a for a in argv if not a.startswith("--")] or list(FAMILIES)
    band_path = os.path.join(OUT, "ref_band.json")
    bands = {}
    if os.path.exists(band_path):
        bands = json.load(open(band_path))

    for name in names:
        spec = FAMILIES[name]
        ref_tails, our_tails = [], []
        for seed in range(n_seeds):
            t0 = time.time()
            ref_hist = run_reference(name, spec, seed)
            t_ref = time.time() - t0
            t0 = time.time()
            our_hist = run_rebuild(name, spec, seed)
            t_our = time.time() - t0
            ref_tails.append(tail_mean(ref_hist))
            our_tails.append(tail_mean(our_hist))
            print(json.dumps({
                "env": name, "seed": seed,
                "ref_tail": round(ref_tails[-1], 2), "ours_tail": round(our_tails[-1], 2),
                "ref_wall_s": round(t_ref, 1), "ours_wall_s": round(t_our, 1),
            }), flush=True)

        mu_r, sd_r = float(np.mean(ref_tails)), float(np.std(ref_tails))
        mu_o, sd_o = float(np.mean(our_tails)), float(np.std(our_tails))
        # within-seed-variance criterion: the rebuild's mean tail reward must
        # reach at least the bottom of the reference's 2-sigma seed band
        # (doing BETTER than the reference is a pass, not a deviation)
        passed = mu_o >= mu_r - 2 * max(sd_r, 1e-9)
        summary = {
            "env": name, "seeds": n_seeds, "epochs": spec["epochs"],
            "batch": spec["batch"], "lr": spec["lr"], "sigma": spec["sigma"],
            "ref_tail_mean": round(mu_r, 2), "ref_tail_std": round(sd_r, 2),
            "ours_tail_mean": round(mu_o, 2), "ours_tail_std": round(sd_o, 2),
            "ref_tails": [round(x, 2) for x in ref_tails],
            "ours_tails": [round(x, 2) for x in our_tails],
            "pass": bool(passed),
        }
        bands[name] = summary
        with open(band_path, "w") as f:
            json.dump(bands, f, indent=1)
        print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
