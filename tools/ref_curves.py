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
}

TAIL = 0.25  # summary window: last 25% of epochs


def make_host_env(name, seed):
    from dfd_tpu.runners import HostEnv

    return HostEnv(make_jax_env(name), seed=seed)


def make_jax_env(name):
    from dfd_tpu.envs import CartPoleEnv, PendulumEnv, TrapEnv

    return {"trap": TrapEnv, "cartpole": CartPoleEnv, "pendulum": PendulumEnv}[name]()


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
        if spec["discrete"]:
            self.policy = ref.DiscretePolicy(spec["obs"], spec["act"], seed=seed)
            distance_fn = ref.math_helpers.categorical_tvd
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
    from dfd_tpu.ops import distances
    from dfd_tpu.runners import VectorizedTrainer
    from dfd_tpu.utils.metrics import EpochReporter

    env = make_jax_env(name)
    if spec["discrete"]:
        model = DiscreteMLP(spec["obs"], spec["act"])
        distance_fn = distances.categorical_tvd
    else:
        model = GaussianMLP(spec["obs"], spec["act"])
        distance_fn = distances.gaussian_wasserstein_from_strategies
    cfg = TrainConfig(
        batch_size=spec["batch"], learning_rate=spec["lr"], noise_std=spec["sigma"],
        zeta_size=spec["zeta"], max_strategy_history_size=spec["history"],
        random_seed=seed,
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
