"""Sweep, profiling, metrics utilities; trainer VBN / multi-episode options."""

import numpy as np

from dfd_tpu.utils.metrics import EpochReporter
from dfd_tpu.utils.profiling import StageTimer
from dfd_tpu.utils.sweep import DEFAULT_SPACE, random_search


def test_random_search_finds_best():
    def run_trial(params):
        # score is maximized at the largest lr in the space
        return [{"Policy Reward": params["learning_rate"] * 100}]

    result = random_search(run_trial, n_trials=30, seed=0)
    assert result.best.params["learning_rate"] == max(DEFAULT_SPACE["learning_rate"])
    assert result.best.score == max(DEFAULT_SPACE["learning_rate"]) * 100
    assert len(result.trials) == 30


def test_random_search_minimize():
    def run_trial(params):
        return [{"Loss": params["batch_size"]}]

    result = random_search(run_trial, n_trials=20, metric="Loss", maximize=False, seed=1)
    assert result.best.params["batch_size"] == min(DEFAULT_SPACE["batch_size"])


def test_stage_timer():
    t = StageTimer()
    with t.stage("rollout"):
        pass
    with t.stage("combine"):
        pass
    with t.stage("rollout"):
        pass
    rep = t.report()
    assert set(rep) == {"_stage/rollout", "_stage/combine"}
    assert rep["_stage/rollout"] >= 0
    assert t.report() == {}  # reset


def test_reporter_jsonl(tmp_path):
    rep = EpochReporter(quiet=True)
    rep.report({"Epoch": 1, "Policy Reward": 2.0})
    rep.report({"Epoch": 2, "Policy Reward": 3.0, "_hidden": 1})
    path = str(tmp_path / "log.jsonl")
    rep.dump_jsonl(path)
    import json

    rows = [json.loads(line) for line in open(path)]
    assert rows[1]["Epoch"] == 2 and rows[1]["_hidden"] == 1


def test_trainer_vbn_and_multi_episode():
    from dfd_tpu.config import TrainConfig
    from dfd_tpu.envs.trap import TrapEnv
    from dfd_tpu.models import DiscreteMLP
    from dfd_tpu.ops import distances
    from dfd_tpu.runners import VectorizedTrainer

    cfg = TrainConfig(
        batch_size=4, zeta_size=8, max_strategy_history_size=4,
        vbn_buffer_size=16, envs_per_perturbation=2, episode_length=30,
        random_seed=1,
    )
    tr = VectorizedTrainer(
        DiscreteMLP(2, 9), TrapEnv(), distances.categorical_tvd, cfg,
        reporter=EpochReporter(quiet=True),
    )
    bn_before = np.asarray(tr.state.bn_state["bn1"]["mean"]).copy()
    tr.train(2)
    bn_after = np.asarray(tr.state.bn_state["bn1"]["mean"])
    assert not np.allclose(bn_before, bn_after)  # VBN refreshed running stats
    # E=2 episodes per member per epoch (+1 eval): steps reflect both
    assert tr.cumulative_timesteps >= 2 * (4 * 2 * 30)


def test_make_reporter_degrades_without_wandb():
    from dfd_tpu.utils.metrics import make_reporter

    rep = make_reporter(wandb_project=None, quiet=True)
    rep.report({"Epoch": 1})
    assert rep.wandb_run is None and len(rep.history) == 1
    # with a project name but no wandb installed: still degrades cleanly
    rep2 = make_reporter(wandb_project="nonexistent-project", quiet=True)
    rep2.report({"Epoch": 1})
    assert len(rep2.history) == 1


def test_profiler_trace_writes(tmp_path):
    import jax.numpy as jnp

    from dfd_tpu.utils.profiling import trace

    with trace(str(tmp_path)):
        (jnp.ones(16) * 2).block_until_ready()
    import os

    assert any("plugins" in d or "trace" in str(f).lower()
               for d, _, fs in os.walk(tmp_path) for f in fs) or os.listdir(tmp_path)


def test_wandb_sweep_delegates_to_agent():
    """The wandb-native sweep entry (reference run_server.py:245-281):
    builds the reference-shaped sweep config, registers it, and runs the
    agent whose trial function constructs a runner from run.config —
    validated against a fake wandb module (the real one needs a network)."""
    import types

    from dfd_tpu.utils.sweep import REFERENCE_SWEEP_CONFIG, wandb_sweep

    assert REFERENCE_SWEEP_CONFIG["method"] == "random"
    assert REFERENCE_SWEEP_CONFIG["metric"]["name"] == "Policy Reward"
    assert set(REFERENCE_SWEEP_CONFIG["parameters"]) == {
        "learning_rate", "noise_std", "batch_size"}

    calls = {}
    fake = types.SimpleNamespace()
    fake.sweep = lambda sweep, project: calls.setdefault("sweep_id", "sw123")
    fake.init = lambda project: types.SimpleNamespace(
        config={"learning_rate": 0.05, "noise_std": 0.01, "batch_size": 25},
        log=lambda d: None,
    )

    def agent(sweep_id, function, count, project):
        calls["agent"] = (sweep_id, count, project)
        for _ in range(3):  # the agent drives `count` trials; emulate a few
            function()

    fake.agent = agent

    trained = []

    def factory(wandb_run=None, **params):
        assert params == {"learning_rate": 0.05, "noise_std": 0.01, "batch_size": 25}

        class R:
            def train(self, n):
                trained.append((n, params))

        return R()

    sid = wandb_sweep(factory, count=7, train_epochs=4, _wandb=fake, project="p")
    assert sid == "sw123"
    assert calls["agent"] == ("sw123", 7, "p")
    assert trained == [(4, {"learning_rate": 0.05, "noise_std": 0.01, "batch_size": 25})] * 3


def test_wandb_sweep_raises_cleanly_without_wandb():
    import pytest

    from dfd_tpu.utils.sweep import wandb_sweep

    with pytest.raises(RuntimeError, match="wandb is not installed"):
        wandb_sweep(lambda **kw: None)
