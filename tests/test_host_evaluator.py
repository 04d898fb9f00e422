"""Batched host-env population evaluator: lockstep host stepping with
device-batched perturbed forwards, cross-checked against the vectorized
on-device rollout for the same (epoch, member) noise."""

import jax
import numpy as np
import pytest

from dfd_tpu.core.noise import CounterNoise
from dfd_tpu.envs.native_pool import NativeTrapPool, native_pool_available
from dfd_tpu.models import DiscreteMLP
from dfd_tpu.runners.host_evaluator import BatchedHostEvaluator

pytestmark = pytest.mark.skipif(not native_pool_available(), reason="native pool not built")


def test_evaluate_population_returns():
    model = DiscreteMLP(2, 9)
    params, state = model.init(0)
    flat = model.get_flat(params)
    noise = CounterNoise(model.num_params, random_seed=1)
    pool = NativeTrapPool(6)
    ev = BatchedHostEvaluator(model, pool, noise, sigma=0.05)

    rets = ev.evaluate_population(flat, state, epoch=2, horizon=201, key=jax.random.key(0))
    assert len(rets) == 6
    for i, r in enumerate(rets):
        assert r.encoded_noise == f"2,{i}"
        assert r.timesteps == 201
        assert np.isfinite(r.reward) and np.isfinite(r.entropy)
    # members see different perturbations -> returns generally differ
    assert len({r.reward for r in rets}) > 1


def test_host_evaluator_feeds_fd_learner():
    """End-to-end: host-evaluated returns drive the host FD learner using the
    counter-noise decode path (the fat-client workflow)."""
    from dfd_tpu.fd import AdaptiveOmega, DSGD, FDLearner

    model = DiscreteMLP(2, 9)
    params, state = model.init(3)
    flat = model.get_flat(params)
    noise = CounterNoise(model.num_params, random_seed=3)
    pool = NativeTrapPool(8)
    ev = BatchedHostEvaluator(model, pool, noise, sigma=0.05)

    learner = FDLearner(flat, DSGD(model.num_params, lr=0.05), AdaptiveOmega(), noise,
                        noise_std=0.05, max_delayed_return=5)
    key = jax.random.key(1)
    rewards = []
    for _ in range(4):
        key, sub = jax.random.split(key)
        rets = ev.evaluate_population(learner.flat, state, epoch=learner.epoch,
                                      horizon=201, key=sub)
        rewards.append(np.mean([r.reward for r in rets]))
        upd = learner.step(rets, float(np.mean(rewards)), 0.0, 0.0)
        assert upd > 0
    assert learner.epoch == 4
