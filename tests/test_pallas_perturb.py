"""Pallas perturbation kernels: determinism, stats, combine math, and the
trainer's pallas noise backend (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dfd_tpu.ops.perturb import pallas_combine, pallas_perturb


def test_perturb_deterministic_and_distinct():
    flat = jnp.zeros(300)
    a, ssq = pallas_perturb(flat, 1.0, 7, 2, P=4, chunk=256)
    b, _ = pallas_perturb(flat, 1.0, 7, 2, P=4, chunk=256)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c, _ = pallas_perturb(flat, 1.0, 7, 3, P=4, chunk=256)
    assert not np.allclose(a, c)
    assert not np.allclose(np.asarray(a)[0], np.asarray(a)[1])
    np.testing.assert_allclose(np.asarray(ssq), (np.asarray(a) ** 2).sum(1), rtol=1e-3)


def test_noise_is_standard_normal():
    pert, _ = pallas_perturb(jnp.zeros(200_000), 1.0, 1, 0, P=1)
    v = np.asarray(pert[0])
    assert abs(v.mean()) < 0.01
    assert abs(v.std() - 1.0) < 0.01
    # tails exist and are sane
    assert (np.abs(v) > 3).mean() < 0.01
    assert (np.abs(v) > 3).mean() > 0.0001


def test_combine_matches_dense_formula():
    sigma = 0.1
    d, P = 777, 6
    flat = jnp.asarray(np.random.RandomState(0).randn(d), jnp.float32)
    pert, ssq = pallas_perturb(flat, sigma, 3, 5, P=P, chunk=256)
    eps = (np.asarray(pert) - np.asarray(flat)[None]) / sigma
    fitness = np.random.RandomState(1).randn(P).astype(np.float32)
    coefs = fitness / (sigma * np.asarray(ssq))
    g = np.asarray(pallas_combine(coefs, 3, 5, d, chunk=256))
    expect = sum(
        fitness[i] * (sigma * eps[i]) / np.linalg.norm(sigma * eps[i]) ** 2 for i in range(P)
    )
    np.testing.assert_allclose(g, expect, rtol=1e-3, atol=1e-5)


def test_padding_lanes_are_masked():
    d = 100  # far from the chunk multiple
    pert, ssq = pallas_perturb(jnp.zeros(d), 1.0, 1, 1, P=2, chunk=256)
    assert pert.shape == (2, d)
    # sumsq only counts real lanes: ~chi2(100) mean
    assert 50 < float(np.asarray(ssq)[0]) < 180


def test_trainer_pallas_backend_learns():
    from dfd_tpu.config import TrainConfig
    from dfd_tpu.envs.trap import TrapEnv
    from dfd_tpu.models import DiscreteMLP
    from dfd_tpu.ops import distances
    from dfd_tpu.runners import VectorizedTrainer
    from dfd_tpu.utils.metrics import EpochReporter

    cfg = TrainConfig(
        batch_size=16, learning_rate=0.05, noise_std=0.05, zeta_size=16,
        max_strategy_history_size=8, random_seed=5, noise_backend="pallas",
    )
    tr = VectorizedTrainer(
        DiscreteMLP(2, 9), TrapEnv(), distances.categorical_tvd, cfg,
        reporter=EpochReporter(quiet=True),
    )
    tr.train(12)
    h = tr.reporter.history
    first = np.mean([r["Noisy Reward"] for r in h[:3]])
    last = np.mean([r["Noisy Reward"] for r in h[-3:]])
    assert last > first, (first, last)
