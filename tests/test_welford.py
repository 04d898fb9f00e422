"""Welford statistics: parity vs the reference WelfordRunningStat and
consistency of the jittable functional form."""

import numpy as np
import pytest

from dfd_tpu.core import welford
from tests._reference import load_reference, reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")


def _random_obs(rng, n, shape):
    return [rng.standard_normal(shape) for _ in range(n)]


def test_update_matches_reference():
    ref = load_reference()
    rng = np.random.default_rng(0)
    shape = (5,)
    theirs = ref.math_helpers.WelfordRunningStat(shape)
    ours = welford.Welford(shape)
    for x in _random_obs(rng, 40, shape):
        theirs.update(x)
        ours.update(x)
    np.testing.assert_array_equal(ours.running_mean, theirs.running_mean)
    np.testing.assert_array_equal(ours.running_variance, theirs.running_variance)
    np.testing.assert_array_equal(ours.mean, theirs.mean)
    np.testing.assert_array_equal(ours.std, theirs.std)
    assert ours.count == theirs.count


def test_count_guards_match_reference():
    ref = load_reference()
    shape = (3,)
    theirs = ref.math_helpers.WelfordRunningStat(shape)
    ours = welford.Welford(shape)
    # count < 2: mean is zeros, std is ones
    np.testing.assert_array_equal(ours.mean, theirs.mean)
    np.testing.assert_array_equal(ours.std, theirs.std)
    theirs.update(np.ones(shape))
    ours.update(np.ones(shape))
    np.testing.assert_array_equal(ours.mean, theirs.mean)
    np.testing.assert_array_equal(ours.std, theirs.std)
    # zero-variance feature -> std 1
    theirs.update(np.ones(shape))
    ours.update(np.ones(shape))
    np.testing.assert_array_equal(ours.std, np.ones(shape))
    np.testing.assert_array_equal(ours.std, theirs.std)


def test_serialized_merge_matches_reference():
    ref = load_reference()
    rng = np.random.default_rng(1)
    shape = (4,)
    their_global = ref.math_helpers.WelfordRunningStat(shape)
    our_global = welford.Welford(shape)
    for worker in range(3):
        their_local = ref.math_helpers.WelfordRunningStat(shape)
        our_local = welford.Welford(shape)
        for x in _random_obs(rng, 7 + worker, shape):
            their_local.update(x)
            our_local.update(x)
        their_global.increment_from_obs_stats_update(their_local.serialize())
        our_global.merge_serialized(our_local.serialize())
    np.testing.assert_allclose(our_global.running_mean, their_global.running_mean, rtol=0, atol=0)
    np.testing.assert_allclose(our_global.running_variance, their_global.running_variance, rtol=0, atol=0)
    assert our_global.count == their_global.count
    # cross-compat: our serialized update folds into their accumulator
    their_global.increment_from_obs_stats_update(our_global.serialize())


def test_empty_merge_is_noop():
    ours = welford.Welford((2,))
    ours.update(np.array([1.0, 2.0]))
    before = ours.serialize()
    ours.merge_serialized(welford.Welford((2,)).serialize())
    assert ours.serialize() == before


def test_serialize_roundtrip():
    rng = np.random.default_rng(2)
    a = welford.Welford((3,))
    for x in _random_obs(rng, 9, (3,)):
        a.update(x)
    b = welford.Welford((3,))
    b.deserialize(a.serialize())
    np.testing.assert_array_equal(a.mean, b.mean)
    np.testing.assert_array_equal(a.std, b.std)
    assert a.count == b.count


def test_jnp_form_agrees_with_host_form():
    import jax

    rng = np.random.default_rng(3)
    shape = (6,)
    xs = rng.standard_normal((50,) + shape).astype(np.float32)
    mask = (rng.uniform(size=50) < 0.6).astype(np.float32)

    host = welford.Welford(shape)
    for x, m in zip(xs, mask):
        if m:
            host.update(x)

    state = welford.jnp_init(shape)
    state = jax.jit(welford.jnp_update_batch)(state, xs, mask)
    mean, std = welford.jnp_mean_std(state)
    np.testing.assert_allclose(np.asarray(mean), host.mean, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(std), host.std, rtol=1e-5, atol=1e-6)
    assert int(state.count) == host.count


def test_jnp_population_merge():
    import jax

    rng = np.random.default_rng(4)
    shape = (3,)
    pop = 8
    xs = rng.standard_normal((pop, 20) + shape).astype(np.float32)

    host = welford.Welford(shape)
    states = []
    for p in range(pop):
        local = welford.jnp_init(shape)
        local = welford.jnp_update_batch(local, xs[p], np.ones(20, np.float32))
        states.append(local)
        for x in xs[p]:
            host.update(x)
    stacked = jax.tree.map(lambda *a: np.stack(a), *states)
    merged = welford.jnp_merge_population(welford.WelfordState(*stacked))
    mean, std = welford.jnp_mean_std(merged)
    np.testing.assert_allclose(np.asarray(mean), host.mean, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(std), host.std, rtol=1e-4, atol=1e-5)
