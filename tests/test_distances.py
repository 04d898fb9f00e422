"""Distance functions and standardize/affine: parity vs reference math_helpers."""

import numpy as np
import pytest

from dfd_tpu.ops import distances
from dfd_tpu.ops.standardize import affine_transform, standardize as std_standardize
from tests._reference import load_reference, reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")


def _probs(rng, shape):
    x = rng.uniform(0.01, 1.0, size=shape)
    return x / x.sum(axis=-1, keepdims=True)


def test_l2_dist():
    ref = load_reference()
    rng = np.random.default_rng(0)
    a = rng.standard_normal((6, 4))       # one strategy: [Z, F]
    b = rng.standard_normal((10, 6, 4))   # archive: [H, Z, F]
    np.testing.assert_allclose(distances.l2_dist(a, b), ref.math_helpers.l2_dist(a, b))


def test_categorical_tvd():
    ref = load_reference()
    rng = np.random.default_rng(1)
    p = _probs(rng, (6, 5))
    q = _probs(rng, (8, 6, 5))
    np.testing.assert_allclose(distances.categorical_tvd(p, q), ref.math_helpers.categorical_tvd(p, q))


def test_categorical_bhattacharyya():
    ref = load_reference()
    rng = np.random.default_rng(2)
    p = _probs(rng, (6, 5))
    q = _probs(rng, (8, 6, 5))
    np.testing.assert_allclose(
        distances.categorical_bhattacharyya(p, q),
        ref.math_helpers.categorical_bhattacharrya_dist(p, q),
    )


def test_gaussian_bhattacharyya():
    ref = load_reference()
    rng = np.random.default_rng(3)
    a = np.concatenate([rng.standard_normal((6, 3)), rng.uniform(0.1, 1.0, (6, 3))], axis=-1)
    b = np.concatenate([rng.standard_normal((8, 6, 3)), rng.uniform(0.1, 1.0, (8, 6, 3))], axis=-1)
    np.testing.assert_allclose(
        distances.gaussian_bhattacharyya(a, b),
        ref.math_helpers.gaussian_bhattacharrya_dist(a, b),
    )


def test_gaussian_wasserstein():
    ref = load_reference()
    rng = np.random.default_rng(4)
    a = np.concatenate([rng.standard_normal((6, 3)), rng.uniform(0.1, 1.0, (6, 3))], axis=-1)
    b = np.concatenate([rng.standard_normal((8, 6, 3)), rng.uniform(0.1, 1.0, (8, 6, 3))], axis=-1)
    np.testing.assert_allclose(
        distances.gaussian_wasserstein_from_strategies(a, b),
        ref.math_helpers.gaussian_wasserstein_dist_from_strategies(a, b),
    )


def test_strategy_novelty():
    ref = load_reference()
    rng = np.random.default_rng(5)
    s = _probs(rng, (6, 5))
    archive = _probs(rng, (12, 6, 5))
    ours = distances.strategy_novelty(s, archive, distance_fn=distances.categorical_tvd)
    theirs = ref.math_helpers.compute_strategy_novelty(
        s, archive, distance_fn=ref.math_helpers.categorical_tvd
    )
    assert ours == theirs
    ours_min, ours_all = distances.strategy_novelty(
        s, archive, distance_fn=distances.categorical_tvd, return_all=True
    )
    theirs_min, theirs_all = ref.math_helpers.compute_strategy_novelty(
        s, archive, return_all_dists=True, distance_fn=ref.math_helpers.categorical_tvd
    )
    assert ours_min == theirs_min
    np.testing.assert_allclose(ours_all, theirs_all)


def test_strategy_distance():
    ref = load_reference()
    rng = np.random.default_rng(6)
    a = _probs(rng, (6, 5))
    b = _probs(rng, (6, 5))
    assert distances.strategy_distance(a, b, distance_fn=distances.categorical_tvd) == (
        ref.math_helpers.compute_strategy_distance(a, b, distance_fn=ref.math_helpers.categorical_tvd)
    )


def test_jnp_variants_agree():
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    p = _probs(rng, (6, 5)).astype(np.float32)
    q = _probs(rng, (8, 6, 5)).astype(np.float32)
    host = distances.categorical_tvd(p, q)
    dev = distances.categorical_tvd(jnp.asarray(p), jnp.asarray(q), xp=jnp)
    np.testing.assert_allclose(np.asarray(dev), host, rtol=1e-5)

    a = np.concatenate([rng.standard_normal((6, 3)), rng.uniform(0.1, 1.0, (6, 3))], axis=-1).astype(np.float32)
    b = np.concatenate([rng.standard_normal((8, 6, 3)), rng.uniform(0.1, 1.0, (8, 6, 3))], axis=-1).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(distances.gaussian_wasserstein_from_strategies(jnp.asarray(a), jnp.asarray(b), xp=jnp)),
        distances.gaussian_wasserstein_from_strategies(a, b),
        rtol=1e-4,
    )


def test_standardize_matches_reference():
    ref = load_reference()
    rng = np.random.default_rng(8)
    x = rng.standard_normal(37)
    np.testing.assert_array_equal(std_standardize(x), ref.math_helpers.standardize_arr(x))
    # zero-std passthrough
    c = np.full(5, 3.3)
    np.testing.assert_array_equal(std_standardize(c), ref.math_helpers.standardize_arr(c))


def test_standardize_jnp():
    import jax.numpy as jnp

    x = np.asarray([1.0, 2.0, 3.0, 4.0], np.float32)
    np.testing.assert_allclose(
        np.asarray(std_standardize(jnp.asarray(x), xp=jnp)), std_standardize(x), rtol=1e-6
    )
    c = jnp.full((4,), 2.0)
    np.testing.assert_array_equal(np.asarray(std_standardize(c, xp=jnp)), np.full(4, 2.0))


def test_affine_transform_matches_reference():
    ref = load_reference()
    for args in [(0.5, 0, 1, 0.23, 1.0), (0.2, 0, 1, 1.0, 0.23), (3, 3, 3, 5, 9), (1, 0, 1, 7, 7)]:
        assert affine_transform(*args) == ref.math_helpers.affine_transform(*args)
