"""Flat-view round-trips."""

import numpy as np

from dfd_tpu.core.flat import FlatSpec, flatten, unflatten, update_from_flat


def _spec():
    return FlatSpec.make(
        [
            (("l1", "w"), (4, 3), np.float32),
            (("l1", "b"), (4,), np.float32),
            (("l2", "w"), (2, 4), np.float32),
            (("l2", "b"), (2,), np.float32),
        ]
    )


def _params(rng):
    return {
        "l1": {"w": rng.standard_normal((4, 3)).astype(np.float32), "b": rng.standard_normal(4).astype(np.float32)},
        "l2": {"w": rng.standard_normal((2, 4)).astype(np.float32), "b": rng.standard_normal(2).astype(np.float32)},
    }


def test_roundtrip_numpy():
    spec = _spec()
    rng = np.random.default_rng(0)
    p = _params(rng)
    v = flatten(p, spec, xp=np)
    assert v.shape == (spec.size,) == (4 * 3 + 4 + 2 * 4 + 2,)
    q = unflatten(v, spec, xp=np)
    for path, _, _ in spec.entries:
        a, b = p[path[0]][path[1]], q[path[0]][path[1]]
        np.testing.assert_array_equal(a, b)


def test_ordering_is_spec_order():
    spec = _spec()
    rng = np.random.default_rng(1)
    p = _params(rng)
    v = flatten(p, spec, xp=np)
    np.testing.assert_array_equal(v[:12], p["l1"]["w"].ravel())
    np.testing.assert_array_equal(v[12:16], p["l1"]["b"])


def test_update_from_flat_preserves_unlisted_leaves():
    spec = _spec()
    rng = np.random.default_rng(2)
    p = _params(rng)
    p["bn"] = {"running_mean": np.ones(3, np.float32)}
    v = np.zeros(spec.size, np.float32)
    q = update_from_flat(p, v, spec, xp=np)
    np.testing.assert_array_equal(q["l1"]["w"], np.zeros((4, 3)))
    np.testing.assert_array_equal(q["bn"]["running_mean"], np.ones(3))
    # original untouched
    assert not np.allclose(p["l1"]["w"], 0)


def test_roundtrip_jnp():
    import jax.numpy as jnp

    spec = _spec()
    rng = np.random.default_rng(3)
    p = {
        "l1": {"w": jnp.asarray(rng.standard_normal((4, 3)), jnp.float32), "b": jnp.zeros(4)},
        "l2": {"w": jnp.ones((2, 4)), "b": jnp.zeros(2)},
    }
    v = flatten(p, spec)
    q = unflatten(v, spec)
    np.testing.assert_allclose(np.asarray(q["l1"]["w"]), np.asarray(p["l1"]["w"]))
