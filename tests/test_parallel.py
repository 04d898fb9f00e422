"""Mesh/collective layer on 8 virtual devices."""

import jax
import jax.numpy as jnp
import numpy as np

from dfd_tpu.core.noise import CounterNoise
from dfd_tpu.fd.combine import combine_gradient
from dfd_tpu.parallel import make_pop_mesh, pop_sharding, shard_map_combine


def test_mesh_and_sharding():
    mesh = make_pop_mesh()
    assert mesh.devices.size == 8
    s = pop_sharding(mesh, ndim=2)
    x = jax.device_put(jnp.zeros((16, 4)), s)
    assert len(x.sharding.device_set) == 8


def test_shard_map_combine_matches_dense():
    mesh = make_pop_mesh()
    noise = CounterNoise(96, random_seed=0)
    P_ = 16
    ids = jnp.arange(P_)
    fitness = jnp.asarray(np.random.default_rng(0).standard_normal(P_), jnp.float32)
    sigma = 0.05

    dense_eps = noise.generate_block(3, ids)
    expect = combine_gradient(dense_eps, fitness, sigma)
    got = shard_map_combine(noise, mesh, 3, ids, fitness, sigma)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-5, atol=1e-7)


def test_shard_map_combine_under_jit():
    mesh = make_pop_mesh()
    noise = CounterNoise(64, random_seed=1)
    ids = jnp.arange(8)
    fitness = jnp.ones(8, jnp.float32)

    fn = jax.jit(lambda e, f: shard_map_combine(noise, mesh, e, ids, f, 0.1))
    g = fn(0, fitness)
    assert np.isfinite(np.asarray(g)).all()
    # epoch changes the noise, so the gradient changes
    g2 = fn(1, fitness)
    assert not np.allclose(np.asarray(g), np.asarray(g2))
