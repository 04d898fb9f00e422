"""Native C++ env pool: parity with the JAX trap env and batch semantics."""

import numpy as np
import pytest

from dfd_tpu.envs.native_pool import NativeTrapPool, native_pool_available
from dfd_tpu.envs.trap import TrapEnv

pytestmark = pytest.mark.skipif(not native_pool_available(), reason="native pool not built")


def test_native_matches_jax_env():
    env = TrapEnv()
    pool = NativeTrapPool(3)
    obs0 = pool.reset_all()
    s, jobs = env.reset()
    np.testing.assert_allclose(obs0[0], np.asarray(jobs), atol=1e-6)

    rng = np.random.RandomState(0)
    states = [env.reset()[0] for _ in range(3)]
    for step in range(210):
        actions = rng.randint(0, 9, size=3)
        obs, rew, done = pool.step(actions)
        for i in range(3):
            states[i], jobs, jrew, jdone = env.step(states[i], int(actions[i]))
            np.testing.assert_allclose(obs[i], np.asarray(jobs), atol=1e-6)
            assert float(rew[i]) == float(jrew), (step, i)
            assert bool(done[i]) == bool(jdone)
        if done.all():
            break
    assert bool(done.all())  # 201-step episodes terminated


def test_native_out_of_range_actions_noop():
    pool = NativeTrapPool(2)
    pool.reset_all()
    obs, rew, done = pool.step(np.array([9, -1]))
    np.testing.assert_array_equal(rew, [0.0, 0.0])


def test_native_auto_reset():
    pool = NativeTrapPool(1)
    pool.reset_all()
    start = pool.reset_all()[0]
    done = np.array([False])
    for _ in range(201):
        obs, rew, done = pool.step(np.array([4]), auto_reset=True)  # stay put
    assert bool(done[0])
    np.testing.assert_allclose(obs[0], start, atol=1e-6)  # reset obs reported


def test_native_throughput_smoke():
    import time

    n = 512
    pool = NativeTrapPool(n)
    pool.reset_all()
    actions = np.random.RandomState(0).randint(0, 9, size=n).astype(np.int32)
    t0 = time.perf_counter()
    iters = 200
    for _ in range(iters):
        pool.step(actions, auto_reset=True)
    dt = time.perf_counter() - t0
    steps_per_s = n * iters / dt
    assert steps_per_s > 100_000, steps_per_s


def test_lib_search_order(tmp_path, monkeypatch):
    """DFD_ENVPOOL_LIB overrides; otherwise the source checkout's runtime/
    build is found (wheel installs fall through to dfd_tpu/_native)."""
    from dfd_tpu.envs import native_pool

    found = native_pool._find_lib()
    assert found is not None and found.endswith("libdfd_envpool.so")

    override = tmp_path / "libdfd_envpool.so"
    override.write_bytes(b"")  # existence is all _find_lib checks
    monkeypatch.setenv("DFD_ENVPOOL_LIB", str(override))
    assert native_pool._find_lib() == str(override)
