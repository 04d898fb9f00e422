"""JAX-native CartPole/Pendulum: dynamics parity vs gymnasium, and the
factory's env_id routing."""

import numpy as np
import pytest

from dfd_tpu.envs.cartpole import CartPoleEnv
from dfd_tpu.envs.pendulum import PendulumEnv
from dfd_tpu.envs.gym_adapter import gymnasium_available
from dfd_tpu.utils.factory import get_init_data, make_jax_env


@pytest.mark.skipif(not gymnasium_available(), reason="gymnasium not installed")
def test_cartpole_dynamics_match_gymnasium():
    import gymnasium
    import jax
    import jax.numpy as jnp

    from dfd_tpu.envs.cartpole import CartPoleState

    genv = gymnasium.make("CartPole-v1").unwrapped
    genv.reset(seed=0)
    ours = CartPoleEnv()

    rng = np.random.RandomState(0)
    # force identical initial state
    start = rng.uniform(-0.05, 0.05, 4)
    genv.state = start.copy()
    state = CartPoleState(*[jnp.asarray(v, jnp.float32) for v in start], jnp.asarray(0, jnp.int32))

    for t in range(60):
        a = int(rng.randint(2))
        gobs, grew, gterm, gtrunc, _ = genv.step(a)
        state, obs, rew, done = ours.step(state, a)
        np.testing.assert_allclose(np.asarray(obs), gobs, atol=1e-4)
        assert float(rew) == float(grew)
        if gterm:
            assert bool(done)
            break


@pytest.mark.skipif(not gymnasium_available(), reason="gymnasium not installed")
def test_pendulum_dynamics_match_gymnasium():
    import gymnasium
    import jax.numpy as jnp

    from dfd_tpu.envs.pendulum import PendulumState

    genv = gymnasium.make("Pendulum-v1").unwrapped
    genv.reset(seed=0)
    ours = PendulumEnv()

    rng = np.random.RandomState(1)
    theta, theta_dot = 0.5, -0.3
    genv.state = np.array([theta, theta_dot])
    state = PendulumState(jnp.float32(theta), jnp.float32(theta_dot), jnp.asarray(0, jnp.int32))

    for t in range(50):
        u = float(rng.uniform(-1, 1))
        gobs, grew, _, _, _ = genv.step(np.array([u * 2.0]))  # gym takes raw torque
        state, obs, rew, done = ours.step(state, u)
        np.testing.assert_allclose(np.asarray(obs), gobs, atol=1e-4)
        np.testing.assert_allclose(float(rew), float(grew), atol=1e-4)


def test_cartpole_scan_episode():
    import jax
    import jax.numpy as jnp

    env = CartPoleEnv()
    key = jax.random.key(0)
    state, obs = env.reset(key)

    def step(carry, k):
        s, done = carry
        a = jax.random.randint(k, (), 0, 2)
        s2, o, r, d = env.step(s, a)
        keep = lambda n, o_: jax.tree.map(lambda x, y: jnp.where(done, y, x), n, o_)
        return (keep(s2, s), done | d), r * (1 - done)

    keys = jax.random.split(key, 500)
    (_, done), rewards = jax.lax.scan(step, (state, jnp.asarray(False)), keys)
    assert bool(done)
    total = float(rewards.sum())
    assert 5 <= total <= 500


def test_factory_jax_envs():
    for env_id, discrete in [("SimpleTrapEnv-v0", True), ("CartPole-v1", True), ("Pendulum-v1", False)]:
        env, model, dist = get_init_data(env_id, 0)
        assert model.discrete == discrete
        obs = env.reset()
        a = 0 if discrete else [0.0] * model.output_shape
        obs2, r, d, _ = env.step(a)
        assert np.asarray(obs2).shape == np.asarray(obs).shape


def test_factory_unknown_jax_env():
    with pytest.raises(KeyError):
        make_jax_env("NoSuchEnv-v99")


def test_vectorized_trainer_learns_cartpole():
    """config[1]-class check: population training on the JAX CartPole."""
    from dfd_tpu.config import TrainConfig
    from dfd_tpu.models import DiscreteMLP
    from dfd_tpu.ops import distances
    from dfd_tpu.runners import VectorizedTrainer
    from dfd_tpu.utils.metrics import EpochReporter

    cfg = TrainConfig(
        batch_size=16, learning_rate=0.05, noise_std=0.1, zeta_size=16,
        max_strategy_history_size=8, random_seed=0, episode_length=200,
    )
    tr = VectorizedTrainer(
        DiscreteMLP(4, 2), CartPoleEnv(), distances.categorical_tvd, cfg,
        reporter=EpochReporter(quiet=True),
    )
    tr.train(12)
    h = tr.reporter.history
    first = np.mean([r["Noisy Reward"] for r in h[:3]])
    last = np.mean([r["Noisy Reward"] for r in h[-3:]])
    assert last > first, (first, last)
