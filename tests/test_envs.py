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


# -- Swimmer: HalfCheetah-class JAX-native continuous locomotion ---------------


def _swimmer_rollout(env, key, policy_fn, T=150):
    import jax
    import jax.numpy as jnp

    s, o = env.reset(key)
    x0 = env._com_x(s.q)

    def body(carry, t):
        s, o, rew = carry
        a = policy_fn(o, t)
        s2, o2, r, d = env.step(s, a)
        return (s2, o2, rew + r), jnp.abs(o2).max()

    (sf, _, total), mx = jax.lax.scan(body, (s, o, jnp.float32(0)), jnp.arange(T))
    return total, env._com_x(sf.q) - x0, mx.max()


def test_swimmer_shapes_and_stability():
    import jax
    import jax.numpy as jnp

    from dfd_tpu.envs.swimmer import SwimmerEnv

    env = SwimmerEnv()
    assert env.obs_shape == (16,)
    assert env.action_dim == 6 and not env.discrete
    state, obs = env.reset(jax.random.key(0))
    assert obs.shape == (16,)

    def rand_policy(o, t):
        return jax.random.uniform(jax.random.fold_in(jax.random.key(9), t), (6,),
                                  minval=-1.0, maxval=1.0)

    total, dx, mx = jax.jit(lambda k: _swimmer_rollout(env, k, rand_policy))(jax.random.key(1))
    assert np.isfinite(float(total))
    # implicit drag integration keeps velocities bounded under any torques
    assert float(mx) < 20.0


def test_swimmer_wave_gait_locomotes():
    """A traveling-wave gait must move the center of mass far beyond the
    passive noise floor — the locomotion signal FD training climbs."""
    import jax
    import jax.numpy as jnp

    from dfd_tpu.envs.swimmer import SwimmerEnv

    env = SwimmerEnv()

    def wave(o, t):
        k = jnp.arange(6, dtype=jnp.float32)
        return jnp.sin(0.4 * t.astype(jnp.float32) + 0.8 * k)

    def zero(o, t):
        return jnp.zeros(6)

    f = jax.jit(lambda k: _swimmer_rollout(env, k, wave))
    z = jax.jit(lambda k: _swimmer_rollout(env, k, zero))
    wave_dx = np.mean([float(f(jax.random.key(s))[1]) for s in (1, 2, 3)])
    zero_dx = np.mean([abs(float(z(jax.random.key(s))[1])) for s in (1, 2, 3)])
    assert wave_dx > 1.0, wave_dx
    assert wave_dx > 3 * zero_dx, (wave_dx, zero_dx)


def test_swimmer_passive_energy_bounded():
    """With zero torque the viscous drag dissipates: joint velocities damp
    out fast; the body's translational coasting decays too (slowly — the
    tangential drag is deliberately low, that's the swimming anisotropy)."""
    import jax
    import jax.numpy as jnp

    from dfd_tpu.envs.swimmer import SwimmerEnv

    env = SwimmerEnv()
    s, _ = env.reset(jax.random.key(4))
    s = s._replace(qdot=s.qdot.at[:].set(1.0))

    def ke(st):
        M, _, _ = env._terms(st.q, st.qdot)
        return 0.5 * st.qdot @ M @ st.qdot

    def body(carry, _):
        st = carry
        st2, _, _, _ = env.step(st, jnp.zeros(6))
        return st2, ke(st2)

    sf, kes = jax.lax.scan(body, s, None, length=300)
    kes = np.asarray(kes)
    assert float(jnp.abs(sf.qdot[3:]).max()) < 0.05   # joints at rest
    assert kes[-1] < 0.1 * kes[0]                      # drag dissipates
    assert (np.diff(kes) < 1e-3).all()                 # monotone decay


def test_swimmer_closed_form_matches_autodiff():
    """The closed-form dynamics terms (production path) must equal the
    autodiff-derived oracle at random states, for several chain lengths."""
    import jax
    import jax.numpy as jnp

    from dfd_tpu.envs.swimmer import SwimmerEnv

    for n_links in (3, 5, 7):
        env = SwimmerEnv(n_links=n_links)
        key = jax.random.key(n_links)
        for i in range(4):
            kq, kv, key = jax.random.split(jax.random.fold_in(key, i), 3)
            q = jax.random.uniform(kq, (env.ndof,), minval=-1.5, maxval=1.5)
            qdot = jax.random.uniform(kv, (env.ndof,), minval=-2.0, maxval=2.0)
            Ma, Da, ba = env._terms_autodiff(q, qdot)
            Mc, Dc, bc = env._terms_closed(q, qdot)
            np.testing.assert_allclose(Mc, Ma, rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(Dc, Da, rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(bc, ba, rtol=1e-4, atol=1e-4)


def test_swimmer_closed_trajectory_matches_autodiff():
    """Full episode trajectories under the two dynamics implementations
    agree (same integrator, same solve up to factorization round-off)."""
    import jax
    import jax.numpy as jnp

    from dfd_tpu.envs.swimmer import SwimmerEnv

    envc = SwimmerEnv(dynamics="closed")
    enva = SwimmerEnv(dynamics="autodiff")

    def wave(o, t):
        k = jnp.arange(6, dtype=jnp.float32)
        return jnp.sin(0.4 * t.astype(jnp.float32) + 0.8 * k)

    tc, dxc, _ = jax.jit(lambda k: _swimmer_rollout(envc, k, wave, T=50))(jax.random.key(2))
    ta, dxa, _ = jax.jit(lambda k: _swimmer_rollout(enva, k, wave, T=50))(jax.random.key(2))
    np.testing.assert_allclose(float(tc), float(ta), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(float(dxc), float(dxa), rtol=1e-3, atol=1e-3)


def test_spd_solve_unrolled_matches_linalg():
    import jax
    import jax.numpy as jnp

    from dfd_tpu.ops.smallsolve import spd_solve_unrolled

    key = jax.random.key(0)
    for n in (2, 5, 9):
        kA, kb, key = jax.random.split(key, 3)
        R = jax.random.normal(kA, (4, n, n))
        A = jnp.einsum("bij,bkj->bik", R, R) + 0.5 * jnp.eye(n)
        b = jax.random.normal(kb, (4, n))
        x = spd_solve_unrolled(A, b)
        np.testing.assert_allclose(
            np.asarray(jnp.einsum("bij,bj->bi", A, x)), np.asarray(b),
            rtol=1e-4, atol=1e-4,
        )


def test_swimmer_factory_routing():
    from dfd_tpu.models import GaussianMLP
    from dfd_tpu.utils.factory import get_vectorized_init_data

    env, model, dist = get_vectorized_init_data("Swimmer-v0")
    assert isinstance(model, GaussianMLP)
    assert model.input_shape == 16 and model.output_shape == 6


# -- ProcMaze: procgen-shaped deterministic levels ------------------------------


def test_procmaze_levels_deterministic_and_varied():
    import jax

    from dfd_tpu.envs.procmaze import ProcMazeEnv

    env = ProcMazeEnv(num_levels=50)
    s1, g1, w1, t1 = env._gen_level(7)
    s2, g2, w2, t2 = env._gen_level(7)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))

    diffs = sum(
        int(not np.array_equal(np.asarray(env._gen_level(i)[2]), np.asarray(w1)))
        for i in range(8)
    )
    assert diffs >= 6  # layouts genuinely vary across levels


def test_procmaze_l_corridor_always_clear():
    from dfd_tpu.envs.procmaze import ProcMazeEnv

    env = ProcMazeEnv(distribution_mode="hard", num_levels=100)
    for level in range(25):
        start, goal, walls, _ = env._gen_level(level)
        start, goal, walls = np.asarray(start), np.asarray(goal), np.asarray(walls)
        assert not walls[start[0]].any()        # start row clear
        assert not walls[:, goal[1]].any()      # goal column clear


def test_procmaze_walls_block_moves():
    import jax
    import jax.numpy as jnp

    from dfd_tpu.envs.procmaze import ProcMazeEnv, ProcMazeState

    env = ProcMazeEnv()
    walls = jnp.zeros((8, 8), bool).at[3, 4].set(True)
    state = ProcMazeState(
        agent=jnp.asarray([3, 3]), goal=jnp.asarray([7, 7]), walls=walls,
        tint=jnp.full((3,), 255.0), t=jnp.asarray(0, jnp.int32),
    )
    new_state, _, _, _ = env.step(state, 4)  # right, into the wall
    np.testing.assert_array_equal(np.asarray(new_state.agent), [3, 3])
    new_state, _, _, _ = env.step(state, 2)  # down, free
    np.testing.assert_array_equal(np.asarray(new_state.agent), [4, 3])


def test_procmaze_reset_within_level_range_and_render():
    import jax

    from dfd_tpu.envs.procmaze import ProcMazeEnv

    env = ProcMazeEnv(num_levels=3, start_level=10)
    state, obs = env.reset(jax.random.key(0))
    assert obs.shape == (3, 64, 64)
    o = np.asarray(obs)
    assert o.max() > 100  # tinted intensities
    assert o.min() == 0.0

    # same key -> same level -> identical layout
    state2, obs2 = env.reset(jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(state.walls), np.asarray(state2.walls))


def test_procmaze_trains_a_step():
    """One vectorized-trainer epoch end-to-end with the IMPALA policy."""
    from dfd_tpu.config import TrainConfig
    from dfd_tpu.models.impala import ImpalaPolicy
    from dfd_tpu.ops import distances
    from dfd_tpu.runners.vectorized import VectorizedTrainer
    from dfd_tpu.utils.factory import get_vectorized_init_data
    from dfd_tpu.utils.metrics import EpochReporter

    env, model, dist = get_vectorized_init_data("ProcMaze-v0")
    assert isinstance(model, ImpalaPolicy)

    from dfd_tpu.envs.procmaze import ProcMazeEnv

    env = ProcMazeEnv(grid=4, scale=4, max_steps=6, num_levels=5)
    model = ImpalaPolicy(env.obs_shape, env.n_actions)
    cfg = TrainConfig(batch_size=2, zeta_size=4, max_strategy_history_size=4,
                      episode_length=6, random_seed=0)
    tr = VectorizedTrainer(model, env, distances.categorical_tvd, cfg,
                           reporter=EpochReporter(quiet=True))
    tr.train(1)
    assert int(tr.state.epoch) == 1
    assert np.isfinite(tr.reporter.history[0]["Noisy Reward"])


def test_gym_adapter_handles_both_api_generations():
    """GymEnv must adapt gym>=0.26 (tuple reset, 5-tuple step) as well as
    the legacy 4-tuple API procgen registers against."""
    from dfd_tpu.envs.gym_adapter import GymEnv

    class _Modern:
        def reset(self):
            return np.zeros(3, np.float32), {}

        def step(self, action):
            return np.ones(3, np.float32), 1.0, False, True, {}

    class _Legacy:
        def reset(self):
            return np.zeros(3, np.float32)

        def step(self, action):
            return np.ones(3, np.float32), 2.0, True, {}

    for fake, want_rew in ((_Modern(), 1.0), (_Legacy(), 2.0)):
        env = GymEnv.__new__(GymEnv)
        env._env = fake
        env._seed = None
        obs = env.reset()
        assert obs.shape == (3,)
        obs, rew, done, _ = env.step(0)
        assert rew == want_rew
        assert done is True  # modern: truncated; legacy: done


def test_gym_adapter_seeds_modern_envs_via_reset():
    """gymnasium-era envs have no .seed(); the pending seed must ride on
    reset(seed=...) exactly once instead of being silently dropped."""
    from dfd_tpu.envs.gym_adapter import GymEnv

    class _Modern:
        def __init__(self):
            self.seen = []

        def reset(self, seed=None):
            self.seen.append(seed)
            return np.zeros(3, np.float32), {}

    fake = _Modern()
    env = GymEnv.__new__(GymEnv)
    env._env = fake
    env._seed = 123
    env.reset()
    env.reset()  # seed is one-shot, like legacy .seed()
    assert fake.seen == [123, None]
