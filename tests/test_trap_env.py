"""simple_trap_env: exact step-for-step parity with the reference env."""

import numpy as np
import pytest

from dfd_tpu.envs.trap import EPISODE_LENGTH, TrapEnv, load_walkable_grid, parse_map_text
from tests._reference import load_reference, make_trap_env, reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")


def test_grid_matches_reference_tilemap():
    ns = load_reference()
    import os

    cwd = os.getcwd()
    try:
        os.chdir("/root/reference")
        tm = ns.TileMap()
        tm.load_map("custom_envs/simple_trap_env/map.txt")
    finally:
        os.chdir(cwd)
    grid = load_walkable_grid()
    assert grid.shape == (tm.height, tm.width)
    for i in range(tm.height):
        for j in range(tm.width):
            assert bool(grid[i, j]) == tm.nodes[i][j].walkable, (i, j)


def test_text_parser_matches_npz():
    with open(load_reference().map_path) as f:
        grid = parse_map_text(f.read())
    np.testing.assert_array_equal(grid, load_walkable_grid())


def test_episode_parity_random_actions():
    ref_env = make_trap_env()
    env = TrapEnv()
    rng = np.random.RandomState(0)

    for episode in range(3):
        ref_obs = ref_env.reset()
        state, obs = env.reset()
        np.testing.assert_allclose(np.asarray(obs, np.float64), ref_obs, rtol=0, atol=1e-7)
        done = False
        steps = 0
        while not done:
            a = rng.randint(0, 9)
            ref_obs, ref_rew, ref_done, _ = ref_env.step(a)
            state, obs, rew, done_j = env.step(state, a)
            np.testing.assert_allclose(np.asarray(obs, np.float64), ref_obs, rtol=0, atol=1e-7)
            assert float(rew) == float(ref_rew)
            assert bool(done_j) == bool(ref_done)
            done = ref_done
            steps += 1
        assert steps == EPISODE_LENGTH + 1


def test_walls_block_movement():
    env = TrapEnv()
    grid = load_walkable_grid()
    # find a walkable cell with an unwalkable right neighbor
    ys, xs = np.where(grid[:, :-1] & ~grid[:, 1:])
    y, x = int(ys[0]), int(xs[0])
    from dfd_tpu.envs.trap import TrapState
    import jax.numpy as jnp

    s = TrapState(ix=jnp.asarray(x, jnp.int32), iy=jnp.asarray(y, jnp.int32), t=jnp.asarray(0, jnp.int32))
    # action with dx=+1, dy=0 -> a//3-1=1, a%3-1=0 -> a=7
    s2, _, rew, _ = env.step(s, 7)
    assert int(s2.ix) == x and int(s2.iy) == y
    assert float(rew) == 0.0


def test_scan_rollout_matches_python_loop():
    """The env must behave identically under jit + lax.scan."""
    import jax
    import jax.numpy as jnp

    env = TrapEnv()
    actions = np.random.RandomState(1).randint(0, 9, size=env.max_episode_steps).astype(np.int32)

    state, obs = env.reset()
    py_rewards = []
    for a in actions:
        state, obs, rew, done = env.step(state, int(a))
        py_rewards.append(float(rew))
        if bool(done):
            break

    def scan_fn(carry, a):
        st = carry
        st, obs, rew, done = env.step(st, a)
        return st, (rew, done)

    st0, _ = env.reset()
    _, (rews, dones) = jax.jit(lambda s, acts: jax.lax.scan(scan_fn, s, acts))(st0, jnp.asarray(actions))
    n = int(np.argmax(np.asarray(dones))) + 1
    np.testing.assert_allclose(np.asarray(rews)[:n], np.asarray(py_rewards), rtol=0)


def test_action_playback_recorder_reference_format(tmp_path):
    """ActionPlaybackRecorder reproduces the reference trap env's playback
    dump byte-for-byte (reference environment.py:50-52, 63-75): on reset, a
    full (episode_length+1)-step record appends one space-prefixed line of
    the first episode_length actions; short episodes are dropped."""
    from dfd_tpu.envs.wrappers import ActionPlaybackRecorder
    from dfd_tpu.runners.host_env import HostEnv

    folder = str(tmp_path / "playbacks")
    env = ActionPlaybackRecorder(
        HostEnv(TrapEnv()), opt_id="w1", episode_length=3, folder=folder
    )
    path = tmp_path / "playbacks" / "w1.txt"

    env.reset()
    for a in (4, 2, 7, 1):  # full episode: episode_length + 1 = 4 steps
        env.step(a)
    env.reset()
    assert path.read_bytes() == b" 4 2 7\n"

    for a in (5, 5):  # short episode: dropped
        env.step(a)
    env.reset()
    assert path.read_bytes() == b" 4 2 7\n"

    for a in (0, 8, 3, 6):  # lines append across episodes
        env.step(a)
    env.reset()
    assert path.read_bytes() == b" 4 2 7\n 0 8 3\n"


def test_action_playback_recorder_derives_length_and_warns(tmp_path):
    """episode_length defaults to the wrapped env's declared length (the
    trap env's max_episode_steps=201 -> 200), and a mismatched length warns
    once instead of staying a silent no-op (ADVICE r2)."""
    import warnings

    from dfd_tpu.envs.wrappers import ActionPlaybackRecorder
    from dfd_tpu.runners.host_env import HostEnv

    env = ActionPlaybackRecorder(HostEnv(TrapEnv()), opt_id="w2", folder=str(tmp_path))
    assert env.episode_length == 200

    env = ActionPlaybackRecorder(
        HostEnv(TrapEnv()), opt_id="w3", episode_length=500, folder=str(tmp_path)
    )
    env._WARN_AFTER_RESETS = 3
    env.reset()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        for _ in range(5):
            env.step(0)
            env.reset()
    msgs = [w for w in caught if "no complete episode" in str(w.message)]
    assert len(msgs) == 1
