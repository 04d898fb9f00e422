"""Vectorized TPU-native trainer: correctness of the jitted epoch step,
learning on the trap env, and mesh-sharded execution on 8 virtual devices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfd_tpu.config import TrainConfig
from dfd_tpu.core.noise import CounterNoise
from dfd_tpu.envs.trap import TrapEnv
from dfd_tpu.fd import combine as fd_combine
from dfd_tpu.fd import rollout as fd_rollout
from dfd_tpu.models import DiscreteMLP
from dfd_tpu.ops import distances
from dfd_tpu.runners import VectorizedTrainer
from dfd_tpu.utils.metrics import EpochReporter


def _trainer(P=8, mesh=None, **kw):
    cfg = TrainConfig(
        batch_size=P,
        learning_rate=0.05,
        noise_std=0.05,
        zeta_size=16,
        max_strategy_history_size=8,
        random_seed=5,
        **kw,
    )
    model = DiscreteMLP(2, 9)
    env = TrapEnv()
    return VectorizedTrainer(model, env, distances.categorical_tvd, cfg, mesh=mesh)


def test_rollout_matches_host_episode():
    """The scanned rollout reproduces a step-by-step python episode."""
    model = DiscreteMLP(2, 9)
    env = TrapEnv()
    params, state = model.init(3)
    jparams = jax.tree.map(jnp.asarray, params)
    key = jax.random.key(0)

    res = fd_rollout.episode_rollout(
        model, env, jparams, state, key, env.max_episode_steps,
        deterministic=jnp.asarray(True),
        obs_mean=jnp.zeros(2), obs_std=jnp.ones(2),
        normalize_obs=False, obs_stats_update_chance=0.0,
    )
    # python re-run with argmax actions
    est, obs = env.reset(jax.random.split(key, 3)[0])
    total, steps = 0.0, 0
    for _ in range(env.max_episode_steps):
        probs = model.apply(jparams, state, obs)[0]
        a = int(jnp.argmax(probs))
        est, obs, r, done = env.step(est, a)
        total += float(r)
        steps += 1
        if bool(done):
            break
    assert int(res.steps) == steps
    assert float(res.reward) == total


def test_combine_gradient_math():
    rng = np.random.default_rng(0)
    eps = rng.standard_normal((6, 32)).astype(np.float32)
    fit = rng.standard_normal(6).astype(np.float32)
    sigma = 0.1
    expect = sum(
        fit[i] * (sigma * eps[i]) / np.linalg.norm(sigma * eps[i]) ** 2 for i in range(6)
    )
    got = np.asarray(fd_combine.combine_gradient(jnp.asarray(eps), jnp.asarray(fit), sigma))
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_combine_chunked_matches_dense():
    noise = CounterNoise(64, random_seed=1)
    ids = jnp.arange(8)
    fit = jnp.asarray(np.random.default_rng(1).standard_normal(8), jnp.float32)
    eps = noise.generate_block(2, ids)
    dense = fd_combine.combine_gradient(eps, fit, 0.02)
    chunked = fd_combine.combine_gradient_chunked(noise, 2, ids, fit, 0.02, chunk=4)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(dense), rtol=1e-5, atol=1e-7)


def test_fitness_tie_break():
    key = jax.random.key(0)
    const = jnp.full((8,), 3.0)
    fit = fd_combine.fitness_from_rewards(const, 0.0, key)
    assert set(np.unique(np.asarray(fit))) <= {-1.0, 1.0}
    varied = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    fit2 = np.asarray(fd_combine.fitness_from_rewards(varied, 0.0, key))
    np.testing.assert_allclose(fit2.mean(), 0, atol=1e-6)
    np.testing.assert_allclose(fit2.std(), 1, atol=1e-5)


def test_trainer_epoch_step_runs_and_updates():
    tr = _trainer(P=8)
    flat0 = np.asarray(tr.state.flat).copy()
    tr.train(2)
    assert int(tr.state.epoch) == 2
    assert not np.allclose(np.asarray(tr.state.flat), flat0)
    h = tr.reporter.history
    assert len(h) == 2
    for row in h:
        assert row["Update Magnitude"] > 0
        assert np.isfinite(row["Noisy Reward"])
    assert tr.cumulative_timesteps > 0
    # archive grew host-side
    assert len(tr.handler.archive) >= 2


def test_trainer_learns_on_trap_env():
    tr = _trainer(P=16)
    tr.train(15)
    h = tr.reporter.history
    first = np.mean([r["Noisy Reward"] for r in h[:3]])
    last = np.mean([r["Noisy Reward"] for r in h[-3:]])
    assert last > first, (first, last)


def test_trainer_normalize_obs_accumulates_stats():
    tr = _trainer(P=8, normalize_obs=True, obs_stats_update_chance=0.5)
    tr.train(2)
    assert float(tr.state.obs_stats.count) > 0


def test_trainer_on_mesh_matches_single_device():
    """Sharding the population over 8 virtual devices must not change the
    math (same seeds -> same trajectory of parameters)."""
    devices = jax.devices()
    assert len(devices) == 8, "conftest must force 8 virtual cpu devices"
    mesh = jax.sharding.Mesh(np.array(devices), ("pop",))

    tr_single = _trainer(P=8)
    tr_mesh = _trainer(P=8, mesh=mesh)
    tr_single.train(3)
    tr_mesh.train(3)
    np.testing.assert_allclose(
        np.asarray(tr_single.state.flat), np.asarray(tr_mesh.state.flat), rtol=2e-4, atol=2e-5
    )
    r1 = [r["Noisy Reward"] for r in tr_single.reporter.history]
    r2 = [r["Noisy Reward"] for r in tr_mesh.reporter.history]
    np.testing.assert_allclose(r1, r2, rtol=1e-5)


def test_fused_eval_matches_legacy_eval_path():
    """The ride-along eval member (fused path) must reproduce the separate
    cond-gated eval episode (the chunked legacy path; meshes now fuse too,
    with one replicated eval slot per device) — including the masking of
    eval contributions on non-eval epochs."""
    for eval_every in (1, 2):
        tr_fused = _trainer(P=8, eval_every=eval_every)
        tr_legacy = _trainer(P=8, population_chunk=4, eval_every=eval_every)
        tr_fused.train(4)
        tr_legacy.train(4)
        np.testing.assert_allclose(
            np.asarray(tr_fused.state.flat), np.asarray(tr_legacy.state.flat),
            rtol=2e-4, atol=2e-5,
        )
        assert tr_fused.cumulative_timesteps == tr_legacy.cumulative_timesteps
        for k in ("Policy Reward", "Noisy Reward", "Policy Novelty"):
            np.testing.assert_allclose(
                [r[k] for r in tr_fused.reporter.history],
                [r[k] for r in tr_legacy.reporter.history],
                rtol=1e-4, atol=1e-6, err_msg=f"{k} @ eval_every={eval_every}",
            )
        np.testing.assert_allclose(
            np.asarray(tr_fused.state.zeta), np.asarray(tr_legacy.state.zeta),
            rtol=1e-5, atol=1e-6,
        )


def test_trainer_metrics_vocabulary():
    tr = _trainer(P=8)
    tr.train(1)
    row = tr.reporter.history[0]
    for k in [
        "Epoch", "Epoch Time", "Cumulative Timesteps", "Policy Reward",
        "Policy Entropy", "Policy Novelty", "Noisy Reward", "Noisy Novelty",
        "Update Magnitude", "Omega",
    ]:
        assert k in row, k


def test_train_fast_matches_train_params():
    """Chunked in-graph training gives identical parameters (the archive
    freeze inside a chunk only affects novelty metrics, never dynamics)."""
    a = _trainer(P=8)
    b = _trainer(P=8)
    a.train(6)
    b.train_fast(6, sync_every=3)
    np.testing.assert_array_equal(np.asarray(a.state.flat), np.asarray(b.state.flat))
    assert a.cumulative_timesteps == b.cumulative_timesteps
    ra = [r["Noisy Reward"] for r in a.reporter.history]
    rb = [r["Noisy Reward"] for r in b.reporter.history]
    np.testing.assert_allclose(ra, rb, rtol=1e-6)


def test_trainer_sgd_optimizer():
    tr = _trainer(P=8, optimizer="sgd")
    flat0 = np.asarray(tr.state.flat).copy()
    tr.train(2)
    assert not np.allclose(np.asarray(tr.state.flat), flat0)
    assert all(np.isfinite(r["Update Magnitude"]) for r in tr.reporter.history)


def test_population_chunking_matches_dense():
    """Chunked evaluation (memory-bounded) must give identical training to
    the dense path — same noise, same rollouts, same combine."""
    dense = _trainer(P=8)
    chunked = _trainer(P=8, population_chunk=4)
    dense.train(3)
    chunked.train(3)
    np.testing.assert_allclose(
        np.asarray(chunked.state.flat), np.asarray(dense.state.flat), rtol=1e-5, atol=1e-6
    )
    # Policy Reward covers the fused eval slot riding chunk 0 (round 4): the
    # chunked eval episode must be the same episode the dense fused path runs
    for key, tol in (("Noisy Reward", 1e-6), ("Policy Reward", 1e-6),
                     ("Noisy Novelty", 1e-4)):
        a = [r[key] for r in dense.reporter.history]
        b = [r[key] for r in chunked.reporter.history]
        np.testing.assert_allclose(a, b, rtol=tol, atol=1e-6)
    assert dense.cumulative_timesteps == chunked.cumulative_timesteps


def test_population_chunking_matches_dense_with_env_averaging():
    """population_chunk composes with envs_per_perturbation (round 3: the
    production-width HBM boundary made chunked + E-averaged fitness the
    missing memory escape) — chunked E>1 training equals dense E>1."""
    dense = _trainer(P=8, envs_per_perturbation=2)
    chunked = _trainer(P=8, envs_per_perturbation=2, population_chunk=4)
    dense.train(3)
    chunked.train(3)
    np.testing.assert_allclose(
        np.asarray(chunked.state.flat), np.asarray(dense.state.flat), rtol=1e-5, atol=1e-6
    )
    for key in ("Noisy Reward", "Policy Reward"):
        a = [r[key] for r in dense.reporter.history]
        b = [r[key] for r in chunked.reporter.history]
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_flat_e_lowering_matches_nested():
    """The flat (member*episode) E-lowering must train identically to the
    nested vmap(P)∘vmap(E) form — same episode keys, same reductions; only
    the batching structure differs (round 3: flat measured 2.7x faster)."""
    flat = _trainer(P=8, envs_per_perturbation=2, e_lowering="flat",
                    normalize_obs=True)
    nested = _trainer(P=8, envs_per_perturbation=2, e_lowering="nested",
                      normalize_obs=True)
    flat.train(3)
    nested.train(3)
    np.testing.assert_allclose(
        np.asarray(flat.state.flat), np.asarray(nested.state.flat),
        rtol=1e-5, atol=1e-6,
    )
    for key in ("Noisy Reward", "Policy Reward", "Noisy Novelty"):
        a = [r[key] for r in flat.reporter.history]
        b = [r[key] for r in nested.reporter.history]
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(flat.state.obs_stats.mean),
        np.asarray(nested.state.obs_stats.mean), rtol=1e-5, atol=1e-7,
    )
    assert flat.cumulative_timesteps == nested.cumulative_timesteps


def test_eval_every_skips_eval_work():
    """With eval_every>1 non-eval epochs run no eval episode (timesteps drop
    by the eval horizon) and EMAs/zeta only move on eval epochs."""
    a = _trainer(P=4, eval_every=3, episode_length=50)
    a.train(4)
    h = a.reporter.history
    # epochs 0 and 3 eval (epoch counter starts at 0): timesteps differ
    steps = []
    prev = 0
    for r in h:
        steps.append(r["Cumulative Timesteps"] - prev)
        prev = r["Cumulative Timesteps"]
    assert steps[0] > steps[1]  # eval epoch collected the extra episode
    assert steps[1] == steps[2] == 4 * 50
    assert steps[3] == steps[0]
    # EMA frozen between evals
    assert h[0]["Policy Reward"] == h[1]["Policy Reward"] == h[2]["Policy Reward"]


def test_checkpoint_restore_into_warm_trainer():
    """Restoring into a trainer whose archive is already warm/full must not
    route submissions into _replace against an emptied tensor."""
    import os
    import tempfile

    from dfd_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    def small_trainer():
        cfg = TrainConfig(batch_size=4, learning_rate=0.05, noise_std=0.05,
                          zeta_size=16, max_strategy_history_size=2, random_seed=5)
        return VectorizedTrainer(DiscreteMLP(2, 9), TrapEnv(), distances.categorical_tvd, cfg)

    a = small_trainer()
    a.train(4)  # archive full (2 entries) and zeta set
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "c.npz")
        save_checkpoint(path, a)
        b = small_trainer()
        b.train(4)  # warm target: archive full, archive.zeta non-empty
        load_checkpoint(path, b)
        b.train(1)  # must not crash
    assert int(b.state.epoch) == 5


def test_eval_panel_fixed_deterministic_and_read_only():
    """Round-5 panel eval: same K reset keys every call (fixed level draws),
    deterministic, and side-effect-free on the training state."""
    tr = _trainer(P=4)
    tr.train(2)
    as_np = lambda s: jax.tree.map(
        np.asarray, s._replace(key=jax.random.key_data(s.key))
    )
    before = as_np(tr.state)

    p1 = tr.eval_panel(6, panel_seed=7)
    p2 = tr.eval_panel(6, panel_seed=7)
    assert p1.shape == (6,)
    np.testing.assert_array_equal(p1, p2)

    # read-only: no RNG/epoch/EMA advance from panel evaluation
    after = as_np(tr.state)
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)

    # the panel tracks the policy: a later call recompiles nothing and still
    # reads the CURRENT parameters
    tr.train(6)
    p4 = tr.eval_panel(6, panel_seed=7)
    assert p4.shape == (6,)


def test_eval_panel_fixes_levels_on_procedural_envs():
    """On a procedurally-generated distribution the panel's fixed reset keys
    pin the level draws: same seed -> identical level panel across calls,
    different seed -> a different (generally non-identical) draw."""
    from dfd_tpu.envs.procmaze import ProcMazeEnv
    from dfd_tpu.models.atari import AtariCNN

    env = ProcMazeEnv(grid=4, scale=16, max_steps=14, num_levels=200)
    model = AtariCNN((env.obs_shape[1], env.obs_shape[2]), env.n_actions,
                     in_channels=env.obs_shape[0])
    cfg = TrainConfig(batch_size=4, zeta_size=4, max_strategy_history_size=4,
                      episode_length=14, random_seed=0)
    tr = VectorizedTrainer(model, env, distances.categorical_tvd, cfg,
                           reporter=EpochReporter(quiet=True))
    p1 = tr.eval_panel(16, panel_seed=7)
    np.testing.assert_array_equal(p1, tr.eval_panel(16, panel_seed=7))
    p3 = tr.eval_panel(16, panel_seed=8)
    # shaped maze returns depend on each level's start/goal distance, so a
    # different fixed 16-level draw shifts the per-episode return VECTOR.
    # (Everything here is seeded — this comparison is deterministic across
    # runs, pinned by the fixed env levels, init seed and panel seeds.)
    assert not np.array_equal(p1, p3)


def test_eval_panel_identical_across_checkpoint_restore():
    """The panel is a pure function of training state: a trainer restored
    from a checkpoint must produce the identical panel vector (the property
    the round-5 long runs rely on when comparing panels across crash
    resumes)."""
    import os
    import tempfile

    from dfd_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    tr = _trainer(P=4)
    tr.train(3)
    p_orig = tr.eval_panel(6, panel_seed=11)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "c.npz")
        save_checkpoint(path, tr)
        tr2 = _trainer(P=4)
        load_checkpoint(path, tr2)
        p_restored = tr2.eval_panel(6, panel_seed=11)
    np.testing.assert_array_equal(p_orig, p_restored)
