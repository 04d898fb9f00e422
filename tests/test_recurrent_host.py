"""Recurrent models through the batched host-evaluation path: the elastic
topology's whole purpose is host-bound pixel envs (reference run_client.py),
so the fat-client evaluator must serve the flagship IMPALA policy —
batched LSTM carries on device, one lockstep device call per timestep."""

import jax
import numpy as np

from dfd_tpu.core.noise import CounterNoise
from dfd_tpu.envs.pixelgrid import PixelGridEnv
from dfd_tpu.envs.vector_host import PythonVectorEnv
from dfd_tpu.models.impala import ImpalaPolicy
from dfd_tpu.runners.host_env import HostEnv
from dfd_tpu.runners.host_evaluator import BatchedHostEvaluator
from dfd_tpu.utils.factory import get_init_data

FRAME = (3, 32, 32)
N = 4


def _vector_env(n=N):
    return PythonVectorEnv(
        lambda i: HostEnv(PixelGridEnv(grid=4, scale=8, max_steps=10), seed=100 + i), n
    )


def test_recurrent_evaluator_population():
    model = ImpalaPolicy(FRAME, 5)
    params, state = model.init(0)
    flat = model.get_flat(params)
    noise = CounterNoise(model.num_params, random_seed=1)
    ev = BatchedHostEvaluator(model, _vector_env(), noise, sigma=0.05)

    rets = ev.evaluate_population(flat, state, epoch=3, horizon=10, key=jax.random.key(0))
    assert len(rets) == N
    for i, r in enumerate(rets):
        assert r.encoded_noise == f"3,{i}"
        assert 1 <= r.timesteps <= 10
        assert np.isfinite(r.reward) and np.isfinite(r.entropy)


def test_recurrent_evaluator_carry_advances():
    """The LSTM carry must thread through the lockstep loop: a policy whose
    output depends on its recurrent state behaves differently from a
    carry-frozen one.  Proxy check: the evaluator's jitted recurrent step
    returns a carry distinct from the initial zeros after one step."""
    model = ImpalaPolicy(FRAME, 5)
    params, state = model.init(2)
    flat = jax.numpy.asarray(model.get_flat(params))
    noise = CounterNoise(model.num_params, random_seed=2)
    ev = BatchedHostEvaluator(model, _vector_env(), noise, sigma=0.0)

    pop = ev._perturb(flat, 0, 0)
    obs = ev.env.reset_all()
    carry0 = ev._init_carry(N)
    _, _, carry1 = ev._act_recurrent(
        pop, state, obs, jax.numpy.zeros(N), carry0, jax.random.key(1),
        jax.numpy.zeros(FRAME), jax.numpy.ones(FRAME),
    )
    h0, _ = carry0
    h1, _ = carry1
    assert h1.shape == (N,) + h0.shape[1:]
    assert float(np.abs(np.asarray(h1)).sum()) > 0


def test_factory_pixelgrid_impala_host():
    env, model, dist = get_init_data("PixelGridSmall-v0", 7)
    assert isinstance(model, ImpalaPolicy)
    obs = env.reset()
    assert isinstance(obs, dict) and obs["frame"].shape == FRAME
    obs2, rew, done, _ = env.step(1)
    assert np.isfinite(rew)


def test_vector_env_unwraps_dict_obs():
    vec = PythonVectorEnv(lambda i: get_init_data("PixelGridSmall-v0", i)[0], 3)
    obs = vec.reset_all()
    assert obs.shape == (3,) + FRAME
    obs, rew, done = vec.step(np.array([0, 1, 2]))
    assert obs.shape == (3,) + FRAME and rew.shape == (3,)
