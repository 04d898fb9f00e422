"""Host-env backend selection (round-5: make the measured serial/thread
crossover a reachable, self-selecting policy rather than a bench-only
finding — docs/RESULTS.md crossover table).

The reference scales host throughput with N single-threaded client
processes (reference run_client.py:15); the rebuild's fat client must pick
the right in-process backend per env family: thread-pool for C-engine-class
step costs, serial loop (or the native lockstep pool) for trivial ones.
"""

import numpy as np
import pytest

from dfd_tpu.envs.vector_host import PythonVectorEnv, ThreadPoolVectorEnv
from dfd_tpu.runners import fat_client
from dfd_tpu.runners.fat_client import (
    FatClientRunner,
    THREAD_CROSSOVER_S,
    choose_backend,
    default_vector_env,
    probe_step_cost,
)


def test_choose_backend_crossover_policy():
    # the two measured regimes (docs/RESULTS.md): MuJoCo-class ~0.4 ms ->
    # thread pays 1.7x; trivial ~0.03 ms -> serial wins
    assert choose_backend(0.4e-3, cpu_count=2) == "thread"
    assert choose_backend(0.03e-3, cpu_count=2) == "serial"
    # exactly at the threshold counts as heavy
    assert choose_backend(THREAD_CROSSOVER_S, cpu_count=2) == "thread"
    # one core has nothing to overlap, regardless of step cost
    assert choose_backend(0.4e-3, cpu_count=1) == "serial"
    # a heavy step that HOLDS the GIL (2-thread probe showed no speedup)
    # must stay serial: the pool would only add dispatch overhead
    assert choose_backend(0.4e-3, cpu_count=2, parallel_speedup=1.02) == "serial"
    assert choose_backend(0.4e-3, cpu_count=2, parallel_speedup=1.7) == "thread"


def test_default_vector_env_explicit_backends():
    thread = default_vector_env("SimpleTrapEnv-v0", 3, seed=0, backend="thread")
    assert isinstance(thread, ThreadPoolVectorEnv)
    serial = default_vector_env("SimpleTrapEnv-v0", 3, seed=0, backend="serial")
    # serial: the native lockstep pool when built, else the python loop
    assert not isinstance(serial, ThreadPoolVectorEnv)
    # both drive the same vector surface
    for vec in (thread, serial):
        obs = vec.reset_all()
        assert obs.shape[0] == 3
        o2, r, d = vec.step(np.zeros(3, np.int64))
        assert o2.shape == obs.shape and r.shape == (3,) and d.shape == (3,)
        if hasattr(vec, "close"):
            vec.close()
    with pytest.raises(ValueError):
        default_vector_env("SimpleTrapEnv-v0", 3, seed=0, backend="processes")


def test_auto_backend_applies_probe(monkeypatch):
    """auto = probe one step's cost, then (for heavy steps) the 2-thread
    GIL-release probe, then the crossover policy."""
    monkeypatch.setattr(fat_client, "probe_step_cost", lambda env_id, seed: 0.5e-3)
    monkeypatch.setattr(fat_client, "probe_parallel_speedup",
                        lambda env_id, seed: 1.8)
    monkeypatch.setattr(fat_client.os, "cpu_count", lambda: 4)
    heavy = default_vector_env("CartPole-v1", 2, seed=0, backend="auto")
    assert isinstance(heavy, ThreadPoolVectorEnv)
    heavy.close()

    # heavy but GIL-bound: threads measured no speedup -> serial
    monkeypatch.setattr(fat_client, "probe_parallel_speedup",
                        lambda env_id, seed: 1.0)
    bound = default_vector_env("CartPole-v1", 2, seed=0, backend="auto")
    assert type(bound) is PythonVectorEnv
    bound.close()

    monkeypatch.setattr(fat_client, "probe_step_cost", lambda env_id, seed: 0.01e-3)
    light = default_vector_env("CartPole-v1", 2, seed=0, backend="auto")
    assert type(light) is PythonVectorEnv
    light.close()


def test_auto_probe_resolved_once_across_lanes(monkeypatch):
    """With pipeline lanes the default factory is called once per lane;
    the (env build + jit warm + timed steps) auto probe must run ONCE."""
    calls = []

    def fake_resolve(env_id, seed):
        calls.append(env_id)
        return "serial"

    monkeypatch.setattr(fat_client, "resolve_backend", fake_resolve)
    runner = FatClientRunner(n_envs=4, pipeline_lanes=2, env_backend="auto")
    for lane in range(2):
        vec = runner._vector_env_factory("SimpleTrapEnv-v0", 2, lane * 2)
        if hasattr(vec, "close"):
            vec.close()
    assert calls == ["SimpleTrapEnv-v0"]


def test_probe_step_cost_measures_real_steps():
    cost = probe_step_cost("SimpleTrapEnv-v0", seed=0)
    assert 0 < cost < 0.1  # a trap step is sub-millisecond on any host


def test_fat_client_default_factory_carries_backend():
    """The CLI path (FatClientRunner(env_backend=...)) must reach
    default_vector_env: a fat client launched on a GIL-releasing env family
    picks the pool without custom factory code."""
    runner = FatClientRunner(n_envs=2, env_backend="thread")
    vec = runner._vector_env_factory("SimpleTrapEnv-v0", 2, 0)
    assert isinstance(vec, ThreadPoolVectorEnv)
    vec.close()


class _FakeModel:
    discrete = True
    output_shape = 4


class _SleepEnv:
    """GIL-RELEASING stand-in: time.sleep drops the GIL like a C engine."""

    def reset(self):
        return np.zeros(2, np.float32)

    def step(self, action):
        import time
        time.sleep(0.004)
        return np.zeros(2, np.float32), 0.0, False, {}


class _BusyEnv:
    """GIL-HOLDING stand-in: pure-python work, threads serialize."""

    def reset(self):
        return np.zeros(2, np.float32)

    def step(self, action):
        x = 0
        for i in range(40000):
            x += i * i
        return np.zeros(2, np.float32), 0.0, False, {}


def test_parallel_speedup_probe_discriminates_gil(monkeypatch):
    """The 2-thread probe must report a real speedup for GIL-releasing
    steps and ~none for GIL-held python steps — the distinction the
    round-5 review showed step cost alone cannot make."""
    from dfd_tpu.runners.fat_client import probe_parallel_speedup

    monkeypatch.setattr(
        fat_client, "get_init_data",
        lambda env_id, seed: (_SleepEnv(), _FakeModel(), None),
    )
    releasing = probe_parallel_speedup("fake", 0)
    assert releasing > 1.4, releasing

    monkeypatch.setattr(
        fat_client, "get_init_data",
        lambda env_id, seed: (_BusyEnv(), _FakeModel(), None),
    )
    holding = probe_parallel_speedup("fake", 0)
    assert holding < 1.35, holding
