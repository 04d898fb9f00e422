"""True multi-process (DCN-style) SPMD: two jax.distributed processes form
one 8-device mesh; the shard_map FD combine's psum must equal the dense
single-process result.  This is the TPU-pod-slice communication pattern
exercised without a pod (SURVEY.md section 5.8)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from dfd_tpu.core.noise import CounterNoise
from dfd_tpu.fd.combine import combine_gradient

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_shard_map_combine(tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"g{i}.npy") for i in range(2)]
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(ROOT, "tests", "_multihost_worker.py"),
             str(i), str(port), outs[i]],
            cwd=ROOT,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=150)
        logs.append(out.decode())
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]

    # dense single-process oracle
    D, POP, SIGMA, EPOCH = 96, 16, 0.05, 3
    noise = CounterNoise(D, random_seed=0)
    eps = noise.generate_block(EPOCH, jnp.arange(POP))
    fitness = jnp.asarray(np.sin(np.arange(POP, dtype=np.float32)))
    expect = np.asarray(combine_gradient(eps, fitness, SIGMA))

    for path in outs:
        got = np.load(path)
        np.testing.assert_allclose(got, expect, rtol=2e-4, atol=1e-6)
