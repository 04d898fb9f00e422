"""Generic vector-env backends for the batched host evaluator.

Anything exposing ``n_envs``, ``reset_all() -> obs[N]`` and
``step(actions[N]) -> (obs[N], rew[N], done[N])`` can drive
:class:`dfd_tpu.runners.host_evaluator.BatchedHostEvaluator`:

- :class:`PythonVectorEnv` — N independent gym-surface envs stepped in a
  python loop (one FFI/python call per env per step; fine for C-engine envs
  whose step dominates);
- the native C++ pool (:mod:`dfd_tpu.envs.native_pool`) for lockstep trap
  instances with one call per batch.

Finished episodes freeze (their obs/reward stop changing) until
``reset_all``; the evaluator's per-member alive mask handles accounting.
"""

from __future__ import annotations

from typing import Callable, List

import numpy as np

from dfd_tpu.envs.wrappers import frame_of


class PythonVectorEnv:
    def __init__(self, make_env: Callable[[int], object], n_envs: int):
        self.envs: List[object] = [make_env(i) for i in range(n_envs)]
        self.n_envs = n_envs
        self._done = np.zeros(n_envs, bool)
        self._last_obs = None

    @staticmethod
    def _frame(obs) -> np.ndarray:
        # dict observations (ImpalaObsWrapper) carry reward/done alongside
        # the frame; the evaluator tracks those itself, so the vector
        # surface is frames-only
        return np.asarray(frame_of(obs))

    def reset_all(self) -> np.ndarray:
        obs = [self._frame(e.reset()) for e in self.envs]
        self._done[:] = False
        self._last_obs = np.stack(obs)
        return self._last_obs.copy()

    def step(self, actions):
        rews = np.zeros(self.n_envs, np.float32)
        dones = self._done.copy()
        for i, env in enumerate(self.envs):
            if self._done[i]:
                dones[i] = True
                continue
            obs, rew, done, _ = env.step(actions[i])
            self._last_obs[i] = self._frame(obs)
            rews[i] = rew
            dones[i] = bool(done)
            self._done[i] = bool(done)
        return self._last_obs.copy(), rews, dones
