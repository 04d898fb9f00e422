"""ctypes binding for the native (C++) batched env pool.

The shared library (runtime/libdfd_envpool.so, built by runtime/build.sh)
steps N environment instances per FFI call across a std::thread pool —
the native-runtime replacement for the reference's one-process-per-env
CPU-client fleet on a single host.  Gated: :func:`native_pool_available`
reports whether the library exists (or can be built).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_RUNTIME = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "runtime")
_LIB_PATH = os.path.join(_RUNTIME, "libdfd_envpool.so")


def _find_lib() -> Optional[str]:
    """Search order: explicit env var -> source checkout (runtime/) ->
    installed package (dfd_tpu/_native, populated by the wheel build)."""
    explicit = os.environ.get("DFD_ENVPOOL_LIB")
    if explicit and os.path.exists(explicit):
        return explicit
    if os.path.exists(_LIB_PATH):
        return _LIB_PATH
    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "_native", "libdfd_envpool.so",
    )
    if os.path.exists(pkg):
        return pkg
    return None


_lib = None


def _load(build_if_missing: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    path = _find_lib()
    if path is None and build_if_missing and os.path.exists(_RUNTIME):
        try:
            subprocess.run([os.path.join(_RUNTIME, "build.sh")], check=True, capture_output=True)
        except Exception:
            return None
        path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.dfd_trap_pool_create.restype = ctypes.c_void_p
    lib.dfd_trap_pool_create.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.dfd_trap_pool_destroy.argtypes = [ctypes.c_void_p]
    lib.dfd_trap_pool_reset_all.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.dfd_trap_pool_step.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
    ]
    lib.dfd_trap_pool_size.restype = ctypes.c_int
    lib.dfd_trap_pool_size.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_pool_available() -> bool:
    return _load() is not None


class NativeTrapPool:
    """N lockstep simple_trap_env instances stepped in native code."""

    def __init__(self, n_envs: int, map_path: Optional[str] = None, n_threads: Optional[int] = None):
        from dfd_tpu.envs.trap import load_walkable_grid

        lib = _load()
        if lib is None:
            raise RuntimeError("native env pool library unavailable (run runtime/build.sh)")
        self._lib = lib
        grid = np.ascontiguousarray(load_walkable_grid(map_path).astype(np.uint8))
        if n_threads is None:
            n_threads = min(os.cpu_count() or 1, 8)
        self.n_envs = n_envs
        self._handle = lib.dfd_trap_pool_create(
            grid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            grid.shape[0],
            grid.shape[1],
            n_envs,
            n_threads,
        )
        self._obs = np.empty((n_envs, 2), np.float32)
        self._rew = np.empty(n_envs, np.float32)
        self._done = np.empty(n_envs, np.uint8)

    def reset_all(self) -> np.ndarray:
        self._lib.dfd_trap_pool_reset_all(
            self._handle, self._obs.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        return self._obs.copy()

    def step(self, actions: np.ndarray, auto_reset: bool = False) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        a = np.ascontiguousarray(actions, dtype=np.int32)
        self._lib.dfd_trap_pool_step(
            self._handle,
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self._obs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._rew.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._done.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            1 if auto_reset else 0,
        )
        return self._obs.copy(), self._rew.copy(), self._done.astype(bool)

    def close(self) -> None:
        if self._handle:
            self._lib.dfd_trap_pool_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
