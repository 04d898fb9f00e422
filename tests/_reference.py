"""Load modules of the read-only reference implementation as test oracles.

The reference (/root/reference) is plain Python over numpy/torch, but its
packages pull in ``gym`` (not installed) and relative paths.  This helper
loads individual reference modules straight from their files, injecting
minimal package/gym stubs, so parity tests can compare dfd_tpu's behavior
against the reference's directly instead of against hand-transcribed
expectations.

Nothing here is imported by the framework itself; it is test scaffolding only.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

REF = os.environ.get("DFD_REFERENCE_PATH", "/root/reference")


def reference_available() -> bool:
    return os.path.isdir(REF)


def _install_gym_stub():
    if "gym" in sys.modules:
        return
    gym = types.ModuleType("gym")

    class Env:
        pass

    class Discrete:
        def __init__(self, n):
            self.n = n

        def seed(self, s):
            pass

        def sample(self):
            raise NotImplementedError

    class Box:
        def __init__(self, low, high, shape):
            self.low, self.high, self.shape = low, high, shape

        def seed(self, s):
            pass

    spaces = types.ModuleType("gym.spaces")
    spaces.Discrete = Discrete
    spaces.Box = Box
    gym.Env = Env
    gym.spaces = spaces
    gym.register = lambda **kw: None
    sys.modules["gym"] = gym
    sys.modules["gym.spaces"] = spaces


def _load(modname: str, relpath: str):
    path = os.path.join(REF, relpath)
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


class _FDReturnStub:
    """Duck-typed stand-in for the reference FDReturn (whose real module drags
    in generated protobuf stubs)."""

    def __init__(self):
        self.epoch = -1
        self.encoded_noise = "-1"
        self.perturbation = None
        self.reward = 0
        self.novelty = 0
        self.entropy = 0
        self.timesteps = 0
        self.is_eval = False
        self.eval_states = []
        self.obs_stats_update = []


_cache = {}


def load_reference():
    """Load and wire up the reference modules; returns a namespace object."""
    if _cache:
        return _cache["ns"]

    _install_gym_stub()

    math_helpers = _load("_ref_math_helpers", "utils/math_helpers.py")
    noise_sources = _load("_ref_noise_sources", "utils/noise_sources.py")
    adaptive_omega = _load("_ref_adaptive_omega", "utils/adaptive_omega.py")
    torch_helpers = _load("_ref_torch_helpers", "utils/torch_helpers.py")

    fake_utils = types.ModuleType("utils")
    fake_utils.math_helpers = math_helpers
    fake_utils.torch_helpers = torch_helpers
    sys.modules["utils"] = fake_utils
    sys.modules["utils.math_helpers"] = math_helpers
    sys.modules["utils.torch_helpers"] = torch_helpers

    dynamic_sgd = _load("_ref_dynamic_sgd", "dsgd/dynamic_sgd.py")
    fake_dsgd = types.ModuleType("dsgd")
    fake_dsgd.DSGD = dynamic_sgd.DSGD
    sys.modules["dsgd"] = fake_dsgd

    policy_mod = _load("_ref_policy", "policies/policy.py")
    fake_policies = types.ModuleType("policies")
    fake_policies.Policy = policy_mod.Policy
    sys.modules["policies"] = fake_policies
    discrete_mod = _load("_ref_discrete", "policies/discrete.py")
    fake_policies.DiscretePolicy = discrete_mod.DiscretePolicy
    mujoco_mod = _load("_ref_mujoco", "policies/mujoco.py")
    fake_policies.MujocoPolicy = mujoco_mod.MujocoPolicy
    atari_mod = _load("_ref_atari", "policies/atari.py")
    fake_policies.AtariPolicy = atari_mod.AtariPolicy
    impala_mod = _load("_ref_impala", "policies/impala.py")
    fake_policies.ImpalaPolicy = impala_mod.ImpalaPolicy

    fake_learner = types.ModuleType("learner")
    fake_learner.FDReturn = _FDReturnStub
    sys.modules["learner"] = fake_learner
    finite_differences = _load("_ref_finite_differences", "learner/finite_differences.py")

    agent_mod = _load("_ref_agent", "worker/agent.py")
    worker_mod = _load("_ref_worker", "worker/worker.py")

    point_mod = _load("_ref_strategy_point", "strategy/strategy_point.py")
    fake_strategy = types.ModuleType("strategy")
    fake_strategy.StrategyPoint = point_mod.StrategyPoint
    sys.modules["strategy"] = fake_strategy
    history_mod = _load("_ref_sparse_history", "strategy/sparse_history_manager.py")
    fake_strategy.SparseHistoryManager = history_mod.SparseHistoryManager
    handler_mod = _load("_ref_strategy_handler", "strategy/strategy_handler.py")

    node_mod = _load("_ref_node", "custom_envs/simple_trap_env/node.py")
    fake_trap_pkg = types.ModuleType("custom_envs.simple_trap_env")
    fake_trap_pkg.Node = node_mod.Node
    sys.modules["custom_envs.simple_trap_env"] = fake_trap_pkg
    sys.modules.setdefault("custom_envs", types.ModuleType("custom_envs"))
    tile_map_mod = _load("_ref_tile_map", "custom_envs/simple_trap_env/tile_map.py")
    fake_trap_pkg.TileMap = tile_map_mod.TileMap
    env_mod = _load("_ref_trap_environment", "custom_envs/simple_trap_env/environment.py")

    ns = types.SimpleNamespace(
        math_helpers=math_helpers,
        noise_sources=noise_sources,
        AdaptiveOmega=adaptive_omega.AdaptiveOmega,
        torch_helpers=torch_helpers,
        DSGD=dynamic_sgd.DSGD,
        Policy=policy_mod.Policy,
        DiscretePolicy=discrete_mod.DiscretePolicy,
        MujocoPolicy=mujoco_mod.MujocoPolicy,
        AtariPolicy=atari_mod.AtariPolicy,
        ImpalaPolicy=impala_mod.ImpalaPolicy,
        FiniteDifferences=finite_differences.FiniteDifferences,
        FDReturn=_FDReturnStub,
        Agent=agent_mod.Agent,
        Worker=worker_mod.Worker,
        StrategyPoint=point_mod.StrategyPoint,
        SparseHistoryManager=history_mod.SparseHistoryManager,
        StrategyHandler=handler_mod.StrategyHandler,
        TileMap=tile_map_mod.TileMap,
        TrapEnvironment=env_mod.Environment,
        map_path=os.path.join(REF, "custom_envs/simple_trap_env/map.txt"),
    )
    _cache["ns"] = ns
    return ns


def make_trap_env():
    """Construct the reference trap env without touching the filesystem.

    The reference ctor loads the map from a cwd-relative path and writes
    action playbacks on reset when opt_id is set; we chdir into the reference
    root for construction and pass opt_id=None to disable playback dumps.
    """
    ns = load_reference()
    cwd = os.getcwd()
    try:
        os.chdir(REF)
        env = ns.TrapEnvironment(opt_id=None)
    finally:
        os.chdir(cwd)
    return env
