"""Elastic control plane: wire codec round-trips, server/client protocol,
and a live end-to-end distributed training smoke test (server + client
threads in-process over localhost, like the reference's de-facto harness)."""

import threading
import time

import numpy as np
import pytest

from dfd_tpu.distributed import FDClient, FDServer
from dfd_tpu.distributed import wire
from dfd_tpu.fd.returns import FDReturn, FDState


def _state(epoch=0, experiment="exp1", cfg=None):
    return FDState(
        strategy_frames=np.random.RandomState(0).rand(4, 2).astype(np.float32),
        strategy_history=np.random.RandomState(1).rand(3, 4, 9).astype(np.float32),
        policy_params=np.random.RandomState(2).rand(100).astype(np.float32),
        epoch=epoch,
        experiment_id=experiment,
        obs_stats=[0.0] * 5,
        cfg=cfg or {"env_id": "SimpleTrapEnv-v0", "random_seed": 7},
    )


def test_wire_state_roundtrip():
    s = _state()
    d = wire.decode_state(wire.encode_state(s), cfg=s.cfg)
    np.testing.assert_array_equal(d.policy_params, s.policy_params)
    np.testing.assert_array_equal(d.strategy_frames, s.strategy_frames)
    np.testing.assert_array_equal(d.strategy_history, s.strategy_history)
    assert d.epoch == s.epoch and d.experiment_id == s.experiment_id
    assert d.obs_stats == s.obs_stats


def test_wire_returns_roundtrip():
    rets = [
        FDReturn(epoch=3, encoded_noise="123,456", reward=1.5, novelty=0.2, entropy=0.8, timesteps=201),
        FDReturn(epoch=3, encoded_noise="0", reward=-2.0, is_eval=True,
                 eval_states=np.random.RandomState(3).rand(5, 2).astype(np.float32),
                 obs_stats_update=[1.0, 2.0, 3.0]),
    ]
    out = wire.decode_returns(wire.encode_returns(rets))
    assert out[0].encoded_noise == "123,456" and out[0].reward == 1.5 and not out[0].is_eval
    assert out[1].is_eval and out[1].obs_stats_update == [1.0, 2.0, 3.0]
    np.testing.assert_array_equal(out[1].eval_states, rets[1].eval_states)


def test_server_client_protocol():
    server = FDServer(_state(epoch=0))
    port = server.start(port=0)
    try:
        client = FDClient()
        client.connect(port=port)

        # first contact: NEW_EXPERIMENT (config fetched, seed minted)
        assert client.get_server_state() == FDClient.NEW_EXPERIMENT_FLAG
        assert client.current_state.cfg["env_id"] == "SimpleTrapEnv-v0"
        seed1 = client.current_state.cfg["random_seed"]

        # second client gets a distinct seed (elastic membership mechanism)
        client2 = FDClient()
        client2.connect(port=port)
        assert client2.get_server_state() == FDClient.NEW_EXPERIMENT_FLAG
        assert client2.current_state.cfg["random_seed"] == seed1 + 1

        # no change -> OPERATION_SUCCESSFUL
        assert client.get_server_state() == FDClient.OPERATION_SUCCESSFUL_FLAG

        # epoch bump -> NEW_STATE
        server.update(_state(epoch=1))
        assert client.get_server_state() == FDClient.NEW_STATE_FLAG
        assert client.current_state.epoch == 1

        # returns flow in and come back LIFO with staleness classification
        client.submit_returns(
            [
                FDReturn(epoch=1, encoded_noise="a", reward=1.0, timesteps=10),
                FDReturn(epoch=0, encoded_noise="b", reward=2.0, timesteps=10),
                FDReturn(epoch=1, encoded_noise="c", reward=3.0, timesteps=10, is_eval=True),
            ]
        )
        rets, ts, n_delayed, n_discarded = server.get_returns_batch(
            batch_size=2, current_epoch=1, max_delayed_return=5
        )
        assert ts == 30 and n_delayed == 1 and n_discarded == 0
        assert len(rets) == 3  # 2 non-eval + eval rides along

        # experiment change -> NEW_EXPERIMENT again
        server.update(_state(epoch=1, experiment="exp2"))
        assert client.get_server_state() == FDClient.NEW_EXPERIMENT_FLAG
        client.disconnect()
        client2.disconnect()
    finally:
        server.stop(grace=0)


def test_discard_too_old_returns():
    server = FDServer(_state(epoch=10))
    port = server.start(port=0)
    try:
        client = FDClient()
        client.connect(port=port)
        # LIFO: submit newest first so the stale return is popped first
        client.submit_returns(
            [
                FDReturn(epoch=10, encoded_noise="new", reward=0.0, timesteps=5),
                FDReturn(epoch=1, encoded_noise="old", reward=0.0, timesteps=5),
            ]
        )
        rets, ts, n_delayed, n_discarded = server.get_returns_batch(
            batch_size=1, current_epoch=10, max_delayed_return=3
        )
        assert n_discarded == 1 and len(rets) == 1
        client.disconnect()
    finally:
        server.stop(grace=0)


def test_client_rpc_failure_flag():
    client = FDClient()
    client.connect(port=1)  # nothing listening
    assert client.get_server_state() == FDClient.RPC_FAILED_FLAG


def test_distributed_training_end_to_end():
    """Server runner + elastic client thread actually train on the trap env."""
    from dfd_tpu.runners.client import ClientRunner
    from dfd_tpu.runners.server import ServerRunner
    from dfd_tpu.utils.metrics import EpochReporter

    reporter = EpochReporter(quiet=True)
    server = ServerRunner(
        env_id="SimpleTrapEnv-v0",
        batch_size=4,
        zeta_size=4,
        max_strategy_history_size=4,
        normalize_obs=False,
        random_seed=11,
        port=0,
        reporter=reporter,
        timestep_limit=10_000_000,
    )

    result = {}

    def client_main():
        # wait for the server to bind
        for _ in range(100):
            if getattr(server, "bound_port", None):
                break
            time.sleep(0.05)
        runner = ClientRunner(port=server.bound_port, collect_window_s=0.001)
        result["ok"] = runner.run(max_iterations=40)

    ct = threading.Thread(target=client_main, daemon=True)
    st = threading.Thread(target=lambda: server.train(max_epochs=3), daemon=True)
    st.start()
    ct.start()
    st.join(timeout=120)
    assert not st.is_alive(), "server loop did not finish"
    assert len(reporter.history) >= 1
    row = reporter.history[0]
    assert np.isfinite(row["Noisy Reward"])
    assert "Delayed Ratio" in row and "Discarded Returns" in row
    ct.join(timeout=30)


def test_fat_client_distributed_training():
    """A fat client (batched host evaluator) trains against a counter-noise
    server end-to-end, with noise regenerated server-side from member ids."""
    from dfd_tpu.runners.fat_client import FatClientRunner
    from dfd_tpu.runners.server import ServerRunner
    from dfd_tpu.utils.metrics import EpochReporter

    reporter = EpochReporter(quiet=True)
    server = ServerRunner(
        env_id="SimpleTrapEnv-v0",
        batch_size=6,
        zeta_size=4,
        max_strategy_history_size=4,
        normalize_obs=False,
        random_seed=21,
        port=0,
        noise_kind="counter",
        reporter=reporter,
        timestep_limit=10_000_000,
    )

    result = {}

    def client_main():
        for _ in range(100):
            if getattr(server, "bound_port", None):
                break
            time.sleep(0.05)
        runner = FatClientRunner(n_envs=8, port=server.bound_port)
        result["runner"] = runner
        result["ok"] = runner.run(max_windows=30)

    ct = threading.Thread(target=client_main, daemon=True)
    st = threading.Thread(target=lambda: server.train(max_epochs=3), daemon=True)
    st.start()
    ct.start()
    st.join(timeout=120)
    assert not st.is_alive(), "server loop did not finish"
    assert len(reporter.history) >= 1
    assert np.isfinite(reporter.history[0]["Noisy Reward"])
    # no returns were discarded as undecodable: the shared counter noise
    # regenerated every member server-side
    assert server.learner.discarded_returns == 0
    ct.join(timeout=30)
    # worker-side observability: per-window stage keys (SURVEY section 5.1)
    assert {"_stage/rollout", "_stage/submit"} <= set(result["runner"].last_stages)


def test_thin_client_against_counter_server():
    """A thin (sequential) client joined to a counter-mode server must encode
    decodable member ids (reviewer finding: PCG64 encodings would crash the
    counter learner's decode)."""
    from dfd_tpu.runners.client import ClientRunner
    from dfd_tpu.runners.server import ServerRunner
    from dfd_tpu.utils.metrics import EpochReporter

    reporter = EpochReporter(quiet=True)
    server = ServerRunner(
        env_id="SimpleTrapEnv-v0", batch_size=3, zeta_size=4,
        max_strategy_history_size=4, normalize_obs=False, random_seed=31,
        port=0, noise_kind="counter", reporter=reporter, timestep_limit=10_000_000,
    )

    def client_main():
        for _ in range(100):
            if getattr(server, "bound_port", None):
                break
            time.sleep(0.05)
        ClientRunner(port=server.bound_port, collect_window_s=0.001).run(max_iterations=40)

    ct = threading.Thread(target=client_main, daemon=True)
    st = threading.Thread(target=lambda: server.train(max_epochs=2), daemon=True)
    st.start()
    ct.start()
    st.join(timeout=120)
    assert not st.is_alive(), "server loop did not finish"
    assert server.learner.discarded_returns == 0
    assert len(reporter.history) >= 1
    ct.join(timeout=30)


def test_fat_client_impala_pixelgrid_e2e():
    """The recurrent flagship through the elastic topology: an IMPALA fat
    client (batched LSTM carries on device) trains against a counter-noise
    server on the JAX-native pixel grid — the deployment shape of
    BASELINE config [4] (reference run_client.py's host-bound worker role)."""
    from dfd_tpu.runners.fat_client import FatClientRunner
    from dfd_tpu.runners.server import ServerRunner
    from dfd_tpu.utils.metrics import EpochReporter

    reporter = EpochReporter(quiet=True)
    server = ServerRunner(
        env_id="PixelGridSmall-v0",
        batch_size=4,
        zeta_size=4,
        max_strategy_history_size=4,
        normalize_obs=False,
        random_seed=11,
        port=0,
        noise_kind="counter",
        reporter=reporter,
        timestep_limit=10_000_000,
        eval_prob=0.5,
    )

    result = {}

    def client_main():
        for _ in range(200):
            if getattr(server, "bound_port", None):
                break
            time.sleep(0.05)
        runner = FatClientRunner(n_envs=4, port=server.bound_port)
        result["ok"] = runner.run(max_windows=20)

    ct = threading.Thread(target=client_main, daemon=True)
    st = threading.Thread(target=lambda: server.train(max_epochs=2), daemon=True)
    st.start()
    ct.start()
    st.join(timeout=300)
    assert not st.is_alive(), "server loop did not finish"
    assert len(reporter.history) >= 1
    assert np.isfinite(reporter.history[0]["Noisy Reward"])
    assert server.learner.discarded_returns == 0
    ct.join(timeout=60)


def test_slice_client_stale_shard_drift_correction_oracle():
    """A counter-encoded shard arriving at epoch k-Delta must be
    drift-corrected exactly: lambda = sigma*eps(k-Delta, m) +
    (theta_hist[k-Delta] - theta_now), perturbation = lambda/||lambda||^2
    (reference learner/finite_differences.py:80-92, 105-112)."""
    from dfd_tpu.core.noise import CounterNoise
    from dfd_tpu.fd import AdaptiveOmega, DSGD, FDLearner

    d, sigma = 40, 0.1
    rng = np.random.RandomState(0)
    flat0 = rng.randn(d).astype(np.float32)
    noise = CounterNoise(d, random_seed=9)
    learner = FDLearner(flat0, DSGD(d, lr=0.05), AdaptiveOmega(), noise,
                        noise_std=sigma, max_delayed_return=5)

    history = {0: learner.flat.copy()}
    # advance 3 epochs with fresh (epoch-current) counter shards
    for epoch in range(3):
        rets = [
            FDReturn(epoch=epoch, encoded_noise=f"{epoch},{m}",
                     reward=float(rng.randn()), timesteps=10)
            for m in range(6)
        ]
        assert learner.step(rets, 0.0, 0.0, 0.0) > 0
        history[learner.epoch] = learner.flat.copy()

    # now submit one shard tagged epoch 1 (Delta = 2)
    stale = FDReturn(epoch=1, encoded_noise="1,777", reward=1.0, timesteps=10)
    fresh = [
        FDReturn(epoch=3, encoded_noise=f"3,{m}", reward=float(rng.randn()), timesteps=10)
        for m in range(3)
    ]
    theta_now = learner.flat.copy()
    assert learner.step([stale] + fresh, 0.0, 0.0, 0.0) > 0
    assert learner.discarded_returns == 0

    eps = np.asarray(CounterNoise(d, random_seed=9).generate(1, 777))
    lam = eps * sigma + (history[1] - theta_now)
    # ret.perturbation holds the drift-corrected lambda; the 1/||lambda||^2
    # normalization is applied to the combine list, not the return object
    np.testing.assert_allclose(np.asarray(stale.perturbation), lam, rtol=1e-5, atol=1e-7)

    # a shard older than the history window is discarded, not corrected
    too_old = FDReturn(epoch=-3, encoded_noise="-3,1", reward=1.0, timesteps=10)
    learner.step([too_old] + [
        FDReturn(epoch=4, encoded_noise=f"4,{m}", reward=float(rng.randn()), timesteps=10)
        for m in range(3)
    ], 0.0, 0.0, 0.0)
    assert learner.discarded_returns == 1


def test_slice_client_distributed_training_with_staleness():
    """The vectorized on-device engine as ONE elastic client (docs/ASYNC.md
    section 2): population shards evaluated under vmap(P) x scan(T) feed the
    counter-noise server; applying broadcasts only every 3rd window forces
    shards to land epochs late, exercising the live drift-correction path
    (Delayed Ratio > 0) without any discards."""
    from dfd_tpu.runners.slice_client import SliceClientRunner
    from dfd_tpu.runners.server import ServerRunner
    from dfd_tpu.utils.metrics import EpochReporter

    reporter = EpochReporter(quiet=True)
    server = ServerRunner(
        env_id="SimpleTrapEnv-v0",
        batch_size=6,
        zeta_size=4,
        max_strategy_history_size=4,
        normalize_obs=False,
        random_seed=41,
        port=0,
        noise_kind="counter",
        reporter=reporter,
        timestep_limit=10_000_000,
    )

    result = {}

    def client_main():
        for _ in range(200):
            if getattr(server, "bound_port", None):
                break
            time.sleep(0.05)
        runner = SliceClientRunner(n_members=6, port=server.bound_port,
                                   apply_state_every=3)
        result["ok"] = runner.run(max_windows=40)

    ct = threading.Thread(target=client_main, daemon=True)
    st = threading.Thread(target=lambda: server.train(max_epochs=4), daemon=True)
    st.start()
    ct.start()
    st.join(timeout=300)
    assert not st.is_alive(), "server loop did not finish"
    assert len(reporter.history) >= 2
    assert np.isfinite(reporter.history[0]["Noisy Reward"])
    # stale shards were drift-corrected, never discarded
    assert server.learner.discarded_returns == 0
    assert any(row["Delayed Ratio"] > 0 for row in reporter.history), (
        [row["Delayed Ratio"] for row in reporter.history]
    )
    ct.join(timeout=60)


def test_two_slice_clients_scale_out_elastically():
    """Elastic scale-out of the flagship topology: TWO device slices join the
    same counter-noise server.  Per-client seed minting (reference
    server.py:144-149's GetConfig seed++) must give the shards disjoint
    member-id streams — every return decodable, none discarded, and the
    learner consumes work from both."""
    from dfd_tpu.runners.slice_client import SliceClientRunner
    from dfd_tpu.runners.server import ServerRunner
    from dfd_tpu.utils.metrics import EpochReporter

    reporter = EpochReporter(quiet=True)
    server = ServerRunner(
        env_id="SimpleTrapEnv-v0", batch_size=8, zeta_size=4,
        max_strategy_history_size=4, random_seed=47, port=0,
        noise_kind="counter", reporter=reporter, timestep_limit=10_000_000,
    )

    runners, results = {}, {}

    def client_main(tag):
        for _ in range(200):
            if getattr(server, "bound_port", None):
                break
            time.sleep(0.05)
        # pace windows 1:1 with broadcasts so neither shard hogs the batch
        # while the other is still compiling (full-suite machines are loaded)
        runner = SliceClientRunner(n_members=4, port=server.bound_port,
                                   wait_for_new_state=True, state_wait_timeout=10)
        runners[tag] = runner
        results[tag] = runner.run(max_windows=40, reconnect_attempts=3)

    threads = [threading.Thread(target=client_main, args=(t,), daemon=True)
               for t in ("a", "b")]
    st = threading.Thread(target=lambda: server.train(max_epochs=6), daemon=True)
    st.start()
    for t in threads:
        t.start()
    st.join(timeout=300)
    assert not st.is_alive(), "server loop did not finish"
    for t in threads:
        t.join(timeout=60)

    assert len(reporter.history) >= 2
    assert server.learner.discarded_returns == 0
    # both shards drew distinct per-client seeds -> disjoint member offsets
    seeds = {runners["a"]._seed, runners["b"]._seed}
    assert len(seeds) == 2, seeds
    # both clients configured and contributed at least one window; how the
    # 4 epochs' worth of returns split between them is scheduler timing
    # (under a loaded machine one client can compile late), not a property
    assert runners["a"].windows >= 1 and runners["b"].windows >= 1, (
        runners["a"].windows, runners["b"].windows,
    )


def test_slice_client_full_duties_obs_stats_zeta_omega_novelty():
    """A slice-ONLY deployment must not silently lose reference capabilities
    (round-2 verdict): population Welford deltas advance the server's global
    obs statistics (reference worker/agent.py:38-39 -> run_server.py:143),
    the fused deterministic eval member refreshes zeta and steps omega
    (reference worker/worker.py:34-35, run_sequential.py:137-151), and every
    member ships device-computed novelty (reference worker/worker.py:53)."""
    from dfd_tpu.runners.slice_client import SliceClientRunner
    from dfd_tpu.runners.server import ServerRunner
    from dfd_tpu.utils.metrics import EpochReporter

    reporter = EpochReporter(quiet=True)
    server = ServerRunner(
        env_id="SimpleTrapEnv-v0",
        batch_size=6,
        zeta_size=4,
        max_strategy_history_size=4,
        normalize_obs=True,
        obs_stats_update_chance=0.2,
        random_seed=43,
        port=0,
        noise_kind="counter",
        reporter=reporter,
        timestep_limit=10_000_000,
    )
    initial_obs_count = server.global_obs_stats.count
    initial_zeta = np.array(server.zeta, copy=True)

    result = {}

    def client_main():
        for _ in range(200):
            if getattr(server, "bound_port", None):
                break
            time.sleep(0.05)
        # pace windows against broadcasts so each window sees the newest
        # archive/zeta (the pure-async default can burn all its windows at
        # epoch 0 before the first broadcast lands)
        runner = SliceClientRunner(
            n_members=6, port=server.bound_port, wait_for_new_state=True,
        )
        result["runner"] = runner
        result["ok"] = runner.run(max_windows=40, reconnect_attempts=3)

    ct = threading.Thread(target=client_main, daemon=True)
    st = threading.Thread(target=lambda: server.train(max_epochs=5), daemon=True)
    st.start()
    ct.start()
    st.join(timeout=300)
    assert not st.is_alive(), "server loop did not finish"
    assert len(reporter.history) >= 2

    # distributed observation statistics advanced past the seed buffer
    assert server.global_obs_stats.count > initial_obs_count, (
        server.global_obs_stats.count, initial_obs_count,
    )
    # zeta was refreshed by the slice's eval states
    assert not np.array_equal(np.asarray(server.zeta), initial_zeta)
    # omega stepped (its reward history only advances on eval epochs)
    assert len(server.omega.reward_history) > 0
    # per-member novelty flowed once the archive had >= 2 entries
    assert any(row["Noisy Novelty"] > 0 for row in reporter.history), (
        [row["Noisy Novelty"] for row in reporter.history]
    )
    # the eval EMA is live (None would mean no eval return ever landed)
    assert server.policy_reward is not None
    assert server.learner.discarded_returns == 0
    ct.join(timeout=60)
    # worker-side observability: per-window stage keys (SURVEY section 5.1)
    assert {"_stage/rollout", "_stage/submit"} <= set(result["runner"].last_stages)


def test_fat_client_population_obs_stats_flow():
    """Fat-client population episodes must sample and ship per-member Welford
    deltas (not only the rare eval episode) so a normalize_obs server's
    statistics keep advancing (reference worker/worker.py:47-57)."""
    from dfd_tpu.runners.fat_client import FatClientRunner
    from dfd_tpu.runners.server import ServerRunner
    from dfd_tpu.utils.metrics import EpochReporter

    reporter = EpochReporter(quiet=True)
    server = ServerRunner(
        env_id="SimpleTrapEnv-v0",
        batch_size=6,
        zeta_size=4,
        max_strategy_history_size=4,
        normalize_obs=True,
        obs_stats_update_chance=0.2,
        random_seed=44,
        port=0,
        noise_kind="counter",
        reporter=reporter,
        timestep_limit=10_000_000,
        eval_prob=0.0,  # NO eval episodes: stats must flow from the population
    )
    initial_obs_count = server.global_obs_stats.count

    def client_main():
        for _ in range(200):
            if getattr(server, "bound_port", None):
                break
            time.sleep(0.05)
        FatClientRunner(n_envs=8, port=server.bound_port).run(max_windows=30)

    ct = threading.Thread(target=client_main, daemon=True)
    st = threading.Thread(target=lambda: server.train(max_epochs=3), daemon=True)
    st.start()
    ct.start()
    st.join(timeout=300)
    assert not st.is_alive(), "server loop did not finish"
    assert server.global_obs_stats.count > initial_obs_count
    assert server.learner.discarded_returns == 0
    ct.join(timeout=60)


def test_client_survives_server_crash_and_retargets():
    """Fault injection the reference never had (SURVEY 5.3): the learner
    process dies mid-run; the client rides its reconnect loop until a NEW
    server binds the same port under a NEW experiment id, then retargets in
    place (reference run_client.py:60-94 semantics) and keeps contributing."""
    from dfd_tpu.runners.client import ClientRunner
    from dfd_tpu.runners.policy import HostPolicy
    from dfd_tpu.utils.factory import get_init_data

    _env, model, _dist = get_init_data("SimpleTrapEnv-v0", 5)
    cfg = {
        "env_id": "SimpleTrapEnv-v0", "noise_std": 0.02, "normalize_obs": False,
        "obs_stats_update_chance": 0.01, "random_seed": 5, "eval_prob": 0.05,
        "max_strategy_history_size": 4, "noise_kind": "pcg", "antithetic": False,
        "noise_seed": 5,
    }

    def make_state(experiment):
        return FDState(
            strategy_frames=np.zeros((4, 2), np.float32),
            strategy_history=np.zeros((1, 4, 9), np.float32),
            policy_params=HostPolicy(model, seed=5).serialize(),
            epoch=0, experiment_id=experiment, obs_stats=[0.0] * 5, cfg=dict(cfg),
        )

    def wait_returns(srv, timeout):
        t0 = time.time()
        while time.time() - t0 < timeout:
            with srv.interface._lock:
                if srv.interface._returns:
                    return
            time.sleep(0.05)
        raise AssertionError("no returns arrived")

    srv1 = FDServer(make_state("expA"))
    port = srv1.start(port=0)

    runner = ClientRunner(port=port, collect_window_s=0.002)
    result = {}
    t = threading.Thread(
        target=lambda: result.setdefault("ok", runner.run(reconnect_attempts=30)),
        daemon=True,
    )
    t.start()
    try:
        wait_returns(srv1, timeout=60.0)
        srv1.stop(grace=0)  # crash the learner mid-run

        time.sleep(0.5)  # client hits RPC_FAILED and enters its reconnect loop
        srv2 = FDServer(make_state("expB"))
        for _ in range(40):  # the freed port can take a moment to rebind
            try:
                srv2.start(port=port)
                break
            except Exception:
                time.sleep(0.25)
        try:
            wait_returns(srv2, timeout=60.0)
            # recovery retargets before the next submit, so every return the
            # new server sees comes from the reconfigured expB worker
            assert runner.client.current_state.experiment_id == "expB"
        finally:
            runner.request_stop()
            t.join(timeout=30)
            srv2.stop(grace=0)
        assert not t.is_alive()
        assert result["ok"] is True
    finally:
        runner.request_stop()


def test_slice_client_population_chunking_matches_dense():
    """population_chunk on the slice client (round 4: the production-width
    escape hatch reaches the flagship elastic topology) must produce the
    IDENTICAL window — same member rewards/novelty/steps, same fused eval
    episode, same merged Welford delta — as the dense shard evaluation."""
    from dfd_tpu.runners.slice_client import SliceClientRunner

    cfg = dict(
        noise_kind="counter", env_id="SimpleTrapEnv-v0", random_seed=7,
        noise_std=0.05, normalize_obs=True, obs_stats_update_chance=0.5,
        max_strategy_history_size=4, noise_seed=123,
    )

    def window(chunk):
        r = SliceClientRunner(n_members=8, population_chunk=chunk)
        r._configure(cfg)
        params, _ = r.model.init(3)
        r.flat = r.model.get_flat(params)
        r.epoch = 2
        rng = np.random.RandomState(0)
        r.zeta = rng.rand(4, *r.env.obs_shape).astype(np.float32)
        F = r.model.output_shape
        r.archive = np.zeros((4, 4, F), np.float32)
        r.archive[:2] = rng.rand(2, 4, F).astype(np.float32)
        r.archive_count = 2  # novelty live, not the <2 guard
        r.windows = 1
        return r._collect_window()

    dense = window(None)
    chunked = window(4)
    assert len(dense) == len(chunked) == 9  # 8 members + 1 eval
    for d, c in zip(dense, chunked):
        assert d.encoded_noise == c.encoded_noise
        assert d.is_eval == c.is_eval
        assert d.timesteps == c.timesteps
        np.testing.assert_allclose(d.reward, c.reward, rtol=1e-6)
        np.testing.assert_allclose(d.novelty, c.novelty, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(d.entropy, c.entropy, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(dense[-1].eval_states), np.asarray(chunked[-1].eval_states),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(dense[0].obs_stats_update),
        np.asarray(chunked[0].obs_stats_update), rtol=1e-5,
    )


def test_slice_client_rejects_bad_chunk():
    from dfd_tpu.runners.slice_client import SliceClientRunner

    with pytest.raises(ValueError):
        SliceClientRunner(n_members=8, population_chunk=3)


def test_slice_client_chunked_pixel_e2e():
    """The flagship elastic topology runs the flagship model family at
    bounded memory: a chunked slice shard of IMPALA on a pixel env feeds the
    counter-noise server end-to-end (round-4 item: production-width models
    on slice shards go through population_chunk)."""
    from dfd_tpu.runners.slice_client import SliceClientRunner
    from dfd_tpu.runners.server import ServerRunner
    from dfd_tpu.utils.metrics import EpochReporter

    reporter = EpochReporter(quiet=True)
    server = ServerRunner(
        env_id="PixelGridSmall-v0", batch_size=4, zeta_size=4,
        max_strategy_history_size=4, random_seed=51, port=0,
        noise_kind="counter", reporter=reporter, timestep_limit=10_000_000,
    )

    result = {}

    def client_main():
        for _ in range(200):
            if getattr(server, "bound_port", None):
                break
            time.sleep(0.05)
        runner = SliceClientRunner(
            n_members=4, port=server.bound_port, population_chunk=2,
            wait_for_new_state=True, state_wait_timeout=30,
        )
        result["ok"] = runner.run(max_windows=20, reconnect_attempts=3)

    ct = threading.Thread(target=client_main, daemon=True)
    st = threading.Thread(target=lambda: server.train(max_epochs=2), daemon=True)
    st.start()
    ct.start()
    st.join(timeout=600)
    assert not st.is_alive(), "server loop did not finish"
    assert len(reporter.history) >= 1
    assert np.isfinite(reporter.history[-1]["Noisy Reward"])
    assert server.learner.discarded_returns == 0
    ct.join(timeout=60)
