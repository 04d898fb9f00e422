"""CLI entry points (python -m dfd_tpu)."""

import numpy as np

from dfd_tpu.__main__ import main


def test_cli_train_vectorized(tmp_path, capsys):
    ckpt = str(tmp_path / "c.npz")
    rc = main(
        [
            "train", "--env", "SimpleTrapEnv-v0", "--epochs", "2",
            "--batch-size", "4", "--zeta-size", "8", "--history-size", "4",
            "--quiet", "--checkpoint", ckpt,
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "Noisy Reward" in out
    import os

    assert os.path.exists(ckpt)


def test_cli_train_resume(tmp_path, capsys):
    ckpt = str(tmp_path / "c.npz")
    main(["train", "--env", "SimpleTrapEnv-v0", "--epochs", "1", "--batch-size", "4",
          "--zeta-size", "8", "--history-size", "4", "--quiet", "--checkpoint", ckpt])
    rc = main(["train", "--env", "SimpleTrapEnv-v0", "--epochs", "1", "--batch-size", "4",
               "--zeta-size", "8", "--history-size", "4", "--quiet", "--resume", ckpt])
    assert rc == 0
    assert "'Epoch': 2" in capsys.readouterr().out


def test_cli_train_sequential(capsys):
    rc = main(
        [
            "train", "--topology", "sequential", "--env", "SimpleTrapEnv-v0",
            "--epochs", "1", "--batch-size", "3", "--zeta-size", "6",
            "--history-size", "4", "--quiet",
        ]
    )
    assert rc == 0


def test_cli_sweep(capsys):
    rc = main(
        [
            "sweep", "--env", "SimpleTrapEnv-v0", "--trials", "2", "--epochs", "2",
            "--batch-size", "4", "--zeta-size", "8", "--history-size", "4",
        ]
    )
    assert rc == 0
    assert "best:" in capsys.readouterr().out


def test_cli_antithetic_requires_vectorized(capsys):
    rc = main(
        ["train", "--topology", "sequential", "--env", "SimpleTrapEnv-v0",
         "--epochs", "1", "--batch-size", "4", "--zeta-size", "8",
         "--history-size", "4", "--quiet", "--antithetic"]
    )
    assert rc == 2
    assert "antithetic" in capsys.readouterr().err


def test_cli_playback_recording(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = main(
        ["train", "--topology", "sequential", "--env", "SimpleTrapEnv-v0",
         "--epochs", "1", "--batch-size", "3", "--zeta-size", "8",
         "--history-size", "4", "--quiet", "--playback-id", "cli_worker"]
    )
    assert rc == 0
    path = tmp_path / "data" / "custom_novelty_playbacks" / "in_progress" / "cli_worker.txt"
    lines = path.read_text().splitlines()
    assert len(lines) >= 3  # one line per complete 201-step trap episode
    assert all(len(l.split()) == 200 for l in lines)

    # device topologies have no host action stream: reject, don't ignore
    rc = main(["train", "--env", "SimpleTrapEnv-v0", "--epochs", "1",
               "--batch-size", "4", "--quiet", "--playback-id", "x"])
    assert rc == 2


def test_cli_client_modes_run_against_a_server():
    """`client --mode fat/slice` must wire the full elastic worker from the
    CLI (round-3 surface: fat/slice were library-only before)."""
    import threading
    import time

    from dfd_tpu.runners.server import ServerRunner
    from dfd_tpu.utils.metrics import EpochReporter

    server = ServerRunner(
        env_id="SimpleTrapEnv-v0", batch_size=4, zeta_size=4,
        max_strategy_history_size=4, random_seed=5, port=0,
        noise_kind="counter", reporter=EpochReporter(quiet=True),
        timestep_limit=10_000_000,
    )
    st = threading.Thread(target=lambda: server.train(max_epochs=2), daemon=True)
    st.start()
    for _ in range(200):
        if getattr(server, "bound_port", None):
            break
        time.sleep(0.05)

    rc = main(["client", "--mode", "slice", "--port", str(server.bound_port),
               "--n-envs", "4", "--max-windows", "8"])
    assert rc == 0
    st.join(timeout=120)
    assert not st.is_alive()
    assert len(server.reporter.history) >= 1


def test_cli_profile_dir_emits_a_device_trace(tmp_path, capsys):
    """--profile-dir wraps steady-state epochs in a jax.profiler trace
    (SURVEY section 5.1's observability on the user-facing CLI)."""
    prof = tmp_path / "trace"
    rc = main(
        ["train", "--env", "SimpleTrapEnv-v0", "--epochs", "3",
         "--batch-size", "4", "--zeta-size", "8", "--history-size", "4",
         "--quiet", "--profile-dir", str(prof), "--profile-epochs", "1"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "profile: traced 1 epoch(s)" in out
    assert "'Epoch': 3" in out  # profiling must not eat epochs
    # jax.profiler writes plugins/profile/<ts>/*.trace.json.gz or .xplane.pb
    traced = list(prof.rglob("*.xplane.pb")) + list(prof.rglob("*.trace.json*"))
    assert traced, list(prof.rglob("*"))
