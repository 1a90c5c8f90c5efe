"""Smoke tests for the load-bearing experiment drivers (VERDICT r2 item 10).

The drivers behind the headline RESULTS.md tables (`medium_gde_ref_scale.py`,
`gde_multistep.py`, `medium_qmix_5k.py`) run here at toy scale in fresh
subprocesses with `--cpu`, so the tables stay reproducible as the package
evolves. Mirrors the reference's script surface
(/root/reference/scripts/train_gde.py, run_gnode.py) being runnable end-to-end.

The dataset-consuming smokes read the committed 4-episode tiny fixture
dataset (tests/fixtures/datasets/, ~400 KB/file) via the drivers'
--data_dir flag, so they run unconditionally — VM resets that wipe the
gitignored datasets/ no longer turn them into silent skips (round-3
VERDICT weak #5).
"""
import json
import pathlib
import os
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
FIXTURE_DATA = REPO / "tests" / "fixtures" / "datasets"
TINY_ENV = "tarware-tiny-3agvs-2pickers-partialobs-v1"


def _run(script, *flags, timeout=None):
    # Default scales for contended boxes (some build VMs have 1 CPU core and
    # run these smokes next to TPU-queue host work); override with
    # SMOKE_DRIVER_TIMEOUT.
    if timeout is None:
        timeout = int(os.environ.get("SMOKE_DRIVER_TIMEOUT", "2400"))
    proc = subprocess.run(
        [sys.executable, str(REPO / "experiments" / script), "--cpu", *flags],
        capture_output=True, text=True, timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"{script} failed\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}"
    )
    return proc


def test_gde_ref_scale_then_multistep(tmp_path):
    """Train-at-toy-scale then chain the multi-step eval off the checkpoint."""
    out = tmp_path / "gde"
    _run(
        "medium_gde_ref_scale.py", "--epochs", "1", "--max_episodes", "2",
        "--batch_size", "4", "--hidden_dim", "8", "--out_dir", str(out),
        "--env", TINY_ENV, "--data_dir", str(FIXTURE_DATA),
    )
    result = json.loads((out / "result.json").read_text())
    assert "mean_error" in result["metrics"]
    assert len(result["history"]["train_loss"]) == 1

    _run(
        "gde_multistep.py", "--run_dir", str(out), "--hidden_dim", "8",
        "--batch", "4", "--max_episodes", "4", "--max_batches", "2",
        "--env", TINY_ENV, "--data_dir", str(FIXTURE_DATA),
    )
    ms = json.loads((out / "multistep.json").read_text())
    assert set(ms) == {"h1", "h2", "h3", "h4"}
    for h in ms.values():
        assert h["gde_mean_error"] > 0
        assert h["persistence_mean_error"] > 0


def test_baselines_table_then_multistep(tmp_path):
    """Baselines trainer saves params; the multi-step eval loads them."""
    out = tmp_path / "base"
    _run(
        "medium_baselines_table.py", "--epochs", "1", "--max_episodes", "2",
        "--models", "pos_lstm", "lstm", "--hidden_dim", "8",
        "--save_params", "--out_dir", str(out),
        "--env", TINY_ENV, "--data_dir", str(FIXTURE_DATA),
    )
    assert (out / "pos_lstm_params.pkl").exists()
    assert (out / "table.md").exists()

    _run(
        "baselines_multistep.py", "--params_dir", str(out),
        "--hidden_dim", "8", "--max_episodes", "4", "--batch", "4",
        "--max_batches", "2",
        "--env", TINY_ENV, "--data_dir", str(FIXTURE_DATA),
    )
    ms = json.loads((out / "multistep.json").read_text())
    assert set(ms) == {"h1", "h2", "h3", "h4"}
    assert all("persistence_mean_error" in h for h in ms.values())


def test_coma_driver_smoke(tmp_path):
    """The COMA driver runs end-to-end with the sweep knobs + greedy probe."""
    out = tmp_path / "coma"
    _run(
        "medium_coma_curve.py",
        "--env_id", "tarware-tiny-3agvs-2pickers-partialobs-v1",
        "--num_episodes", "2", "--num_envs", "2",
        "--entropy_decay", "0.999", "--lr_critic", "2e-3",
        "--eval_every", "1", "--eval_episodes", "1", "--out_dir", str(out),
        timeout=1800,  # counterfactual-sweep compile is slow on 1 vCPU
    )
    rows = [
        json.loads(l)
        for l in (out / "coma_medium.jsonl").read_text().splitlines()
    ]
    assert rows and "pick_rate" in rows[0]
    assert any("eval_pick_rate" in r for r in rows), "greedy probe missing"


@pytest.fixture(scope="module")
def tiny_h5(tmp_path_factory):
    """A 2-episode tiny dataset shared by the BC/DAgger driver smokes."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from swarm_ode_tpu.data.collect import collect_data

    path = str(tmp_path_factory.mktemp("drv") / "tiny.h5")
    collect_data(
        "tarware-tiny-3agvs-2pickers-partialobs-v1", num_episodes=2,
        seed=0, out_path=path, batch=2, chunk=50, verbose=False,
    )
    return path


def test_bc_driver_smoke(tiny_h5, tmp_path):
    out = tmp_path / "bc"
    _run(
        "medium_bc.py", "--env", "tarware-tiny-3agvs-2pickers-partialobs-v1",
        "--files", tiny_h5, "--net", "gnn", "--hidden_dim", "8",
        "--epochs", "1", "--stride", "8", "--eval_episodes", "1",
        "--out_dir", str(out),
    )
    result = json.loads((out / "result.json").read_text())
    assert "independent" in result["eval"] and "coordinated" in result["eval"]
    assert (out / "ckpt").exists()


def test_dagger_driver_smoke(tiny_h5, tmp_path):
    out = tmp_path / "dagger"
    _run(
        "medium_dagger.py", "--env",
        "tarware-tiny-3agvs-2pickers-partialobs-v1",
        "--files", tiny_h5, "--net", "gnn", "--hidden_dim", "8",
        "--rounds", "1", "--episodes_per_round", "2", "--epochs0", "1",
        "--epochs_per_round", "1", "--stride", "8",
        "--eval_episodes", "1", "--out_dir", str(out),
    )
    result = json.loads((out / "result.json").read_text())
    assert result["rounds_log"][-1]["round"] == 0
    assert "eval" in result["rounds_log"][-1]


def test_mappo_driver_smoke(tmp_path):
    out = tmp_path / "mappo"
    _run(
        "medium_mappo.py", "--env",
        "tarware-tiny-3agvs-2pickers-partialobs-v1",
        "--net", "gnn", "--hidden_dim", "8", "--num_envs", "2",
        "--num_strides", "1", "--minibatch", "16",
        "--eval_every", "1", "--eval_episodes", "1", "--out_dir", str(out),
    )
    result = json.loads((out / "result.json").read_text())
    assert result["history"] and "pg_loss" in result["history"][0]
    assert "eval_pick_rate" in result["history"][-1]


def test_qmix_driver_smoke(tmp_path):
    """The v2 QMIX recipe driver runs end-to-end with a greedy eval probe."""
    out = tmp_path / "qmix"
    _run(
        "medium_qmix_5k.py",
        "--env_id", "tarware-tiny-3agvs-2pickers-partialobs-v1",
        "--num_episodes", "2", "--num_envs", "2", "--hidden_dim", "8",
        "--buffer_size", "3000", "--batch_size", "8", "--learn_every", "10",
        "--eval_every", "1", "--eval_episodes", "1", "--out_dir", str(out),
    )
    rows = [
        json.loads(l)
        for l in (out / "qmix_medium_5k.jsonl").read_text().splitlines()
    ]
    assert rows and "pick_rate" in rows[0] and "loss" in rows[0]
    assert any("eval_pick_rate" in r for r in rows), "greedy probe missing"
    assert (out / "ckpt").exists()


def test_export_gde_driver(tmp_path):
    """Train-at-toy-scale, then export the GDE serving blob and verify the
    driver's built-in round-trip check passes."""
    out = tmp_path / "gde"
    _run(
        "medium_gde_ref_scale.py", "--epochs", "1", "--max_episodes", "2",
        "--batch_size", "4", "--hidden_dim", "8", "--horizon", "2",
        "--checkpoint_every", "1", "--out_dir", str(out),
        "--env", TINY_ENV, "--data_dir", str(FIXTURE_DATA),
    )
    proc = _run(
        "export_gde.py", "--ckpt", str(out / "ckpt"),
        "--env", "tarware-tiny-3agvs-2pickers-partialobs-v1",
        "--hidden_dim", "8", "--horizon", "2",
    )
    assert "round-trip exact" in proc.stdout
    blob = out / "gde.stablehlo"
    assert blob.exists() and blob.stat().st_size > 1000
    meta = json.loads((out / "gde.stablehlo.json").read_text())
    assert meta["horizon"] == 2 and meta["num_agents"] == 5
