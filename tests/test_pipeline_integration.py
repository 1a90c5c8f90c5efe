"""End-to-end pipeline: datagen -> HDF5 -> dataset -> GDE training ->
evaluation (the SURVEY.md §7 minimum slice, exercised in miniature)."""
import tempfile

import numpy as np
import pytest


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    from swarm_ode_tpu import analysis
    from swarm_ode_tpu.data.collect import collect_data
    from swarm_ode_tpu.data.dataset import TrajectoryDataset
    from swarm_ode_tpu.train.train_gde import GDETrainConfig, train_gde

    h5 = str(tmp_path / "tiny.h5")
    stats = collect_data(
        "tarware-tiny-3agvs-2pickers-partialobs-v1",
        num_episodes=2,
        seed=0,
        out_path=h5,
        batch=2,
        chunk=50,
        verbose=False,
    )
    assert stats["episodes"] == 2
    assert np.mean(stats["deliveries"]) > 3  # the dispatcher actually works

    ds = TrajectoryDataset.from_h5([h5], seq_len=5)
    assert len(ds) == 2 * 499
    ds.episodes = [ds.episodes[0][:80], ds.episodes[1][:80]]
    ds.__post_init__()

    out = train_gde(
        ds,
        GDETrainConfig(num_epochs=3, batch_size=16, hidden_dim=16),
        verbose=False,
    )
    h = out["history"]
    assert h["train_loss"][-1] < h["train_loss"][0]

    metrics = analysis.evaluate_gde(
        out["model"], out["params"], ds, indices=range(0, 60, 4)
    )
    assert "mean_error" in metrics and np.isfinite(metrics["mean_error"])
    assert 0.0 <= metrics["success_rate@2.0"] <= 1.0
