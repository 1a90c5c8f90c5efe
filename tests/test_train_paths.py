"""Device-resident training data paths equal the host-gather paths.

train_gde and train_baselines both ship (B, 2) index pairs and cut windows
on device (`train_gde._extract_windows`); these tests pin that the resident
paths reproduce the host `dataset.batch` semantics exactly, including the
zero-padded warmup and position windows.
"""
import numpy as np
import pytest

from swarm_ode_tpu.data.dataset import TrajectoryDataset
from swarm_ode_tpu.train.train_baselines import (
    BaselineTrainConfig,
    train_baseline,
)


def _toy_dataset(E=3, T=12, N=4, D=9, num_agvs=2, seed=0, integral=False):
    rng = np.random.RandomState(seed)
    eps = [rng.rand(T, N, D).astype(np.float32) * 8.0 for _ in range(E)]
    if integral:
        eps = [np.floor(e) for e in eps]
    return TrajectoryDataset(
        episodes=eps, num_agvs=num_agvs, num_pickers=N - num_agvs, seq_len=4
    )


def test_extract_windows_matches_host_batch():
    import jax.numpy as jnp

    from swarm_ode_tpu.train.train_gde import _extract_windows

    ds = _toy_dataset()
    episodes = jnp.asarray(np.stack(ds.episodes))
    positions = jnp.asarray(np.stack(ds._positions))
    idx = list(range(0, len(ds), 3))
    pairs = np.asarray(ds._index, np.int32)[idx]
    obs, count, nxt, pos = _extract_windows(
        episodes, positions, ds.seq_len,
        jnp.asarray(pairs[:, 0]), jnp.asarray(pairs[:, 1]), with_pos=True,
    )
    host = ds.batch(idx)
    np.testing.assert_allclose(np.asarray(obs), host["obs"], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(count), host["count"])
    np.testing.assert_allclose(np.asarray(nxt), host["next_pos"], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pos), host["pos"], rtol=1e-6)


def test_gde_uint8_resident_equals_float32():
    """uint8 device storage is exact for integral obs: identical losses to
    the float32 resident path (the reference-scale HBM-fit recipe)."""
    from swarm_ode_tpu.train.train_gde import GDETrainConfig, train_gde

    ds = _toy_dataset(integral=True)
    losses = []
    for dtype in ("uint8", "float32"):
        cfg = GDETrainConfig(
            num_epochs=2, batch_size=4, hidden_dim=8,
            device_dtype=dtype,
        )
        out = train_gde(ds, cfg, verbose=False)
        losses.append(out["history"]["val_loss"])
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)


def test_gde_epoch_scan_equals_host_loop():
    """The on-device epoch scan (one dispatch per epoch) reproduces the
    host per-batch loop's losses: same shuffles, same batches, same
    update order."""
    from swarm_ode_tpu.train.train_gde import GDETrainConfig, train_gde

    ds = _toy_dataset()
    losses = []
    for dev in (True, False):
        cfg = GDETrainConfig(
            num_epochs=2, batch_size=4, hidden_dim=8, device_data=dev,
        )
        out = train_gde(ds, cfg, verbose=False)
        losses.append(
            (out["history"]["train_loss"], out["history"]["val_loss"])
        )
    np.testing.assert_allclose(losses[0][0], losses[1][0], rtol=2e-5)
    np.testing.assert_allclose(losses[0][1], losses[1][1], rtol=2e-5)


def test_gde_chunked_epoch_scan_equals_whole_epoch():
    """epoch_scan_chunk splits the epoch into bounded-duration dispatches
    (the axon-tunnel crash mitigation, NOTES.md) without changing the
    math: identical loss histories to the one-dispatch epoch scan,
    including a non-dividing remainder chunk."""
    from swarm_ode_tpu.train.train_gde import GDETrainConfig, train_gde

    ds = _toy_dataset(E=4, T=14)
    losses = []
    for chunk in (0, 3):  # chunk=3 leaves a smaller remainder dispatch
        cfg = GDETrainConfig(
            num_epochs=2, batch_size=4, hidden_dim=8,
            epoch_scan_chunk=chunk,
        )
        out = train_gde(ds, cfg, verbose=False)
        losses.append(
            (out["history"]["train_loss"], out["history"]["val_loss"])
        )
    np.testing.assert_allclose(losses[0][0], losses[1][0], rtol=2e-5)
    np.testing.assert_allclose(losses[0][1], losses[1][1], rtol=2e-5)


def test_gde_chunked_scan_multi_horizon():
    """Chunking composes with horizon>1 (the config the crashes hit)."""
    from swarm_ode_tpu.train.train_gde import GDETrainConfig, train_gde

    ds = _toy_dataset(E=4, T=14)
    losses = []
    for chunk in (0, 4):
        cfg = GDETrainConfig(
            num_epochs=1, batch_size=4, hidden_dim=8, horizon=3,
            epoch_scan_chunk=chunk,
        )
        out = train_gde(ds, cfg, verbose=False)
        losses.append(out["history"]["train_loss"])
    np.testing.assert_allclose(losses[0], losses[1], rtol=2e-5)


def test_gde_uint8_rejects_non_integral():
    from swarm_ode_tpu.train.train_gde import GDETrainConfig, train_gde

    ds = _toy_dataset(integral=False)
    with pytest.raises(ValueError, match="uint8"):
        train_gde(ds, GDETrainConfig(num_epochs=1, batch_size=4,
                                     hidden_dim=8, device_dtype="uint8"),
                  verbose=False)


@pytest.mark.parametrize("model", ["gru", "pos_gru"])
def test_baseline_device_path_equals_host(model):
    ds = _toy_dataset()
    losses = []
    for dev in (True, False):
        cfg = BaselineTrainConfig(
            model=model, num_epochs=2, batch_size=8, hidden_dim=8,
            device_data=dev,
        )
        out = train_baseline(ds, cfg, verbose=False)
        losses.append(out["history"]["val_loss"])
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)


def test_checkpoint_force_overwrites_existing_step():
    """A fresh run reusing a previous run's checkpoint_dir must not crash
    on StepAlreadyExistsError: force=True deletes the stale step first."""
    import shutil
    import tempfile

    from swarm_ode_tpu.utils.checkpoint import CheckpointManager

    d = tempfile.mkdtemp()
    try:
        m = CheckpointManager(d)
        m.save(5, {"x": np.arange(3.0)}, force=True)
        m2 = CheckpointManager(d)
        m2.save(5, {"x": np.arange(3.0) * 2}, force=True)
        r = m2.restore({"x": np.zeros(3)})
        np.testing.assert_allclose(r["x"], [0.0, 2.0, 4.0])
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_gde_multi_horizon_trains():
    """horizon>1 supervises t=1..H in one solve: runs on the resident
    path, losses finite, and end-of-episode horizons are weight-masked
    (T=12 toy episodes have windows within H of the episode end)."""
    from swarm_ode_tpu.train.train_gde import GDETrainConfig, train_gde

    ds = _toy_dataset()
    cfg = GDETrainConfig(num_epochs=2, batch_size=4, hidden_dim=8,
                         horizon=3)
    out = train_gde(ds, cfg, verbose=False)
    assert all(np.isfinite(v) for v in out["history"]["train_loss"])
    assert all(np.isfinite(v) for v in out["history"]["val_loss"])


def test_gde_horizon_requires_device_path():
    from swarm_ode_tpu.train.train_gde import GDETrainConfig, train_gde
    import pytest as _pytest

    ds = _toy_dataset()
    with _pytest.raises(ValueError, match="horizon"):
        train_gde(ds, GDETrainConfig(num_epochs=1, horizon=2,
                                     device_data=False), verbose=False)


def test_gde_uniform_horizon_weights_equal_unweighted():
    """horizon_weights=(c,c,c) reproduces the unweighted loss exactly
    (weights scale numerator and denominator of the horizon mean alike),
    so the flag is a pure reweighting with no hidden normalization
    change."""
    from swarm_ode_tpu.train.train_gde import GDETrainConfig, train_gde

    outs = []
    for hw in (None, (2.0, 2.0, 2.0)):
        ds = _toy_dataset()
        cfg = GDETrainConfig(num_epochs=2, batch_size=4, hidden_dim=8,
                             horizon=3, horizon_weights=hw)
        outs.append(train_gde(ds, cfg, verbose=False))
    np.testing.assert_allclose(outs[0]["history"]["train_loss"],
                               outs[1]["history"]["train_loss"],
                               rtol=1e-6)
    np.testing.assert_allclose(outs[0]["history"]["val_loss"],
                               outs[1]["history"]["val_loss"], rtol=1e-6)


def test_gde_horizon_weights_validation():
    from swarm_ode_tpu.train.train_gde import GDETrainConfig, train_gde
    import pytest as _pytest

    ds = _toy_dataset()
    with _pytest.raises(ValueError, match="horizon_weights"):
        train_gde(ds, GDETrainConfig(num_epochs=1, horizon=3,
                                     horizon_weights=(1.0, 2.0)),
                  verbose=False)
    with _pytest.raises(ValueError, match="horizon_weights"):
        train_gde(ds, GDETrainConfig(num_epochs=1, horizon=1,
                                     horizon_weights=(1.0,)),
                  verbose=False)
