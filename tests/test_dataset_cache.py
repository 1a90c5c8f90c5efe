"""The mmap sidecar cache of TrajectoryDataset.from_h5 (data/dataset.py).

HDF5 gzip decode dominates dataset load time on small hosts and every
trainer/eval stage re-loads the same files; the cache must be
value-identical, respect max_episodes, skip building on limited loads,
and invalidate when the source file changes.
"""
import os

import jax
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")

from swarm_ode_tpu.data.collect import collect_data  # noqa: E402
from swarm_ode_tpu.data.dataset import TrajectoryDataset  # noqa: E402

ENV = "tarware-tiny-3agvs-2pickers-partialobs-v1"


@pytest.fixture(scope="module")
def h5file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cache") / "tiny.h5")
    collect_data(ENV, num_episodes=4, seed=0, out_path=path, batch=4,
                 chunk=50, verbose=False)
    return path


def _windows_equal(a, b, idxs):
    for i in idxs:
        for x, y in zip(a.window(i), b.window(i)):
            assert np.array_equal(
                np.asarray(x, np.float32), np.asarray(y, np.float32)
            )


def test_cache_value_parity_and_hit(h5file):
    ds_nc = TrajectoryDataset.from_h5([h5file], cache=False)
    assert not os.path.exists(h5file + ".obscache.npy")

    ds_built = TrajectoryDataset.from_h5([h5file], cache=True)
    assert os.path.exists(h5file + ".obscache.npy")
    assert os.path.exists(h5file + ".obscachemeta.npz")

    ds_hit = TrajectoryDataset.from_h5([h5file], cache=True)
    assert len(ds_nc) == len(ds_built) == len(ds_hit)
    assert ds_hit.num_agvs == ds_nc.num_agvs
    assert ds_hit.num_pickers == ds_nc.num_pickers
    _windows_equal(ds_nc, ds_hit, [0, 1, len(ds_nc) - 1])
    # position arrays (device-staging path) also agree
    for p, q in zip(ds_nc._positions, ds_hit._positions):
        assert np.array_equal(np.asarray(p), np.asarray(q))


def test_limited_load_skips_cache_build(h5file, tmp_path):
    # copy so no sidecar exists yet
    import shutil

    path = str(tmp_path / "copy.h5")
    shutil.copy(h5file, path)
    ds = TrajectoryDataset.from_h5([path], max_episodes=2, cache=True)
    assert len(ds.episodes) == 2
    assert not os.path.exists(path + ".obscache.npy")

    # full load builds it; a later limited load uses it and still truncates
    TrajectoryDataset.from_h5([path], cache=True)
    assert os.path.exists(path + ".obscache.npy")
    ds2 = TrajectoryDataset.from_h5([path], max_episodes=2, cache=True)
    assert len(ds2.episodes) == 2
    _windows_equal(ds, ds2, [0, len(ds) - 1])


def test_stale_cache_invalidated(h5file, tmp_path):
    import shutil

    path = str(tmp_path / "stale.h5")
    shutil.copy(h5file, path)
    TrajectoryDataset.from_h5([path], cache=True)
    # poke the source mtime: the sidecar must be rebuilt, not trusted
    os.utime(path, (os.path.getmtime(path) + 10,) * 2)
    meta_before = os.path.getmtime(path + ".obscachemeta.npz")
    TrajectoryDataset.from_h5([path], cache=True)
    assert os.path.getmtime(path + ".obscachemeta.npz") >= meta_before
    ds = TrajectoryDataset.from_h5([path], cache=True)
    ref = TrajectoryDataset.from_h5([path], cache=False)
    _windows_equal(ds, ref, [0, len(ref) - 1])
