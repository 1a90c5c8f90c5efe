"""Byte-compatible HDF5 "reference" schema interop test (VERDICT r2 #8).

Writes real rollout episodes with HDF5Logger(schema='reference') and
asserts the exact group/dataset/attr layout of the reference logger
(/root/reference/scripts/collect_data.py:20-170):

  episode_{id:06d}/
    metadata            attrs: seed, num_agvs, num_pickers, grid_size
                        dataset: rack_locations [x, y, group]
    steps/step_{t:06d}/ datasets (gzip level 1): actions, agent_positions,
                        agent_directions, agent_busy, agent_carrying_shelf,
                        agent_targets, grid_collision_layers,
                        request_queue_ids, shelf_request_info,
                        empty_shelf_info, observations, rewards
                        attrs: info_*
    summary             dataset: episode_returns; attr: episode_length

then round-trips the file through TrajectoryDataset's group-per-step
reader path.
"""
import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from swarm_ode_tpu.config import EnvConfig  # noqa: E402
from swarm_ode_tpu.data.collect import _capture  # noqa: E402
from swarm_ode_tpu.data.dataset import TrajectoryDataset  # noqa: E402
from swarm_ode_tpu.data.hdf5_logger import HDF5Logger  # noqa: E402
from swarm_ode_tpu.env import step as step_mod  # noqa: E402
from swarm_ode_tpu.env.layout import build_layout  # noqa: E402
from swarm_ode_tpu.env.state import make_params  # noqa: E402
from swarm_ode_tpu.policies import heuristic as H  # noqa: E402

# Exact dataset-per-step key set of the reference logger
# (collect_data.py:48-66 step_data keys + 'observations' + 'rewards';
# 'step_id' becomes the group name, 'info' becomes attrs).
REF_STEP_DATASETS = {
    "actions",
    "agent_positions",
    "agent_directions",
    "agent_busy",
    "agent_carrying_shelf",
    "agent_targets",
    "grid_collision_layers",
    "request_queue_ids",
    "shelf_request_info",
    "empty_shelf_info",
    "observations",
    "rewards",
}

N_EPISODES = 2
N_STEPS = 6


@pytest.fixture(scope="module")
def ref_schema_file(tmp_path_factory):
    cfg = EnvConfig.from_env_id("tarware-tiny-3agvs-2pickers-partialobs-v1")
    lay = build_layout(cfg)
    params = make_params(cfg, lay)
    policy = H.make_policy(params, lay)

    @jax.jit
    def rollout(key):
        es = step_mod.reset(params, key)
        hs = H.init_state(params)

        def body(carry, _):
            es, hs = carry
            actions, hs = policy(params, es, hs)
            snap = _capture(params, es, actions)
            es, rew, done, info = step_mod.step(params, es, actions)
            snap["rewards"] = rew
            snap["info_shelf_deliveries"] = info["shelf_deliveries"]
            snap["info_clashes"] = info["clashes"]
            snap["info_stucks"] = info["stucks"]
            return (es, hs), snap

        _, traj = jax.lax.scan(body, (es, hs), None, length=N_STEPS)
        return traj

    path = str(tmp_path_factory.mktemp("h5") / "ref_schema.h5")
    logger = HDF5Logger(path, schema="reference")
    for ep in range(N_EPISODES):
        traj = jax.tree.map(np.asarray, rollout(jax.random.PRNGKey(ep)))
        logger.start_episode(ep, ep, params, lay.rack_locations_xyg)
        for t in range(N_STEPS):
            logger.log_step({k: v[t] for k, v in traj.items()})
        logger.end_episode()
    logger.close()
    return path, params, lay


def test_reference_group_layout(ref_schema_file):
    path, params, lay = ref_schema_file
    with h5py.File(path, "r") as f:
        assert sorted(f.keys()) == [
            f"episode_{i:06d}" for i in range(N_EPISODES)
        ]
        for i in range(N_EPISODES):
            ep = f[f"episode_{i:06d}"]
            assert sorted(ep.keys()) == ["metadata", "steps", "summary"]

            meta = ep["metadata"]
            assert meta.attrs["seed"] == i
            assert meta.attrs["num_agvs"] == params.num_agvs
            assert meta.attrs["num_pickers"] == params.num_pickers
            assert tuple(meta.attrs["grid_size"]) == (
                params.grid_h,
                params.grid_w,
            )
            racks = meta["rack_locations"][:]
            assert racks.shape == (len(lay.rack_locations_xyg), 3)
            # column layout [x, y, group] like the reference (:37-41)
            assert racks[:, 2].min() == 0

            steps = ep["steps"]
            assert sorted(steps.keys()) == [
                f"step_{t:06d}" for t in range(N_STEPS)
            ]
            summary = ep["summary"]
            assert summary.attrs["episode_length"] == N_STEPS
            returns = summary["episode_returns"][:]
            assert returns.shape == (params.num_agents,)


def test_reference_step_datasets_and_compression(ref_schema_file):
    path, params, _ = ref_schema_file
    A = params.num_agents
    with h5py.File(path, "r") as f:
        g = f["episode_000000/steps/step_000000"]
        assert set(g.keys()) == REF_STEP_DATASETS
        # info dict -> attrs prefixed info_ (collect_data.py:153-156)
        info_attrs = {k for k in g.attrs if k.startswith("info_")}
        assert {
            "info_shelf_deliveries",
            "info_clashes",
            "info_stucks",
        } <= info_attrs
        for key in REF_STEP_DATASETS:
            ds = g[key]
            assert ds.compression == "gzip", key
            assert ds.compression_opts == 1, key
        # shapes mirror the reference's per-step extraction (:48-66)
        assert g["actions"].shape == (A,)
        assert g["agent_positions"].shape == (A, 2)
        assert g["agent_directions"].shape == (A,)
        assert g["agent_busy"].shape == (A,)
        assert g["agent_carrying_shelf"].shape == (A,)
        assert g["agent_targets"].shape == (A,)
        # 4 collision layers (definitions CollisionLayers) over the grid
        assert g["grid_collision_layers"].shape == (
            4,
            params.grid_h,
            params.grid_w,
        )
        assert g["request_queue_ids"].shape == (params.request_queue_size,)
        assert g["rewards"].shape == (A,)
        obs = g["observations"]
        assert obs.shape[0] == A  # zero-padded per-agent obs rows


def test_reference_schema_roundtrip_dataset(ref_schema_file):
    path, params, _ = ref_schema_file
    ds = TrajectoryDataset.from_h5([path], seq_len=3)
    assert ds.num_agvs == params.num_agvs
    assert ds.num_pickers == params.num_pickers
    assert len(ds.episodes) == N_EPISODES
    for ep in ds.episodes:
        assert ep.shape[0] == N_STEPS
        assert ep.shape[1] == params.num_agents
    # windows exist and produce finite positions
    obs_w, count, next_pos, pos_w = ds.window(0)
    assert obs_w.shape[0] == 3 and np.isfinite(next_pos).all()
    # positions decoded from obs match the logged agent_positions stream
    with h5py.File(path, "r") as f:
        logged = np.stack(
            [
                f[f"episode_000000/steps/step_{t:06d}/agent_positions"][:]
                for t in range(N_STEPS)
            ]
        ).astype(np.float32)
    from swarm_ode_tpu.data.dataset import extract_positions_np

    decoded = extract_positions_np(ds.episodes[0], ds.num_agvs)
    np.testing.assert_allclose(decoded, logged)
