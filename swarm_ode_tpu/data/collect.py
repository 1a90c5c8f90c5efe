"""Offline dataset generation: batched heuristic rollouts to HDF5.

Parity: reference scripts/collect_data.py:379-441 (heuristic episodes
logged step-by-step). TPU-native: B episodes run simultaneously under
vmap + lax.scan in chunks; each chunk is one device->host transfer
(the reference steps a single env in Python and logs per step).
"""
from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from swarm_ode_tpu.config import EnvConfig
from swarm_ode_tpu.data.hdf5_logger import HDF5Logger
from swarm_ode_tpu.env import observations, step as step_mod
from swarm_ode_tpu.env.layout import build_layout
from swarm_ode_tpu.env.state import make_params, occupancy_grids
from swarm_ode_tpu.policies import heuristic as H
from swarm_ode_tpu.utils.metrics import pick_rate


def _capture(params, state, actions):
    """Pre-step snapshot matching log_step_pre (collect_data.py:46-127).

    Dtypes are the smallest exact containers (the device->host tunnel is
    the datagen bottleneck): observations are small integers and 0/1 flags
    — exact in float16 when coordinates are unnormalised; ids fit int16;
    bitmaps fit uint8. Readers upcast (TrajectoryDataset -> float32).
    """
    agv_g, pick_g, shelf_g, carried_g = occupancy_grids(params, state)
    obs = observations.observe(params, state)
    if not params.normalised_coordinates:
        obs = obs.astype(jnp.float16)
    return {
        "actions": actions.astype(jnp.int16),
        "agent_positions": state.agent_xy.astype(jnp.int16),
        "agent_directions": state.agent_dir.astype(jnp.int8),
        "agent_busy": state.agent_busy,
        "agent_carrying_shelf": state.agent_carrying > 0,
        "agent_targets": state.agent_target.astype(jnp.int16),
        "grid_collision_layers": jnp.stack(
            [agv_g, pick_g, shelf_g, carried_g]
        ).astype(jnp.int16),
        "request_queue_ids": state.request_queue.astype(jnp.int16),
        "shelf_request_info": observations.shelf_request_info(
            params, state
        ).astype(jnp.uint8),
        "empty_shelf_info": observations.empty_shelf_info(
            params, state
        ).astype(jnp.uint8),
        "observations": obs,
    }


def collect_data(
    env_id: str,
    num_episodes: int,
    seed: int,
    out_path: Optional[str] = None,
    batch: int = 8,
    chunk: int = 100,
    verbose: bool = True,
    schema: str = "columnar",
) -> Dict:
    """Generate `num_episodes` heuristic episodes into HDF5.

    File naming matches the reference (collect_data.py:381):
    warehouse_data_{env_id}_seed{seed}.h5 unless out_path is given.
    """
    cfg = EnvConfig.from_env_id(env_id)
    lay = build_layout(cfg)
    params = make_params(cfg, lay)
    policy = H.make_policy(params, lay)
    steps = cfg.max_steps or 500
    out_path = out_path or f"warehouse_data_{env_id}_seed{seed}.h5"

    @jax.jit
    def init_batch(keys):
        es = jax.vmap(step_mod.reset, in_axes=(None, 0))(params, keys)
        hs = jax.vmap(lambda _: H.init_state(params))(jnp.arange(keys.shape[0]))
        return es, hs

    @jax.jit
    def run_chunk(es, hs):
        def one(es, hs):
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
            (es, hs), traj = jax.lax.scan(body, (es, hs), None, length=chunk)
            return es, hs, traj

        return jax.vmap(one)(es, hs)

    logger = HDF5Logger(out_path, schema=schema)
    stats = {"episodes": 0, "deliveries": [], "pick_rates": []}
    ep_done = 0
    t_start = time.time()
    while ep_done < num_episodes:
        B = min(batch, num_episodes - ep_done)
        seeds = np.arange(seed + ep_done, seed + ep_done + B)
        keys = jax.vmap(jax.random.PRNGKey)(jnp.asarray(seeds))
        es, hs = init_batch(keys)
        chunks = []
        for _ in range(int(np.ceil(steps / chunk))):
            es, hs, traj = run_chunk(es, hs)
            chunks.append(jax.tree.map(np.asarray, traj))
        # (B, T, ...) per key
        traj = {
            k: np.concatenate([c[k] for c in chunks], axis=1)[:, :steps]
            for k in chunks[0]
        }
        for b in range(B):
            logger.start_episode(
                ep_done + b, int(seeds[b]), params, lay.rack_locations_xyg
            )
            if schema == "columnar":
                # Fast path: the rollout is already stacked (T, ...) —
                # write episode slices directly, no per-step python loop.
                logger.write_columnar_episode(
                    logger._episode, {k: v[b] for k, v in traj.items()}
                )
                summary = logger._episode.create_group("summary")
                summary.create_dataset(
                    "episode_returns", data=traj["rewards"][b].sum(axis=0)
                )
                summary.attrs["episode_length"] = steps
                logger._episode = None
            else:
                for t in range(steps):
                    logger.log_step({k: v[b, t] for k, v in traj.items()})
                logger.end_episode()
            deliveries = int(traj["info_shelf_deliveries"][b].sum())
            pr = pick_rate(deliveries, steps)
            stats["deliveries"].append(deliveries)
            stats["pick_rates"].append(pr)
            if verbose:
                ret = float(traj["rewards"][b].sum())
                print(
                    f"Env: {env_id} | Seed: {seeds[b]} | Episode {ep_done + b}: "
                    f"| [Overall Pick Rate={pr:.2f}]"
                    f"| [Global return={ret:.2f}]"
                    f"| [Total shelf deliveries={deliveries:.2f}]"
                    f"| [Total clashes={int(traj['info_clashes'][b].sum()):.2f}]"
                    f"| [Total stuck={int(traj['info_stucks'][b].sum()):.2f}]"
                )
        ep_done += B
    logger.close()
    stats["episodes"] = ep_done
    stats["wall_time"] = time.time() - t_start
    if verbose:
        print(
            f"Collected {ep_done} episodes in {stats['wall_time']:.1f}s -> {out_path}"
        )
    return stats
