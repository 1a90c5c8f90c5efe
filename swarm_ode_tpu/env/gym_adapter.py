"""Gymnasium-compatible adapter over the functional JAX env.

API parity with the reference `Warehouse(gym.Env)` (warehouse.py:91-766):
same constructor kwargs, same action/observation spaces, `reset(seed)`
returning the bare observation tuple (reference quirk, warehouse.py:666),
and `step` returning `terminateds` twice (warehouse.py:704).

One core, two surfaces: this class is a thin host-side shell around the
jitted pure functions — not a second implementation.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    import gymnasium as gym
    from gymnasium import spaces
except ImportError:  # pragma: no cover
    gym = None

from swarm_ode_tpu.config import EnvConfig
from swarm_ode_tpu.definitions import RewardType
from swarm_ode_tpu.env import observations, step as step_mod
from swarm_ode_tpu.env.layout import build_layout
from swarm_ode_tpu.env.state import make_params


@dataclasses.dataclass
class ShelfView:
    """Lightweight stand-in for the reference Shelf entity
    (warehouse.py:67-71): id + current coordinates."""

    id: int
    x: int
    y: int


class Warehouse(gym.Env if gym else object):
    metadata = {"render_modes": ["human", "rgb_array"]}

    def __init__(
        self,
        shelf_columns: int,
        column_height: int,
        shelf_rows: int,
        num_agvs: int,
        num_pickers: int,
        request_queue_size: int,
        max_inactivity_steps: Optional[int],
        max_steps: Optional[int],
        reward_type=RewardType.INDIVIDUAL,
        normalised_coordinates: bool = False,
        observation_type: str = "global",
        replan_mode: str = "bfs",
    ):
        self.config = EnvConfig(
            shelf_rows=shelf_rows,
            shelf_columns=shelf_columns,
            column_height=column_height,
            num_agvs=num_agvs,
            num_pickers=num_pickers,
            request_queue_size=request_queue_size,
            max_inactivity_steps=max_inactivity_steps,
            max_steps=max_steps,
            reward_type=int(reward_type),
            normalised_coordinates=normalised_coordinates,
            observation_type=observation_type,
            replan_mode=replan_mode,
        )
        self.layout = build_layout(self.config)
        self.params = make_params(self.config, self.layout)
        self._state = None
        self.renderer = None

        self.num_agvs = num_agvs
        self.num_pickers = num_pickers
        self.num_agents = num_agvs + num_pickers
        self.grid_size = self.layout.grid_size
        self.action_size = self.layout.num_actions
        # goals as (x, y) tuples; action map as {id: (y, x)} (reference
        # warehouse.py:242-249).
        self.goals: List[Tuple[int, int]] = [
            (int(x), int(y)) for (y, x) in self.layout.goals_yx
        ]
        self.action_id_to_coords_map: Dict[int, Tuple[int, int]] = {
            i + 1: (int(y), int(x))
            for i, (y, x) in enumerate(self.layout.action_cells_yx)
        }
        self.rack_groups = [
            [tuple(map(int, yx)) for yx in grp]
            for grp in _groups_from_layout(self.layout)
        ]

        if gym:
            self.action_space = spaces.Tuple(
                tuple(self.num_agents * [spaces.Discrete(self.action_size)])
            )
            agv_len, picker_len = observations.obs_lengths(self.params)
            lens = [agv_len] * num_agvs + [picker_len] * num_pickers
            if num_pickers == 0:
                lens = [agv_len] * num_agvs
            self.observation_space = spaces.Tuple(
                tuple(
                    spaces.Box(-np.inf, np.inf, shape=(n,), dtype=np.float32)
                    for n in lens
                )
            )

        self._jit_reset = jax.jit(functools.partial(step_mod.reset, self.params))
        self._jit_step = jax.jit(functools.partial(step_mod.step, self.params))
        self._jit_obs = jax.jit(functools.partial(observations.observe, self.params))
        self._jit_masks = jax.jit(
            functools.partial(observations.compute_valid_action_masks, self.params)
        )
        self._jit_requested = jax.jit(
            functools.partial(observations.shelf_request_info, self.params)
        )
        self._jit_empty = jax.jit(
            functools.partial(observations.empty_shelf_info, self.params)
        )

    # ------------------------------------------------------------------
    @property
    def state(self):
        return self._state

    @property
    def request_queue(self) -> List[ShelfView]:
        sxy = np.asarray(self._state.shelf_xy)
        return [
            ShelfView(int(s), int(sxy[s - 1, 0]), int(sxy[s - 1, 1]))
            for s in np.asarray(self._state.request_queue)
        ]

    def _split_obs(self, obs_padded: np.ndarray) -> Tuple[np.ndarray, ...]:
        agv_len, picker_len = observations.obs_lengths(self.params)
        out = []
        for i in range(self.num_agents):
            n = agv_len if (i < self.num_agvs and self.num_pickers > 0) else (
                picker_len if self.num_pickers > 0 else agv_len
            )
            out.append(np.asarray(obs_padded[i, :n], dtype=np.float32))
        return tuple(out)

    def reset(self, seed: Optional[int] = None, options=None):
        if seed is not None:
            key = jax.random.PRNGKey(seed)
        elif self._state is not None:
            # Unseeded resets must differ episode to episode (the reference
            # continues the global numpy RNG stream, warehouse.py:764-766):
            # derive the next key from the previous episode's final state.
            key = jax.random.fold_in(self._state.key, 1)
        else:
            key = jax.random.PRNGKey(0)
        self._state = self._jit_reset(key)
        obs = np.asarray(self._jit_obs(self._state))
        return self._split_obs(obs)

    def step(self, macro_actions):
        actions = jnp.asarray(np.asarray(macro_actions, dtype=np.int32))
        self._state, rewards, done, info = self._jit_step(self._state, actions)
        obs = np.asarray(self._jit_obs(self._state))
        done = bool(done)
        terminateds = self.num_agents * [done]
        info = {k: np.asarray(v).tolist() if np.asarray(v).ndim else _item(v)
                for k, v in info.items()}
        # Reference quirk: terminateds returned for both slots
        # (warehouse.py:704).
        return (
            self._split_obs(obs),
            list(np.asarray(rewards, dtype=np.float64)),
            terminateds,
            terminateds,
            info,
        )

    def compute_valid_action_masks(self, pickers_to_agvs=True,
                                   block_conflicting_actions=True):
        return np.asarray(
            observations.compute_valid_action_masks(
                self.params, self._state, pickers_to_agvs,
                block_conflicting_actions,
            )
        )

    def get_shelf_request_information(self):
        return np.asarray(self._jit_requested(self._state))

    def get_empty_shelf_information(self):
        return np.asarray(self._jit_empty(self._state))

    def get_carrying_shelf_information(self):
        return (np.asarray(self._state.agent_carrying[: self.num_agvs]) > 0).tolist()

    def render(self, mode: str = "human"):
        from swarm_ode_tpu.env.rendering import render_state

        return render_state(self.params, self.layout, self._state, mode)

    def close(self):
        pass

    @property
    def unwrapped(self):
        return self


def _groups_from_layout(layout):
    groups: Dict[int, list] = {}
    for ridx, g in enumerate(layout.rack_group_action_order):
        groups.setdefault(int(g), [])
    for k, ridx in enumerate(layout.obs_rack_perm):
        x, y, g = layout.rack_locations_xyg[k]
        groups[int(g)].append((int(y), int(x)))
    return [groups[g] for g in sorted(groups)]


def _item(v):
    a = np.asarray(v)
    return a.item() if a.ndim == 0 else a.tolist()
