"""Environment state and device parameters as JAX pytrees.

The reference keeps mutable Python objects (Agent/Shelf/StuckCounter,
warehouse.py:17-89) and a 4-layer occupancy grid. The TPU-native design is a
struct-of-arrays pytree so the whole simulation vmaps over thousands of envs
and scans over steps.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from swarm_ode_tpu.config import EnvConfig
from swarm_ode_tpu.definitions import AgentType
from swarm_ode_tpu.env.layout import Layout, build_layout

static = lambda: struct.field(pytree_node=False)


def _default_bfs_backend(requested: str) -> str:
    """Resolve 'auto': the Pallas VMEM-resident BFS kernel on TPU backends,
    plain XLA relaxation elsewhere (CPU tests)."""
    if requested != "auto":
        return requested
    import jax

    return "xla" if jax.default_backend() == "cpu" else "pallas"


@struct.dataclass
class EnvParams:
    """Static per-layout data. Arrays are device constants; ints are
    jit-specialization keys (pytree_node=False)."""

    # --- static scalars ---
    num_agvs: int = static()
    num_pickers: int = static()
    num_agents: int = static()
    num_goals: int = static()
    num_racks: int = static()
    num_shelves: int = static()
    num_actions: int = static()  # incl. noop
    grid_h: int = static()
    grid_w: int = static()
    request_queue_size: int = static()
    max_steps: int = static()  # 0 = unlimited
    max_inactivity_steps: int = static()  # 0 = unlimited
    column_height: int = static()
    reward_type: int = static()
    normalised_coordinates: bool = static()
    observation_type: str = static()
    replan_mode: str = static()
    dynamic_bfs_iters: int = static()
    bfs_backend: str = static()  # 'pallas' (VMEM-resident kernel) | 'xla'
    bfs_kernel: str = static()  # 'int32' | 'bitpack32' pallas variant
    replan_row_frac: float = static()  # batched-replan compaction budget
    replan_rejoin: bool = static()  # exit replan mode on static-field rejoin
    deadlock_break: int = static()  # escape steps after hard abandon; 0 = off
    # --- arrays ---
    agent_type: jnp.ndarray  # (A,) int32 AgentType
    highway: jnp.ndarray  # (H, W) bool
    is_goal: jnp.ndarray  # (H, W) bool
    picker_passable: jnp.ndarray  # (H, W) bool
    action_cells: jnp.ndarray  # (T, 2) int32 (y, x); action id a -> row a-1
    goals_yx: jnp.ndarray  # (G, 2) int32
    rack_cells: jnp.ndarray  # (L, 2) int32 action order
    rack_group: jnp.ndarray  # (L,) int32
    obs_rack_perm: jnp.ndarray  # (L,) int32
    obs_rack_perm_inv: jnp.ndarray  # (L,) int32 — action idx -> obs slot
    rack_locations_xyg: jnp.ndarray  # (L, 3) int32
    cell_to_rack: jnp.ndarray  # (H, W) int32
    shelf_cells: jnp.ndarray  # (S, 2) int32 spawn cell of shelf s+1
    highway_cells: jnp.ndarray  # (Hw, 2) int32, y-major order
    # Picker-class static fields only: free-grid (AGV/AGENT) planning is
    # closed-form Manhattan (see step.static_dist_nextdir), so no table.
    field_dist_picker: jnp.ndarray  # (T, H, W) int32
    field_next_dir_picker: jnp.ndarray  # (T, H, W) int8

    @property
    def config_tuple(self) -> Tuple:
        return (self.num_agvs, self.num_pickers, self.grid_h, self.grid_w)


@struct.dataclass
class EnvState:
    """Full dynamic simulation state. All fixed-shape; vmappable."""

    agent_xy: jnp.ndarray  # (A, 2) int32 (x, y)
    agent_dir: jnp.ndarray  # (A,) int32 Direction
    agent_busy: jnp.ndarray  # (A,) bool
    agent_target: jnp.ndarray  # (A,) int32 action id, 0 = none
    agent_carrying: jnp.ndarray  # (A,) int32 shelf id, 0 = none
    agent_fixing_clash: jnp.ndarray  # (A,) int32
    agent_replan: jnp.ndarray  # (A,) bool — follow the dynamic field
    agent_has_delivered: jnp.ndarray  # (A,) bool
    agent_req_action: jnp.ndarray  # (A,) int32 — last attributed micro action
    stuck_count: jnp.ndarray  # (A,) int32
    stuck_xy: jnp.ndarray  # (A, 2) int32
    agent_break: jnp.ndarray  # (A,) int32 deadlock-escape steps remaining
    shelf_xy: jnp.ndarray  # (S, 2) int32 — position when not carried
    request_queue: jnp.ndarray  # (R,) int32 shelf ids (1-based)
    cur_steps: jnp.ndarray  # () int32
    cur_inactive: jnp.ndarray  # () int32
    key: jnp.ndarray  # PRNGKey


def make_params(config: EnvConfig, layout: Optional[Layout] = None) -> EnvParams:
    """Build device parameters from a (host) layout."""
    lay = layout or build_layout(config)
    H, W = lay.grid_size
    if config.num_pickers > 0:
        agent_type = np.array(
            [AgentType.AGV] * config.num_agvs
            + [AgentType.PICKER] * config.num_pickers,
            dtype=np.int32,
        )
    else:
        # No pickers: AGVs act as self-loading AGENTs (warehouse.py:171-175).
        agent_type = np.full(config.num_agvs, AgentType.AGENT, dtype=np.int32)

    highway_cells = np.argwhere(lay.highway).astype(np.int32)  # (Hw, 2) (y, x)

    return EnvParams(
        num_agvs=config.num_agvs,
        num_pickers=config.num_pickers,
        num_agents=config.num_agents,
        num_goals=lay.num_goals,
        num_racks=lay.num_racks,
        num_shelves=lay.num_shelves,
        num_actions=lay.num_actions,
        grid_h=H,
        grid_w=W,
        request_queue_size=config.request_queue_size,
        max_steps=config.max_steps or 0,
        max_inactivity_steps=config.max_inactivity_steps or 0,
        column_height=config.column_height,
        reward_type=config.reward_type,
        normalised_coordinates=config.normalised_coordinates,
        observation_type=config.observation_type,
        replan_mode=config.replan_mode,
        # Replan-BFS sweep count: detours around agents are local, so far
        # fewer sweeps than the grid diameter suffice — measured on medium
        # (experiments/bfs_iters.py): 32 sweeps leaves deliveries/clashes/
        # stucks unchanged vs the full diameter while cutting step time ~25%.
        # The auto default scales with layout size as the same fraction of
        # the H+W diameter that 32 is on medium (~2/3), so larger maps keep
        # equivalent coverage (see experiments/bfs_iters_large.py); override
        # with EnvConfig.dynamic_bfs_iters for exact-diameter coverage.
        dynamic_bfs_iters=(
            config.dynamic_bfs_iters
            if config.dynamic_bfs_iters
            else max(32, (2 * (H + W)) // 3)
        ),
        bfs_backend=_default_bfs_backend(config.bfs_backend),
        # 'auto': the bitpacked wavefront kernel needs the walled row to
        # fit one 32-bit lane word (ops/bfs_bitpack.py plan guard); every
        # predefined size fits (max extralarge Ws=31). On chip it is
        # bit-identical to int32 and 4.2x faster (experiments/
        # bitpack_onchip.py), so it is the default wherever it applies.
        bfs_kernel=(
            ("bitpack32" if W + 1 < 32 else "int32")
            if config.bfs_kernel == "auto"
            else config.bfs_kernel
        ),
        replan_row_frac=config.replan_row_frac,
        replan_rejoin=config.replan_rejoin,
        deadlock_break=config.deadlock_break,
        agent_type=jnp.asarray(agent_type),
        highway=jnp.asarray(lay.highway),
        is_goal=jnp.asarray(lay.is_goal_grid),
        picker_passable=jnp.asarray(lay.picker_passable),
        action_cells=jnp.asarray(lay.action_cells_yx),
        goals_yx=jnp.asarray(lay.goals_yx),
        rack_cells=jnp.asarray(lay.rack_cells_yx),
        rack_group=jnp.asarray(lay.rack_group_action_order),
        obs_rack_perm=jnp.asarray(lay.obs_rack_perm),
        obs_rack_perm_inv=jnp.asarray(np.argsort(lay.obs_rack_perm)),
        rack_locations_xyg=jnp.asarray(lay.rack_locations_xyg),
        cell_to_rack=jnp.asarray(lay.cell_to_rack),
        shelf_cells=jnp.asarray(lay.shelf_cells_yx),
        highway_cells=jnp.asarray(highway_cells),
        field_dist_picker=jnp.asarray(lay.field_dist[1]),
        field_next_dir_picker=jnp.asarray(lay.field_next_dir[1]),
    )


def agent_class(params: EnvParams) -> jnp.ndarray:
    """Path-planning class per agent: 0 = free grid (AGV/AGENT), 1 = picker."""
    return (params.agent_type == AgentType.PICKER).astype(jnp.int32)


def occupancy_grids(params: EnvParams, state: EnvState):
    """Recompute the four collision layers from state.

    Mirrors `_recalc_grid` (reference warehouse.py:319-330): agent-id grids
    per layer, non-carried shelf ids, and carried shelf ids at carrier
    positions. Uses scatter-max so simultaneous same-cell occupants resolve
    deterministically (highest id wins).
    """
    H, W = params.grid_h, params.grid_w
    A = params.num_agents
    ax, ay = state.agent_xy[:, 0], state.agent_xy[:, 1]
    agent_ids = jnp.arange(1, A + 1, dtype=jnp.int32)
    is_picker = params.agent_type == AgentType.PICKER

    agv_grid = jnp.zeros((H, W), jnp.int32).at[ay, ax].max(
        jnp.where(~is_picker, agent_ids, 0)
    )
    picker_grid = jnp.zeros((H, W), jnp.int32).at[ay, ax].max(
        jnp.where(is_picker, agent_ids, 0)
    )

    shelf_ids = jnp.arange(1, params.num_shelves + 1, dtype=jnp.int32)
    carried = jnp.zeros(params.num_shelves + 1, jnp.bool_).at[
        state.agent_carrying
    ].set(True)[1:]
    sx, sy = state.shelf_xy[:, 0], state.shelf_xy[:, 1]
    shelf_grid = jnp.zeros((H, W), jnp.int32).at[sy, sx].max(
        jnp.where(~carried, shelf_ids, 0)
    )
    carried_grid = jnp.zeros((H, W), jnp.int32).at[ay, ax].max(state.agent_carrying)
    return agv_grid, picker_grid, shelf_grid, carried_grid
