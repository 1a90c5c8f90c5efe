"""Observation builders, state queries, and action masks.

Parity targets:
  * global obs   — reference spaces/MultiAgentGlobalObservationSpace.py:31-81
  * partial obs  — reference spaces/MultiAgentPartialObservationSpace.py:10-114
  * state queries — reference warehouse.py:332-356
  * action masks — reference warehouse.py:727-752

Because agent types are static per index (AGVs first), each agent's
observation layout is static; we build the ragged per-agent vectors with a
trace-time Python loop and zero-pad into a single (A, obs_len_max) array.
The gym adapter slices back into the reference's tuple-of-vectors format.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from swarm_ode_tpu.definitions import Action
from swarm_ode_tpu.env.queries import occupant_max_id
from swarm_ode_tpu.env.state import EnvParams, EnvState
from swarm_ode_tpu.ops.take import take_ids


def _carried_flags(params: EnvParams, state: EnvState) -> jnp.ndarray:
    return (
        jnp.zeros(params.num_shelves + 1, jnp.bool_)
        .at[state.agent_carrying]
        .set(True)[1:]
    )


def _shelf_id_at(params: EnvParams, state: EnvState, cells_yx: jnp.ndarray):
    """(Q,) non-carried shelf id at each (y, x) query cell — gridless
    equivalent of the reference's SHELVES layer lookup."""
    on_grid = ~_carried_flags(params, state)
    return occupant_max_id(
        state.shelf_xy, on_grid, cells_yx[:, 1], cells_yx[:, 0]
    )


def obs_lengths(params: EnvParams) -> Tuple[int, int]:
    """(agv_obs_len, picker_obs_len) for the configured observation type.

    Global: both 7*A + 4*P + 2*L (Global:31-43).
    Partial: AGV 3 + 4*(A+P) + 2*L; Picker 7*A + 4*P (Partial:35-59).
    """
    A, P, L = params.num_agvs, params.num_pickers, params.num_racks
    if params.observation_type == "global":
        n = 7 * A + 4 * P + 2 * L
        return n, n
    agv_len = 3 + 4 * A + 4 * P + 2 * L
    picker_len = 7 * A + 4 * P
    return agv_len, picker_len


def _coords(params: EnvParams, yx_pairs: jnp.ndarray) -> jnp.ndarray:
    """process_coordinates (reference spaces/MultiAgentBaseObservationSpace.py:31-35).

    yx_pairs: (..., 2) float (y, x)."""
    if params.normalised_coordinates:
        scale = jnp.array(
            [1.0 / (params.grid_h - 1), 1.0 / (params.grid_w - 1)], jnp.float32
        )
        return yx_pairs * scale
    return yx_pairs


def shelf_request_info(params: EnvParams, state: EnvState) -> jnp.ndarray:
    """(L,) float: rack cell holds a requested shelf. Action-id order
    (reference warehouse.py:335-342)."""
    in_queue = (
        jnp.zeros(params.num_shelves + 1, jnp.bool_)
        .at[state.request_queue]
        .set(True)
    )
    sid = _shelf_id_at(params, state, params.rack_cells)
    return ((sid > 0) & in_queue[sid]).astype(jnp.float32)


def empty_shelf_info(params: EnvParams, state: EnvState) -> jnp.ndarray:
    """(L,) float: rack cell is free to receive a shelf — no shelf present
    and no AGV about to unload there (reference warehouse.py:344-356)."""
    ys, xs = params.rack_cells[:, 0], params.rack_cells[:, 1]
    sid = _shelf_id_at(params, state, params.rack_cells)
    # Carried shelf at the rack cell (reference CARRIED_SHELVES layer) and
    # the occupying AGV's pending action.
    eq = (state.agent_xy[None, :, 0] == xs[:, None]) & (
        state.agent_xy[None, :, 1] == ys[:, None]
    )  # (L, A)
    cid = jnp.max(jnp.where(eq, state.agent_carrying[None, :], 0), axis=1)
    is_loader = params.agent_type != 1  # AgentType.PICKER
    aid = occupant_max_id(state.agent_xy, is_loader, xs, ys)
    areq = jnp.where(
        aid > 0,
        take_ids(state.agent_req_action, jnp.maximum(aid - 1, 0)),
        Action.NOOP,
    )
    pending_unload = (cid > 0) & ((areq == Action.NOOP) | (areq == Action.TOGGLE_LOAD))
    return ((sid == 0) & ~pending_unload).astype(jnp.float32)


def carrying_shelf_info(params: EnvParams, state: EnvState) -> jnp.ndarray:
    """(num_agvs,) bool (reference warehouse.py:332-333)."""
    return state.agent_carrying[: params.num_agvs] > 0


def compute_valid_action_masks(
    params: EnvParams,
    state: EnvState,
    pickers_to_agvs: bool = True,
    block_conflicting_actions: bool = True,
) -> jnp.ndarray:
    """(A, action_size) float mask (reference warehouse.py:727-752)."""
    G, L = params.num_goals, params.num_racks
    requested = shelf_request_info(params, state)
    empty = empty_shelf_info(params, state)
    carrying = carrying_shelf_info(params, state).astype(jnp.float32)

    # Rack-cell indices targeted by AGVs / Pickers (target > G).
    t_agv = state.agent_target[: params.num_agvs]
    t_pick = state.agent_target[params.num_agvs :]
    agv_rack = jnp.where(t_agv > G, t_agv - G - 1, L)  # L = drop
    pick_rack = jnp.where(t_pick > G, t_pick - G - 1, L)

    valid_agvs = jnp.where(carrying[:, None] > 0, empty[None, :], requested[None, :])
    if pickers_to_agvs:
        valid_pickers = jnp.zeros(L, jnp.float32).at[agv_rack].set(1.0, mode="drop")
    else:
        valid_pickers = requested
    if block_conflicting_actions:
        valid_agvs = valid_agvs.at[:, agv_rack].set(0.0, mode="drop")
        valid_pickers = valid_pickers.at[pick_rack].set(0.0, mode="drop")

    masks = jnp.ones((params.num_agents, params.num_actions), jnp.float32)
    masks = masks.at[: params.num_agvs, 1 + G :].set(valid_agvs)
    masks = masks.at[: params.num_agvs, 1 : 1 + G].set(
        jnp.repeat(carrying[:, None], G, axis=1)
    )
    masks = masks.at[params.num_agvs :, 1 + G :].set(valid_pickers[None, :])
    masks = masks.at[params.num_agvs :, 1 : 1 + G].set(0.0)
    return masks


def _agent_infos(params: EnvParams, state: EnvState):
    """Per-agent info pieces shared by both obs spaces.

    Returns:
      full7: (A, 7) [carrying, carrying_requested, toggling, y, x, ty, tx]
             (only meaningful for AGV-type agents)
      pos4:  (A, 4) [y, x, ty, tx]
    """
    A = params.num_agents
    in_queue = (
        jnp.zeros(params.num_shelves + 1, jnp.bool_)
        .at[state.request_queue]
        .set(True)
    )
    carrying = state.agent_carrying > 0
    carrying_req = carrying & in_queue[state.agent_carrying]
    toggling = state.agent_req_action == Action.TOGGLE_LOAD

    own_yx = jnp.stack(
        [state.agent_xy[:, 1], state.agent_xy[:, 0]], axis=-1
    ).astype(jnp.float32)
    tgt_idx = jnp.maximum(state.agent_target - 1, 0)
    tgt_yx = params.action_cells[tgt_idx].astype(jnp.float32)
    tgt_yx = jnp.where((state.agent_target > 0)[:, None], tgt_yx, 0.0)

    own_c = _coords(params, own_yx)
    tgt_c = jnp.where(
        (state.agent_target > 0)[:, None], _coords(params, tgt_yx), 0.0
    )

    pos4 = jnp.concatenate([own_c, tgt_c], axis=-1)
    full7 = jnp.concatenate(
        [
            carrying.astype(jnp.float32)[:, None],
            carrying_req.astype(jnp.float32)[:, None],
            toggling.astype(jnp.float32)[:, None],
            pos4,
        ],
        axis=-1,
    )
    return full7, pos4


def _shelves_obs(params: EnvParams, state: EnvState) -> jnp.ndarray:
    """(2L,) [has_shelf, is_requested] per rack cell in rack-group order
    (reference Global:65-72, Partial:87-95)."""
    in_queue = (
        jnp.zeros(params.num_shelves + 1, jnp.bool_)
        .at[state.request_queue]
        .set(True)
    )
    cells = params.rack_cells[params.obs_rack_perm]  # obs order
    sid = _shelf_id_at(params, state, cells)
    has = (sid > 0).astype(jnp.float32)
    req = ((sid > 0) & in_queue[sid]).astype(jnp.float32)
    return jnp.stack([has, req], axis=-1).reshape(-1)


def observe(params: EnvParams, state: EnvState) -> jnp.ndarray:
    """All agents' observations, zero-padded to (A, max_obs_len) float32.

    Row i reproduces the reference's flat vector for agent i exactly
    (including trailing zero padding, matching collect_data.py:69-127 which
    zero-pads logged observations the same way).
    """
    A = params.num_agents
    full7, pos4 = _agent_infos(params, state)
    shelves = _shelves_obs(params, state)
    agv_len, picker_len = obs_lengths(params)
    max_len = max(agv_len, picker_len)

    is_global = params.observation_type == "global"
    rows = []
    for i in range(A):
        # Static python bool: types are fixed per index by construction
        # (AGVs first; AGENT type when there are no pickers).
        i_agv = i < params.num_agvs and params.num_pickers > 0
        pieces = []
        if is_global:
            pieces.append(full7[i] if i_agv else pos4[i])
            for j in range(A):
                if j == i:
                    continue
                j_agv = j < params.num_agvs and params.num_pickers > 0
                pieces.append(full7[j] if j_agv else pos4[j])
            pieces.append(shelves)
        else:
            if i_agv:
                # AGV: own full info, others' positional info, shelf state
                # (Partial:100-105).
                pieces.append(full7[i])
                for j in range(A):
                    if j != i:
                        pieces.append(pos4[j])
                pieces.append(shelves)
            else:
                # Picker (or AGENT): own positional info, then everyone
                # else's full info — AGVs' 7-tuple, pickers' 4-tuple — and no
                # shelf state (Partial:106-110).
                pieces.append(pos4[i])
                for j in range(A):
                    if j == i:
                        continue
                    j_agv = j < params.num_agvs and params.num_pickers > 0
                    pieces.append(full7[j] if j_agv else pos4[j])
        row = jnp.concatenate(pieces)
        rows.append(jnp.pad(row, (0, max_len - row.shape[0])))
    return jnp.stack(rows)
