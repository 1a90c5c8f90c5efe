"""Heterogeneous env-state graph as dense masked adjacency.

Replaces the reference's five near-duplicate graph converters (SURVEY.md
§2.3) with ONE canonical builder. Semantics follow the observation-driven
`MultiAgentGraphConverter` (reference run_gnode.py:1041-1326 / gru.py:708-999
— the debugged variant), minus its uninitialized-variable bugs (SURVEY §2.6).

TPU-native design: instead of PyG-style edge lists (dynamic length,
gather/scatter), relations are boolean adjacency matrices over fixed node
sets (AGVs x locations, etc.). Message passing becomes dense masked matmuls
that map straight onto the MXU; for graphs this size (<=28 agents, <=448
locations) dense is strictly faster than sparse on TPU. Padded edge-list
utilities for the sparse path live in swarm_ode_tpu/ops/segment.py.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import struct

from swarm_ode_tpu.env.state import EnvParams

AGV_FEATS = 7  # [carrying, carrying_requested, toggling, y, x, ty, tx]
PICKER_FEATS = 4  # [y, x, ty, tx]
LOC_FEATS = 2  # [has_shelf, is_requested]


@struct.dataclass
class HeteroGraph:
    """Node features + six boolean relations (reference edge types at
    run_gnode.py:89-95). adjacency[src, dst] convention."""

    agv_x: jnp.ndarray  # (A, 7) float32
    picker_x: jnp.ndarray  # (P, 4) float32
    loc_x: jnp.ndarray  # (L, 2) float32
    agv2loc: jnp.ndarray  # (A, L) bool — 'targets'
    loc2agv: jnp.ndarray  # (L, A) bool — 'is targeted by'
    agv2agv: jnp.ndarray  # (A, A) bool — 'communicates'
    pick2loc: jnp.ndarray  # (P, L) bool — 'manages'
    agv2pick: jnp.ndarray  # (A, P) bool — 'cooperates with'
    pick2agv: jnp.ndarray  # (P, A) bool — 'helps'


def split_observation(params: EnvParams, obs: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Slice the padded partial-obs matrix into (agv_feats, picker_feats,
    loc_feats), mirroring the reference's feature extraction
    (run_gnode.py:1085-1101).

    obs: (A_total, obs_len) from observations.observe with
    observation_type='partial'.
    """
    A, P = params.num_agvs, params.num_pickers
    agv_feats = obs[:A, :AGV_FEATS]
    picker_feats = obs[A:, :PICKER_FEATS]
    # Shelf block of agent 0's AGV observation starts after its own 7
    # features plus 4 per other agent (run_gnode.py:1098).
    start = AGV_FEATS + PICKER_FEATS * (A + P - 1)
    shelf_block = obs[0, start : start + 2 * params.num_racks]
    loc_feats = shelf_block.reshape(params.num_racks, 2)
    return agv_feats, picker_feats, loc_feats


def build_hetero_graph(
    params: EnvParams,
    agv_feats: jnp.ndarray,  # (A, 7)
    picker_feats: jnp.ndarray,  # (P, 4)
    loc_feats: jnp.ndarray,  # (L, 2) in obs (rack-group) order
    max_comm_distance: float = 5.0,
) -> HeteroGraph:
    """Build the six relations (reference run_gnode.py:1159-1326)."""
    A, P, L = params.num_agvs, params.num_pickers, params.num_racks
    rl = params.rack_locations_xyg  # (L, 3) (x, y, group), obs order

    # --- helper lookups -------------------------------------------------
    def section_of(x, y):
        """Rack-section id at (x, y), -1 if not a rack cell (the reference's
        position_to_sections .get(None) pattern)."""
        ridx = params.cell_to_rack[y, x]
        grp = params.rack_group[jnp.maximum(ridx, 0)]
        return jnp.where(ridx >= 0, grp, -1)

    agv_pos_yx = agv_feats[:, 3:5].astype(jnp.int32)  # (A, 2) (y, x)
    agv_tgt_yx = agv_feats[:, 5:7].astype(jnp.int32)
    agv_has_tgt = ~((agv_tgt_yx[:, 0] == 0) & (agv_tgt_yx[:, 1] == 0))
    pick_pos_yx = picker_feats[:, 0:2].astype(jnp.int32)
    pick_tgt_yx = picker_feats[:, 2:4].astype(jnp.int32)
    pick_has_tgt = ~((pick_tgt_yx[:, 0] == 0) & (pick_tgt_yx[:, 1] == 0))

    has_shelf = loc_feats[:, 0] > 0
    is_requested = loc_feats[:, 1] > 0
    requested_loc = has_shelf & is_requested  # (L,)

    loc_sec = rl[:, 2]  # (L,)
    agv_tgt_sec = section_of(agv_tgt_yx[:, 1], agv_tgt_yx[:, 0])
    agv_tgt_sec = jnp.where(agv_has_tgt, agv_tgt_sec, -1)
    pick_tgt_sec = section_of(pick_tgt_yx[:, 1], pick_tgt_yx[:, 0])
    pick_tgt_sec = jnp.where(pick_has_tgt, pick_tgt_sec, -1)
    pick_cur_sec = section_of(pick_pos_yx[:, 1], pick_pos_yx[:, 0])

    # --- AGV -> location ('targets'; run_gnode.py:1196-1220) ------------
    # With a target: the single location matching it. Without: every
    # requested location.
    tgt_match = (rl[None, :, 0] == agv_tgt_yx[:, 1:2]) & (
        rl[None, :, 1] == agv_tgt_yx[:, 0:1]
    )  # (A, L): rack.x == target_x, rack.y == target_y
    agv2loc = jnp.where(agv_has_tgt[:, None], tgt_match, requested_loc[None, :])
    loc2agv = agv2loc.T

    # --- AGV <-> AGV ('communicates'; run_gnode.py:1222-1247) -----------
    d_agv = jnp.abs(agv_pos_yx[:, None, :] - agv_pos_yx[None, :, :]).sum(-1)
    same_sec = (
        (agv_tgt_sec[:, None] == agv_tgt_sec[None, :])
        & (agv_tgt_sec >= 0)[:, None]
        & (agv_tgt_sec >= 0)[None, :]
    )
    agv2agv = (d_agv <= max_comm_distance) | same_sec
    agv2agv = agv2agv & ~jnp.eye(A, dtype=bool)

    # --- Picker -> location ('manages'; run_gnode.py:1249-1273) ---------
    p_tgt_match = (rl[None, :, 0] == pick_tgt_yx[:, 1:2]) & (
        rl[None, :, 1] == pick_tgt_yx[:, 0:1]
    )
    zone_req = (
        (pick_cur_sec[:, None] == loc_sec[None, :])
        & (pick_cur_sec >= 0)[:, None]
        & requested_loc[None, :]
    )
    pick2loc = jnp.where(pick_has_tgt[:, None], p_tgt_match, zone_req)

    # --- AGV <-> Picker ('cooperates with' / 'helps';
    #     run_gnode.py:1275-1321) ----------------------------------------
    d_ap = jnp.abs(
        agv_pos_yx[:, None, :] - pick_pos_yx[None, :, :]
    ).sum(-1)  # (A, P)
    close = d_ap <= max_comm_distance
    both_tgt = agv_has_tgt[:, None] & pick_has_tgt[None, :]
    same_tgt = both_tgt & (
        (agv_tgt_yx[:, None, 0] == pick_tgt_yx[None, :, 0])
        & (agv_tgt_yx[:, None, 1] == pick_tgt_yx[None, :, 1])
    )
    same_tgt_sec = (
        both_tgt
        & ~same_tgt
        & (agv_tgt_sec[:, None] == pick_tgt_sec[None, :])
        & (agv_tgt_sec >= 0)[:, None]
        & (pick_tgt_sec >= 0)[None, :]
    )
    tgt_in_pick_sec = (
        ~both_tgt
        & agv_has_tgt[:, None]
        & (agv_tgt_sec[:, None] == pick_cur_sec[None, :])
        & (agv_tgt_sec >= 0)[:, None]
        & (pick_cur_sec >= 0)[None, :]
    )
    agv2pick = close | same_tgt | same_tgt_sec | tgt_in_pick_sec

    return HeteroGraph(
        agv_x=agv_feats.astype(jnp.float32),
        picker_x=picker_feats.astype(jnp.float32),
        loc_x=loc_feats.astype(jnp.float32),
        agv2loc=agv2loc,
        loc2agv=loc2agv,
        agv2agv=agv2agv,
        pick2loc=pick2loc,
        agv2pick=agv2pick,
        pick2agv=agv2pick.T,
    )


def masks_from_feats(
    params: EnvParams,
    agv_feats: jnp.ndarray,  # (A, 7)
    picker_feats: jnp.ndarray,  # (P, 4)
    loc_feats: jnp.ndarray,  # (L, 2) obs (rack-group) order
) -> jnp.ndarray:
    """Valid-action masks reconstructed from graph node features.

    Replay transitions store only node features; TD-target bootstrapping
    must still restrict the argmax to valid actions (unmasked maxima let
    never-grounded Q values diverge — a latent instability in the
    reference's replay loops, run_gnode.py:871-875). This reproduces
    compute_valid_action_masks (warehouse.py:727-752) from features alone.

    The 'empty cell' rule excludes cells with a pending unload
    (warehouse.py:340-356). Features carry no request intents, but a
    carrying AGV standing on a rack cell that is its own target (or whose
    toggling flag is set) is exactly an agent about to unload there — that
    reconstruction closes the gap except for carrying AGVs mid-transit
    over a rack cell that got conflict-NOOPed this step (rare; bounded by
    tests/test_graphs_models.py::test_masks_from_feats_matches_env_masks).
    """
    A, P, L = params.num_agvs, params.num_pickers, params.num_racks
    G = params.num_goals
    loc_action = loc_feats[params.obs_rack_perm_inv]  # (L, 2) action order
    has_shelf = loc_action[:, 0] > 0
    requested = (has_shelf & (loc_action[:, 1] > 0)).astype(jnp.float32)
    carrying = agv_feats[:, 0] > 0
    # Pending-unload reconstruction (see docstring).
    ay = agv_feats[:, 3].astype(jnp.int32)
    ax = agv_feats[:, 4].astype(jnp.int32)
    aty = agv_feats[:, 5].astype(jnp.int32)
    atx = agv_feats[:, 6].astype(jnp.int32)
    cur_rack = params.cell_to_rack[ay, ax]  # -1 off racks
    at_target = (ay == aty) & (ax == atx) & ~((aty == 0) & (atx == 0))
    toggling = agv_feats[:, 2] > 0
    pending_agv = carrying & (cur_rack >= 0) & (at_target | toggling)
    pending = (
        jnp.zeros(L + 1, jnp.bool_)
        .at[jnp.where(pending_agv, cur_rack, L)]
        .set(True, mode="drop")[:L]
    )
    empty = (~has_shelf & ~pending).astype(jnp.float32)

    def rack_target(tyx):
        ty = tyx[:, 0].astype(jnp.int32)
        tx = tyx[:, 1].astype(jnp.int32)
        has = ~((ty == 0) & (tx == 0))
        ridx = params.cell_to_rack[ty, tx]
        return jnp.where(has & (ridx >= 0), ridx, L)  # L = drop

    agv_rack = rack_target(agv_feats[:, 5:7])
    pick_rack = rack_target(picker_feats[:, 2:4])

    valid_agvs = jnp.where(
        carrying[:, None], empty[None, :], requested[None, :]
    )
    valid_pickers = jnp.zeros(L, jnp.float32).at[agv_rack].set(1.0, mode="drop")
    valid_agvs = valid_agvs.at[:, agv_rack].set(0.0, mode="drop")
    valid_pickers = valid_pickers.at[pick_rack].set(0.0, mode="drop")

    masks = jnp.ones((params.num_agents, params.num_actions), jnp.float32)
    masks = masks.at[:A, 1 + G :].set(valid_agvs)
    masks = masks.at[:A, 1 : 1 + G].set(
        jnp.repeat(carrying.astype(jnp.float32)[:, None], G, axis=1)
    )
    masks = masks.at[A:, 1 + G :].set(valid_pickers[None, :])
    masks = masks.at[A:, 1 : 1 + G].set(0.0)
    return masks


def hetero_graph_from_obs(
    params: EnvParams, obs: jnp.ndarray, max_comm_distance: float = 5.0
) -> HeteroGraph:
    """Observation -> HeteroGraph (the reference's converter entry point,
    run_gnode.py:1073)."""
    agv_f, pick_f, loc_f = split_observation(params, obs)
    return build_hetero_graph(params, agv_f, pick_f, loc_f, max_comm_distance)
