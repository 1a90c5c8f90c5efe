"""Pure-functional warehouse simulation step.

Reimplements the reference step pipeline (warehouse.py:668-704):
attribute macro actions -> resolve move conflicts -> resolve stuck agents ->
execute micro actions -> process deliveries -> termination, as fixed-shape
array programs. The sequential, order-dependent Python loops of the
reference (notably the O(A^2) pairwise clash scan, warehouse.py:447-478)
are re-derived as order-preserving array rules; parity with the reference is
at the metric/distribution level (SURVEY.md §7 "Hard parts").

Semantics notes (derived by reading the reference closely):
  * Movement is "accordion": a mover is blocked whenever its destination
    cell currently holds a blocking agent, even one that moves away this
    step (warehouse.py:462-463 NOOPs followers unconditionally). Chains
    advance one gap per step.
  * Cross-type occupancy only blocks on highway cells; on rack cells a
    Picker may step onto an AGV's cell and vice versa (warehouse.py:454-460).
  * Two movers contending for the same empty cell: all but one yield and
    enter fixing-clash mode, but only while neither is already fixing
    (warehouse.py:474-478).
  * Bumping into an effectively stationary, non-rotating, non-fixing agent
    triggers a clash: the bumper gets fixing_clash=4 and replans around
    agents if a path exists (warehouse.py:461-473).

TPU-native performance notes: the reference's per-step dense id grids
(warehouse.py:319-330) would be scatter ops here; instead every occupancy
lookup is a gridless equality-reduction (env/queries.py), keeping the hot
loop scatter-free (the only scatter left is the BFS obstacle bitmap).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from swarm_ode_tpu.definitions import (
    Action,
    AgentType,
    Direction,
    DELIVERY_REWARD,
    FIXING_CLASH_TIME,
    HANDOFF_REWARD_GLOBAL,
    HANDOFF_REWARD_INDIVIDUAL,
    RewardType,
    STEP_PENALTY,
    STUCK_THRESHOLD,
)
from swarm_ode_tpu.env.pathfinding import INF32, replan_query
from swarm_ode_tpu.env.queries import occupant_max_id
from swarm_ode_tpu.ops.take import grid_at, take_ids, take_many
from swarm_ode_tpu.env.state import EnvParams, EnvState, agent_class

# Direction value -> index on the clockwise wheel [UP, RIGHT, DOWN, LEFT]
_DIR_TO_WHEEL = jnp.array([0, 2, 3, 1], jnp.int32)
_WHEEL_TO_DIR = jnp.array([0, 3, 1, 2], jnp.int32)
# turn difference (src_wheel - dst_wheel) % 4 -> micro action
# (reference utils/utils.py:54-64)
_TURN_TO_ACTION = jnp.array(
    [Action.FORWARD, Action.LEFT, Action.RIGHT, Action.RIGHT], jnp.int32
)
# Direction -> (dx, dy) displacement
_DIR_DX = jnp.array([0, 0, -1, 1], jnp.int32)
_DIR_DY = jnp.array([-1, 1, 0, 0], jnp.int32)


def micro_toward(cur_dir: jnp.ndarray, move_dir: jnp.ndarray) -> jnp.ndarray:
    """Next micro action to end up moving in `move_dir`
    (reference utils/utils.py:37-64)."""
    diff = (_DIR_TO_WHEEL[cur_dir] - _DIR_TO_WHEEL[move_dir]) % 4
    return _TURN_TO_ACTION[diff]


def static_dist_at(
    params: EnvParams,
    tgt_idx: jnp.ndarray,  # (A,) action index (action_id - 1, clipped >= 0)
    cls: jnp.ndarray,  # (A,) 0 = free grid, 1 = picker
    x: jnp.ndarray,
    y: jnp.ndarray,
):
    """Static planning distance from (x, y) to each agent's target.

    Free-grid agents (AGV/AGENT) need no table: BFS distance on an empty
    grid is Manhattan distance. Only pickers gather from the precomputed
    highway-restricted field — keeps the hot path free of large-table
    gathers on TPU.
    """
    tgt = params.action_cells[tgt_idx]
    ty, tx = tgt[:, 0], tgt[:, 1]
    man = jnp.abs(ty - y) + jnp.abs(tx - x)
    if params.num_pickers == 0:
        return man
    d_pick, _ = _picker_field_lookup(params, tgt_idx, y, x)
    return jnp.where(cls == 0, man, d_pick)


def _picker_field_lookup(params, tgt_idx, y, x):
    """field[tgt_idx, y, x] for the trailing picker rows, via one-hot
    contractions instead of a (T, H, W) gather (TPU gathers run ~1.5 GiB/s
    and dominated the round-1 profile). Agents are ordered AGVs first, then
    pickers (make_params), so only the last P rows are evaluated; AGV rows
    of the returned (A,) arrays are zero — callers mask by class.

    Returns (dist, next_dir) as int32 (A,) arrays."""
    A = tgt_idx.shape[0]
    P = params.num_pickers
    H, W = params.grid_h, params.grid_w
    T = params.field_dist_picker.shape[0]
    s = A - P
    ti, yi, xi = tgt_idx[s:], y[s:], x[s:]
    oh_t = (
        ti[:, None] == jnp.arange(T, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)
    # Constant-folded at compile time (params are closure constants).
    tab = jnp.concatenate(
        [
            params.field_dist_picker.reshape(T, H * W).astype(jnp.float32),
            params.field_next_dir_picker.reshape(T, H * W).astype(jnp.float32),
        ],
        axis=1,
    )  # (T, 2*H*W)
    # Exact: one-hot rows select single table entries (ints < 2^24 and the
    # exactly-representable INF32); HIGHEST keeps the MXU in f32 passes.
    g = jax.lax.dot(oh_t, tab, precision=jax.lax.Precision.HIGHEST)
    oh_p = (yi * W + xi)[:, None] == jnp.arange(H * W, dtype=jnp.int32)[None, :]
    d = jnp.sum(jnp.where(oh_p, g[:, : H * W], 0.0), axis=1)
    nd = jnp.sum(jnp.where(oh_p, g[:, H * W :], 0.0), axis=1)
    pad = jnp.zeros(s, jnp.int32)
    return (
        jnp.concatenate([pad, d.astype(jnp.int32)]),
        jnp.concatenate([pad, nd.astype(jnp.int32)]),
    )


def static_dist_nextdir(
    params: EnvParams,
    tgt_idx: jnp.ndarray,
    cls: jnp.ndarray,
    xy: jnp.ndarray,  # (A, 2) (x, y)
):
    """Static-field distance and next-hop per agent. Closed-form for
    free-grid agents (vertical-first tie-break matches the BFS field's
    neighbor preference), table gather for pickers."""
    x, y = xy[:, 0], xy[:, 1]
    tgt = params.action_cells[tgt_idx]
    ty, tx = tgt[:, 0], tgt[:, 1]
    man = jnp.abs(ty - y) + jnp.abs(tx - x)
    nd_free = jnp.where(
        ty < y,
        Direction.UP,
        jnp.where(
            ty > y,
            Direction.DOWN,
            jnp.where(tx < x, Direction.LEFT, Direction.RIGHT),
        ),
    ).astype(jnp.int32)
    nd_free = jnp.where(man == 0, -1, nd_free)
    if params.num_pickers == 0:
        return man, nd_free
    d_pick, nd_pick = _picker_field_lookup(params, tgt_idx, y, x)
    d = jnp.where(cls == 0, man, d_pick)
    nd = jnp.where(cls == 0, nd_free, nd_pick)
    return d, nd


def reset(params: EnvParams, key: jnp.ndarray) -> EnvState:
    """Fresh episode state (reference warehouse.py:621-666)."""
    A, S, R = params.num_agents, params.num_shelves, params.request_queue_size
    k_loc, k_dir, k_req, key = jax.random.split(key, 4)

    n_hw = params.highway_cells.shape[0]
    loc_ids = jax.random.choice(k_loc, n_hw, (A,), replace=False)
    locs = params.highway_cells[loc_ids]  # (A, 2) (y, x)
    agent_xy = jnp.stack([locs[:, 1], locs[:, 0]], axis=-1).astype(jnp.int32)
    agent_dir = jax.random.randint(k_dir, (A,), 0, 4, dtype=jnp.int32)
    request_queue = (
        jax.random.choice(k_req, S, (R,), replace=False).astype(jnp.int32) + 1
    )
    shelf_xy = jnp.stack(
        [params.shelf_cells[:, 1], params.shelf_cells[:, 0]], axis=-1
    ).astype(jnp.int32)

    return EnvState(
        agent_xy=agent_xy,
        agent_dir=agent_dir,
        agent_busy=jnp.zeros(A, jnp.bool_),
        agent_target=jnp.zeros(A, jnp.int32),
        agent_carrying=jnp.zeros(A, jnp.int32),
        agent_fixing_clash=jnp.zeros(A, jnp.int32),
        agent_replan=jnp.zeros(A, jnp.bool_),
        agent_has_delivered=jnp.zeros(A, jnp.bool_),
        agent_req_action=jnp.full(A, Action.NOOP, jnp.int32),
        stuck_count=jnp.zeros(A, jnp.int32),
        stuck_xy=agent_xy,
        agent_break=jnp.zeros(A, jnp.int32),
        shelf_xy=shelf_xy,
        request_queue=request_queue,
        cur_steps=jnp.int32(0),
        cur_inactive=jnp.int32(0),
        key=key,
    )


def _replan_dist_nextdir(params, state, occupied, targets_yx, cls, xy,
                         s_dist, s_nd, need):
    """(d, nd, dyn_ok, overflow) AT THE AGENT'S OWN CELL for replanning
    agents, per config.replan_mode. `need` marks rows whose results are
    consumed this step (drives the batched compaction budget)."""
    A = params.num_agents
    x, y = xy[:, 0], xy[:, 1]
    if params.replan_mode == "bfs":
        d, nd, ovf = replan_query(
            params, occupied, targets_yx, xy[:, ::-1], cls, need
        )
        return d, nd, d < INF32, ovf
    # Static-field fallback ('off' / 'greedy'): distance from the static
    # field; 'greedy' biases the next hop toward unoccupied neighbors.
    tgt_idx = jnp.maximum(state.agent_target - 1, 0)
    sdist, snd = static_dist_nextdir(params, tgt_idx, cls, xy)
    if params.replan_mode == "off":
        return sdist, snd, sdist < INF32, jnp.int32(0)
    H, W = params.grid_h, params.grid_w
    best_score = jnp.full(A, jnp.int32(1 << 30))
    best_dir = snd
    for d in range(4):
        nx = jnp.clip(x + _DIR_DX[d], 0, W - 1)
        ny = jnp.clip(y + _DIR_DY[d], 0, H - 1)
        in_bounds = (x + _DIR_DX[d] == nx) & (y + _DIR_DY[d] == ny)
        nd_dist = static_dist_at(params, tgt_idx, cls, nx, ny)
        occ = occupied[ny, nx]
        score = nd_dist + occ.astype(jnp.int32) * 1000
        score = jnp.where(in_bounds, score, 1 << 30)
        take = score < best_score
        best_score = jnp.where(take, score, best_score)
        best_dir = jnp.where(take, d, best_dir)
    return sdist, best_dir, sdist < INF32, jnp.int32(0)


def step(
    params: EnvParams, state: EnvState, macro_actions: jnp.ndarray
) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One simulation step.

    Args:
      macro_actions: (A,) int32 in [0, num_actions); 0 = noop, 1..G goals,
        G+1.. rack cells (reference action_id_to_coords_map).

    Returns:
      (new_state, rewards (A,) f32, done () bool, info dict)
    """
    A = params.num_agents
    H, W = params.grid_h, params.grid_w
    aidx = jnp.arange(A)
    cls = agent_class(params)
    is_picker = params.agent_type == AgentType.PICKER
    is_loader = ~is_picker  # AGV or AGENT: can toggle-load

    xy = state.agent_xy
    x, y = xy[:, 0], xy[:, 1]
    S = params.num_shelves
    sid_range = jnp.arange(1, S + 1, dtype=jnp.int32)
    carried_flags = (
        jnp.zeros(S + 1, jnp.bool_).at[state.agent_carrying].set(True)[1:]
    )
    on_grid = ~carried_flags  # shelf sits on its cell

    def shelf_at(qx, qy):
        return occupant_max_id(state.shelf_xy, on_grid, qx, qy)

    def agv_at(qx, qy):
        return occupant_max_id(xy, is_loader, qx, qy)

    def picker_at(qx, qy):
        return occupant_max_id(xy, is_picker, qx, qy)

    def carried_at(qx, qy):
        """Highest carried-shelf id held by any agent at the query cell
        (the reference's CARRIED_SHELVES layer, warehouse.py:329-330)."""
        eq = (xy[None, :, 0] == qx[:, None]) & (xy[None, :, 1] == qy[:, None])
        return jnp.max(
            jnp.where(eq, state.agent_carrying[None, :], 0), axis=1
        )

    # Obstacle bitmap for the BFS replanner (sole remaining scatter).
    occupied = (
        jnp.zeros(H * W, jnp.bool_).at[y * W + x].set(True).reshape(H, W)
    )

    # ---------------- Phase 1a: target assignment (warehouse.py:358-376) ----
    fixing = jnp.maximum(state.agent_fixing_clash - 1, 0)
    was_busy = state.agent_busy
    macro = macro_actions.astype(jnp.int32)
    tgt_idx_macro = jnp.maximum(macro - 1, 0)
    start_dist = static_dist_at(params, tgt_idx_macro, cls, x, y)
    can_start = (~was_busy) & (macro != 0) & (start_dist > 0) & (start_dist < INF32)
    target = jnp.where(was_busy, state.agent_target, 0)
    target = jnp.where(can_start, macro, target)
    busy = was_busy | can_start
    replan = state.agent_replan & was_busy

    tgt_idx = jnp.maximum(target - 1, 0)
    tgt_cell = params.action_cells[tgt_idx]  # (A, 2) (y, x)
    tgt_y, tgt_x = tgt_cell[:, 0], tgt_cell[:, 1]

    # ---------------- Phase 1b statics + dynamic replan fields --------------
    s_dist, s_nd = static_dist_nextdir(params, tgt_idx, cls, xy)
    # Rows whose dynamic values this step can consume (drives the batched
    # BFS compaction): replan followers (d/nd), potential clash triggers
    # (dyn_ok at Phase 2 — the blocking occupant sits on the mover's
    # destination, so trigger agents always have an agent at L1 distance 1),
    # and stuck candidates (dyn_ok/dyn_dist_at at Phase 3 c1).
    fwd_x = x + _DIR_DX[state.agent_dir]
    fwd_y = y + _DIR_DY[state.agent_dir]
    # A mover's blocker can only sit on its forward cell (movers face their
    # move direction; rotation steps are not movers), so "an agent stands on
    # my forward cell" is an exact trigger-row superset.
    fwd_occ = jnp.any(
        (x[None, :] == fwd_x[:, None]) & (y[None, :] == fwd_y[:, None]), axis=1
    )
    need = replan | (
        busy & (fwd_occ | (state.stuck_count > STUCK_THRESHOLD))
    )
    dyn_dist_at, dyn_nd_at, dyn_ok, replan_overflow = _replan_dist_nextdir(
        params,
        state.replace(agent_target=target),
        occupied,
        tgt_cell,
        cls,
        xy,
        s_dist,
        s_nd,
        need,
    )
    use_dyn = replan
    d = jnp.where(use_dyn, dyn_dist_at, s_dist)
    nd = jnp.where(use_dyn, dyn_nd_at, s_nd)
    d = jnp.where(busy, d, 0)

    arrived = busy & (d == 0)
    req = jnp.full(A, Action.NOOP, jnp.int32)
    move_req = micro_toward(state.agent_dir, jnp.maximum(nd, 0))
    moving_now = busy & (d > 0) & (d < INF32) & (nd >= 0)
    req = jnp.where(moving_now, move_req, req)
    req = jnp.where(arrived & is_loader, Action.TOGGLE_LOAD, req)
    # Pickers that finished their path simply become idle (warehouse.py:382-383).
    busy = jnp.where(arrived & is_picker, False, busy)

    # Distance-travelled counters: previously-busy agents following a path
    # (warehouse.py:385-387).
    followed = was_busy & ~arrived & (d < INF32)
    agvs_distance = jnp.sum(followed & (params.agent_type == AgentType.AGV))
    pickers_distance = jnp.sum(followed & is_picker)

    # Near-target logic for previously-busy agents (warehouse.py:388-404).
    near = was_busy & (d == 1)
    tgt_shelf = shelf_at(tgt_x, tgt_y)
    abort_unload = near & (state.agent_carrying > 0) & (tgt_shelf > 0)
    req = jnp.where(abort_unload, Action.NOOP, req)
    busy = jnp.where(abort_unload, False, busy)

    # Picker waits next to the shelf until its AGV is toggling there
    # (warehouse.py:393-404). AGV reqs are final at this point because the
    # reference processes AGVs (lower ids) before pickers.
    tgt_agv = agv_at(tgt_x, tgt_y)
    tgt_agv_req = jnp.where(
        tgt_agv > 0,
        take_ids(req, jnp.maximum(tgt_agv - 1, 0)),
        Action.NOOP,
    )
    agv_toggling = (tgt_agv > 0) & (tgt_agv_req == Action.TOGGLE_LOAD)
    picker_near = near & is_picker
    req = jnp.where(picker_near & ~agv_toggling, Action.NOOP, req)
    reset_stuck = can_start | (picker_near & agv_toggling)

    stuck_count = jnp.where(reset_stuck, 0, state.stuck_count)
    stuck_xy = jnp.where(reset_stuck[:, None], xy, state.stuck_xy)

    # ---------------- Phase 1c: deadlock-break escape (option) --------------
    # No reference counterpart (flag off = byte-identical trace): agents
    # with escape steps remaining override their request with a random
    # highway-legal micro move. The override is injected BEFORE Phase 2 so
    # escapes obey the normal conflict rules — no teleports, no overlap.
    agent_break = state.agent_break
    step_key = state.key
    if params.deadlock_break:
        kb, step_key = jax.random.split(state.key)
        esc = agent_break > 0
        ef_x = x + _DIR_DX[state.agent_dir]
        ef_y = y + _DIR_DY[state.agent_dir]
        inb = (ef_x >= 0) & (ef_x < W) & (ef_y >= 0) & (ef_y < H)
        fwd_hw = inb & grid_at(
            params.highway, jnp.clip(ef_y, 0, H - 1), jnp.clip(ef_x, 0, W - 1)
        )
        r = jax.random.randint(kb, (A,), 0, 4)
        esc_req = jnp.where(
            (r <= 1) & fwd_hw, Action.FORWARD,
            jnp.where(r == 2, Action.LEFT, Action.RIGHT),
        )
        req = jnp.where(esc, esc_req, req)
        agent_break = jnp.where(esc, agent_break - 1, agent_break)

    # ---------------- Phase 2: move-conflict resolution ---------------------
    dx = _DIR_DX[state.agent_dir]
    dy = _DIR_DY[state.agent_dir]
    fwd_x = jnp.clip(x + dx, 0, W - 1)
    fwd_y = jnp.clip(y + dy, 0, H - 1)
    is_fwd = req == Action.FORWARD
    req_x = jnp.where(is_fwd, fwd_x, x)
    req_y = jnp.where(is_fwd, fwd_y, y)
    mover = is_fwd & ((req_x != x) | (req_y != y))

    occ_same = jnp.where(
        is_picker, picker_at(req_x, req_y), agv_at(req_x, req_y)
    )
    occ_other = jnp.where(
        is_picker, agv_at(req_x, req_y), picker_at(req_x, req_y)
    )
    dest_hw = grid_at(params.highway, req_y, req_x)
    block_same = occ_same > 0
    block_other = (occ_other > 0) & dest_hw
    occupied_block = mover & (block_same | block_other)

    # Same-destination contention: on highway cells both layers contend; on
    # rack cells only same-layer movers contend (cross-type may overlap).
    contender = mover & ~occupied_block
    elig = contender & (fixing == 0)
    same_dest = (req_x[:, None] == req_x[None, :]) & (
        req_y[:, None] == req_y[None, :]
    )
    layer_compat = (is_picker[:, None] == is_picker[None, :]) | dest_hw[:, None]
    higher = aidx[None, :] > aidx[:, None]
    yields = elig & jnp.any(
        same_dest & layer_compat & higher & elig[None, :], axis=1
    )
    moved = contender & ~yields

    # Clash detection against the blocking occupant (warehouse.py:461-473).
    occ_id = jnp.where(block_same, occ_same, jnp.where(block_other, occ_other, 0))
    occ_i = jnp.maximum(occ_id - 1, 0)
    has_occ = occupied_block & (occ_id > 0)
    occ_req, occ_is_mover, occ_moved, occ_dest_x, occ_dest_y, occ_fixing = (
        take_many(occ_i, req, mover, moved, req_x, req_y, fixing)
    )
    occ_rotating = (occ_req == Action.LEFT) | (occ_req == Action.RIGHT)
    occ_heads_back = ((occ_dest_x == x) & (occ_dest_y == y)) | (
        (occ_dest_x == req_x) & (occ_dest_y == req_y)
    )
    trigger = (
        has_occ
        & ~occ_rotating
        & ~occ_moved
        & (occ_fixing == 0)
        & (~occ_is_mover | occ_heads_back)
    )
    clashes = jnp.sum(trigger)

    fixing = jnp.where(yields, FIXING_CLASH_TIME, fixing)
    fixing = jnp.where(trigger, jnp.where(dyn_ok, FIXING_CLASH_TIME, 0), fixing)
    replan = replan | (trigger & dyn_ok)
    req = jnp.where(mover & ~moved, Action.NOOP, req)

    # ---------------- Phase 3: stuck resolution (warehouse.py:486-519) ------
    at_goal = grid_at(params.is_goal, y, x)
    consider = (
        busy
        & (req != Action.LEFT)
        & (req != Action.RIGHT)
        & ((req != Action.TOGGLE_LOAD) | at_goal)
    )
    same_pos = (x == stuck_xy[:, 0]) & (y == stuck_xy[:, 1])
    stuck_count = jnp.where(consider, jnp.where(same_pos, stuck_count + 1, 0), stuck_count)
    stuck_xy = jnp.where((consider & ~same_pos)[:, None], xy, stuck_xy)

    upper = STUCK_THRESHOLD + params.column_height + 2
    c1 = consider & (stuck_count > STUCK_THRESHOLD) & (stuck_count < upper)
    c2 = consider & (stuck_count > upper)

    req = jnp.where(c1 | c2, Action.NOOP, req)
    # c1, path nonempty: replan around agents if possible (warehouse.py:502-509)
    c1_replan = c1 & ~arrived & dyn_ok
    replan = replan | c1_replan
    reset1 = c1_replan & (dyn_dist_at > 1)
    stuck_count = jnp.where(reset1, 0, stuck_count)
    stuck_xy = jnp.where(reset1[:, None], xy, stuck_xy)
    # c1, path empty (toggling at goal, blocked): abandon (warehouse.py:510-513)
    c1_abandon = c1 & arrived
    busy = jnp.where(c1_abandon, False, busy)
    stuck_count = jnp.where(c1_abandon, 0, stuck_count)
    # c2: hard abandon (warehouse.py:514-519)
    busy = jnp.where(c2, False, busy)
    stuck_count = jnp.where(c2, 0, stuck_count)
    stuck_xy = jnp.where(c2[:, None], xy, stuck_xy)
    stucks = jnp.sum(c1_abandon) + jnp.sum(c2)
    if params.deadlock_break:
        # Arm the escape on hard abandon AND on "replanned but no detour
        # exists" (dyn distance INF) — the mutual-blockade geometry cycles
        # through c1-replan forever (stuck_count resets each c1), so c2
        # alone would never fire there.
        no_detour = c1_replan & (dyn_dist_at >= INF32)
        agent_break = jnp.where(
            c2 | no_detour, params.deadlock_break, agent_break
        )

    # ---------------- Phase 4: execute micro actions (warehouse.py:521-590) -
    rewards = jnp.full(A, -STEP_PENALTY, jnp.float32)

    do_fwd = req == Action.FORWARD
    new_x = jnp.where(do_fwd, req_x, x)
    new_y = jnp.where(do_fwd, req_y, y)
    new_xy = jnp.stack([new_x, new_y], axis=-1)

    wheel = _DIR_TO_WHEEL[state.agent_dir]
    new_wheel = jnp.where(
        req == Action.RIGHT,
        (wheel + 1) % 4,
        jnp.where(req == Action.LEFT, (wheel - 1) % 4, wheel),
    )
    new_dir = _WHEEL_TO_DIR[new_wheel]

    toggling = req == Action.TOGGLE_LOAD
    carrying = state.agent_carrying
    picker_here = picker_at(x, y) > 0
    here_shelf = shelf_at(x, y)
    # Load (warehouse.py:530-552)
    wants_load = toggling & (carrying == 0)
    can_load = wants_load & (here_shelf > 0) & (
        ((params.agent_type == AgentType.AGV) & picker_here)
        | (params.agent_type == AgentType.AGENT)
    )
    load_fail = wants_load & (here_shelf == 0)
    carrying = jnp.where(can_load, here_shelf, carrying)
    busy = jnp.where(can_load | load_fail, False, busy)

    # Unload (warehouse.py:554-577)
    wants_unload = toggling & (state.agent_carrying > 0)
    unload_blocked = wants_unload & (at_goal | (here_shelf > 0))
    busy = jnp.where(unload_blocked, False, busy)
    can_unload = (
        wants_unload
        & ~unload_blocked
        & ~grid_at(params.highway, y, x)
        & (
            ((params.agent_type == AgentType.AGV) & picker_here)
            | (params.agent_type == AgentType.AGENT)
        )
    )
    placed_shelf = jnp.where(can_unload, state.agent_carrying, 0)
    carrying = jnp.where(can_unload, 0, carrying)
    busy = jnp.where(can_unload, False, busy)
    has_delivered = jnp.where(can_unload, False, state.agent_has_delivered)

    # Handoff rewards (load or unload): picker at the cell gets credit
    # (or the AGENT itself).
    handoff = can_load | can_unload
    if params.reward_type == RewardType.GLOBAL:
        rewards = rewards + jnp.sum(handoff) * HANDOFF_REWARD_GLOBAL
    elif params.reward_type == RewardType.INDIVIDUAL:
        self_credit = handoff & (params.agent_type == AgentType.AGENT)
        picker_credit_id = jnp.where(
            handoff & (params.agent_type == AgentType.AGV),
            picker_at(x, y),
            0,
        )  # (A,) 1-based picker agent id receiving 0.1
        rewards = rewards + self_credit * HANDOFF_REWARD_INDIVIDUAL
        credited = jnp.sum(
            (picker_credit_id[None, :] == aidx[:, None] + 1).astype(jnp.float32),
            axis=1,
        )
        rewards = rewards + credited * HANDOFF_REWARD_INDIVIDUAL

    # Shelf position updates, gridless: a shelf follows whichever agent
    # placed it this step (warehouse.py:564) or carries it (:524-525).
    placed_eq = placed_shelf[None, :] == sid_range[:, None]  # (S, A)
    carried_eq = carrying[None, :] == sid_range[:, None]
    placed_any = placed_eq.any(axis=1)
    carried_any = carried_eq.any(axis=1)
    placed_pos = jnp.einsum(
        "sa,ad->sd", placed_eq.astype(jnp.int32), xy
    )
    carried_pos = jnp.einsum(
        "sa,ad->sd", carried_eq.astype(jnp.int32), new_xy
    )
    shelf_xy = jnp.where(
        placed_any[:, None],
        placed_pos,
        jnp.where(carried_any[:, None], carried_pos, state.shelf_xy),
    )

    # ---------------- Phase 5: shelf deliveries (warehouse.py:592-619) ------
    # Uses positions from the START of this step, like the reference
    # (process_shelf_deliveries reads grids recalculated at the end of the
    # previous step).
    gy, gx = params.goals_yx[:, 0], params.goals_yx[:, 1]
    goal_shelf = carried_at(gx, gy)  # (G,) carried shelf id at each goal
    goal_agent = agv_at(gx, gy)  # (G,) AGV id at each goal
    carried_now = (
        jnp.zeros(S + 1, jnp.bool_).at[carrying].set(True)[1:]
    )
    in_queue0 = (
        jnp.zeros(S + 1, jnp.bool_).at[state.request_queue].set(True)[1:]
    )

    def deliver_one(carry, goal_inputs):
        rewards, queue, has_del, key, n_del, in_q = carry
        shelf_id, agent_id = goal_inputs
        valid = (shelf_id > 0) & in_q[jnp.maximum(shelf_id - 1, 0)]
        # Replacement: uniform over shelves not requested and not carried
        # (warehouse.py:599-603), via gumbel-max instead of cumsum sampling.
        key, sub = jax.random.split(key)
        cand = ~in_q & ~carried_now
        gumbel = jax.random.gumbel(sub, (S,))
        new_shelf = jnp.argmax(jnp.where(cand, gumbel, -jnp.inf)).astype(
            jnp.int32
        ) + 1
        slot = jnp.argmax(queue == shelf_id)
        queue = jnp.where(valid, queue.at[slot].set(new_shelf), queue)
        in_q = jnp.where(
            valid,
            in_q.at[jnp.maximum(shelf_id - 1, 0)]
            .set(False)
            .at[new_shelf - 1]
            .set(True),
            in_q,
        )
        ai = jnp.maximum(agent_id - 1, 0)
        first = valid & (agent_id > 0) & ~has_del[ai]
        has_del = jnp.where(
            valid & (agent_id > 0), has_del.at[ai].set(True), has_del
        )
        if params.reward_type == RewardType.GLOBAL:
            rewards = rewards + jnp.where(first, DELIVERY_REWARD, 0.0)
        elif params.reward_type == RewardType.INDIVIDUAL:
            rewards = rewards.at[ai].add(jnp.where(first, DELIVERY_REWARD, 0.0))
        n_del = n_del + valid.astype(jnp.int32)
        return (rewards, queue, has_del, key, n_del, in_q), None

    (rewards, request_queue, has_delivered, key, shelf_deliveries, _), _ = (
        jax.lax.scan(
            deliver_one,
            (rewards, state.request_queue, has_delivered, step_key,
             jnp.int32(0), in_queue0),
            (goal_shelf, goal_agent),
        )
    )

    cur_inactive = jnp.where(shelf_deliveries > 0, 0, state.cur_inactive + 1)
    cur_steps = state.cur_steps + 1

    done = jnp.bool_(False)
    if params.max_inactivity_steps:
        done = done | (cur_inactive >= params.max_inactivity_steps)
    if params.max_steps:
        done = done | (cur_steps >= params.max_steps)

    if params.replan_rejoin:
        # Exit replan mode where the dynamic field has rejoined the static
        # one at the agent's own cell: identical next-hop AND identical
        # remaining distance mean the static follower takes the same move,
        # and a later blockage re-arms replanning through the Phase-2
        # trigger / Phase-3 stuck rules. Freshly-triggered rows never
        # match (their blocker sits on the static next cell, so the dyn
        # detour differs); only stale always-replan tails are dropped.
        rejoined = use_dyn & dyn_ok & (dyn_nd_at == s_nd) & (
            dyn_dist_at == s_dist
        )
        replan = replan & ~rejoined
    replan = replan & busy

    new_state = EnvState(
        agent_xy=new_xy,
        agent_dir=new_dir,
        agent_busy=busy,
        agent_target=target,
        agent_carrying=carrying,
        agent_fixing_clash=fixing,
        agent_replan=replan,
        agent_has_delivered=has_delivered,
        agent_req_action=req,
        stuck_count=stuck_count,
        stuck_xy=stuck_xy,
        agent_break=agent_break,
        shelf_xy=shelf_xy,
        request_queue=request_queue,
        cur_steps=cur_steps,
        cur_inactive=cur_inactive,
        key=key,
    )

    idle = (req == Action.NOOP) | (req == Action.TOGGLE_LOAD)
    info = {
        "vehicles_busy": busy,
        "shelf_deliveries": shelf_deliveries,
        "clashes": clashes,
        "stucks": stucks,
        "agvs_distance_travelled": agvs_distance,
        "pickers_distance_travelled": pickers_distance,
        "agvs_idle_time": jnp.sum(idle & ~is_picker),
        "pickers_idle_time": jnp.sum(idle & is_picker),
        # Needed-rows that exceeded the batched-BFS compaction budget
        # (replan_row_frac); 0 everywhere unless the batch is pathologically
        # congested. Monitored, never silently truncated.
        "replan_overflow": replan_overflow,
    }
    return new_state, rewards, done, info
