"""FIFO dispatcher policy as a pure, vmappable JAX function.

Behavioral parity target: reference tarware/heuristic.py:26-146.
  * Each requested item is assigned to the closest available AGV (A* path
    length argmin -> here a static-distance-field gather, heuristic.py:71-77).
  * AGV mission FSM: PICKING -> DELIVERING (closest goal) -> RETURNING
    (closest unassigned empty rack cell) -> idle (heuristic.py:88-113).
  * Pickers are zone-partitioned over rack sections (split_list,
    heuristic.py:44-46) and sent to the oldest AGV mission in their zone
    (heuristic.py:116-127; OrderedDict insertion order == assignment time).

The reference recomputes A* paths for every (AGV x candidate) pair per step
— the dominant wall-clock cost (SURVEY.md §3.2). Here every distance is a
table lookup into the precomputed field, so the dispatcher is O(R*A + A*L)
arithmetic with no graph search.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from swarm_ode_tpu.env.layout import Layout
from swarm_ode_tpu.env.observations import empty_shelf_info
from swarm_ode_tpu.env.pathfinding import INF32
from swarm_ode_tpu.env.state import EnvParams, EnvState
from swarm_ode_tpu.ops.take import grid_at, take_ids

# Mission types (reference heuristic.py:12-15)
NONE, PICKING, RETURNING, DELIVERING = 0, 1, 2, 3


@struct.dataclass
class HeuristicState:
    """Dispatcher bookkeeping (reference's assigned_agvs / assigned_pickers /
    assigned_items OrderedDicts, heuristic.py:48-50)."""

    agv_mission: jnp.ndarray  # (Na,) int32 mission type
    agv_loc: jnp.ndarray  # (Na,) int32 action id
    agv_item: jnp.ndarray  # (Na,) int32 shelf id reserved by this AGV
    agv_at_loc: jnp.ndarray  # (Na,) bool
    agv_time: jnp.ndarray  # (Na,) int32 mission assignment step
    picker_loc: jnp.ndarray  # (Np,) int32 action id (0 = none)
    timestep: jnp.ndarray  # () int32


def init_state(params: EnvParams) -> HeuristicState:
    Na, Np = params.num_agvs, max(params.num_pickers, 1)
    return HeuristicState(
        agv_mission=jnp.zeros(Na, jnp.int32),
        agv_loc=jnp.zeros(Na, jnp.int32),
        agv_item=jnp.zeros(Na, jnp.int32),
        agv_at_loc=jnp.zeros(Na, jnp.bool_),
        agv_time=jnp.zeros(Na, jnp.int32),
        picker_loc=jnp.zeros(Np, jnp.int32),
        timestep=jnp.int32(0),
    )


def picker_zones(layout: Layout, num_pickers: int) -> np.ndarray:
    """(L,) picker index owning each rack cell (action order).

    split_list over rack sections (reference utils/utils.py:9-17 via
    heuristic.py:45-46): section list chopped into num_pickers contiguous
    chunks of near-equal length.
    """
    n_groups = layout.num_groups
    k, m = divmod(n_groups, num_pickers)
    group_to_picker = np.zeros(n_groups, dtype=np.int32)
    for i in range(num_pickers):
        lo = i * k + min(i, m)
        hi = (i + 1) * k + min(i + 1, m)
        group_to_picker[lo:hi] = i
    return group_to_picker[layout.rack_group_action_order]


def _sampled_argmin(d: jnp.ndarray, key, temperature) -> jnp.ndarray:
    """argmin of d, Gumbel-perturbed: sample index i with probability
    proportional to exp(-d_i / T) over the valid (d < INF32) entries.

    T -> 0 recovers argmin with ties broken UNIFORMLY AT RANDOM instead
    of lowest-index-first (distances are integer Manhattan cells, so any
    T << 1 only randomizes exact ties). Used by the stochastic-expert
    ablation (experiments/stochastic_expert_eval.py): is the learned
    dispatcher's paired win over the FIFO expert recoverable by just
    de-determinizing the expert's own choices?"""
    g = jax.random.gumbel(key, d.shape)
    scores = jnp.where(d < INF32, -d / temperature + g, -jnp.inf)
    return jnp.argmax(scores, axis=-1).astype(jnp.int32)


def heuristic_policy(
    params: EnvParams,
    zones: jnp.ndarray,  # (L,) int32 picker index per rack cell (action order)
    env_state: EnvState,
    h: HeuristicState,
    key=None,
    temperature: float = 0.0,
) -> Tuple[jnp.ndarray, HeuristicState]:
    """One dispatcher step: returns (macro_actions (A,), new HeuristicState).

    temperature=0 (default): the reference's deterministic dispatcher.
    temperature>0 (requires `key`): every AGV choice site — queue-item
    assignment, goal selection, return-cell selection — samples
    proportional to exp(-distance/T) instead of taking the argmin
    (_sampled_argmin). Mission structure, FIFO order, and picker zoning
    are unchanged; only the tie-breaks/choices are randomized."""
    Na = params.num_agvs
    G, L = params.num_goals, params.num_racks
    xy = env_state.agent_xy
    agv_x, agv_y = xy[:Na, 0], xy[:Na, 1]
    busy = env_state.agent_busy[:Na]
    carrying = env_state.agent_carrying[:Na] > 0
    t = h.timestep

    # Distances from every AGV to every action cell: AGVs plan on the free
    # grid (care_for_agents=False, heuristic.py:71), so distance is exactly
    # Manhattan — pure arithmetic, no table gather.
    ac = params.action_cells  # (T, 2) (y, x)
    dist_all = jnp.abs(agv_y[:, None] - ac[None, :, 0]) + jnp.abs(
        agv_x[:, None] - ac[None, :, 1]
    )  # (Na, T)

    # ---- [AGV None -> PICKING]: FIFO queue assignment (heuristic.py:59-77) -
    # Precompute per-queue-item action ids and AGV distances outside the
    # sequential scan: item cell -> action id (R,), Manhattan distances
    # (R, Na). The scan body then only masks and argmins.
    q_items = env_state.request_queue  # (R,) shelf ids
    q_xy = jnp.stack([take_ids(env_state.shelf_xy[:, 0], q_items - 1), take_ids(env_state.shelf_xy[:, 1], q_items - 1)], axis=-1)  # (R, 2) (x, y)
    q_rack = grid_at(params.cell_to_rack, q_xy[:, 1], q_xy[:, 0])  # (R,)
    q_act = jnp.where(q_rack >= 0, G + 1 + q_rack, 0)
    q_dist = jnp.abs(agv_y[None, :] - q_xy[:, 1][:, None]) + jnp.abs(
        agv_x[None, :] - q_xy[:, 0][:, None]
    )  # (R, Na)

    stochastic = temperature is not None and temperature > 0
    if stochastic:
        if key is None:
            raise ValueError("temperature>0 requires a PRNG key")
        k_assign, k_goal, k_ret = jax.random.split(key, 3)

    def assign_one(carry, inputs):
        mission, loc, item_arr, time_arr, at_loc = carry
        if stochastic:
            item, act_id, d_row, kk = inputs
        else:
            item, act_id, d_row = inputs
        already = jnp.any(item_arr == item)
        available = (~busy) & (~carrying) & (mission == NONE)
        d = jnp.where(available, d_row, INF32)
        if stochastic:
            closest = _sampled_argmin(d, kk, temperature)
        else:
            closest = jnp.argmin(d)
        ok = (~already) & jnp.any(available) & (act_id > 0)
        mission = jnp.where(ok, mission.at[closest].set(PICKING), mission)
        loc = jnp.where(ok, loc.at[closest].set(act_id), loc)
        item_arr = jnp.where(ok, item_arr.at[closest].set(item), item_arr)
        time_arr = jnp.where(ok, time_arr.at[closest].set(t), time_arr)
        at_loc = jnp.where(ok, at_loc.at[closest].set(False), at_loc)
        return (mission, loc, item_arr, time_arr, at_loc), None

    assign_xs = (q_items, q_act, q_dist)
    if stochastic:
        assign_xs = assign_xs + (jax.random.split(k_assign, q_items.shape[0]),)
    (mission, loc, item_arr, time_arr, at_loc), _ = jax.lax.scan(
        assign_one,
        (h.agv_mission, h.agv_loc, h.agv_item, h.agv_time, h.agv_at_loc),
        assign_xs,
        unroll=4,
    )

    # ---- at_location refresh (heuristic.py:81-82) ----
    loc_cell = params.action_cells[jnp.maximum(loc - 1, 0)]
    at_now = (agv_x == loc_cell[:, 1]) & (agv_y == loc_cell[:, 0])
    at_loc = at_loc | ((mission != NONE) & at_now)

    elig = (mission != NONE) & (~busy)

    # ---- [PICKING -> DELIVERING] (heuristic.py:88-94) ----
    p2d = elig & (mission == PICKING) & at_loc & carrying
    goal_d = dist_all[:, :G]  # (Na, G) — goal action ids are 1..G
    if stochastic:
        gg = jax.random.gumbel(k_goal, goal_d.shape)
        closest_goal = (
            jnp.argmax(-goal_d / temperature + gg, axis=1).astype(jnp.int32) + 1
        )
    else:
        closest_goal = jnp.argmin(goal_d, axis=1).astype(jnp.int32) + 1
    mission = jnp.where(p2d, DELIVERING, mission)
    loc = jnp.where(p2d, closest_goal, loc)
    time_arr = jnp.where(p2d, t, time_arr)
    at_loc = jnp.where(p2d, False, at_loc)

    # ---- [DELIVERING -> RETURNING] (heuristic.py:97-108) ----
    # Sequential over AGVs: each choice excludes cells already reserved by
    # any current mission, including ones assigned earlier this same step.
    empty = empty_shelf_info(params, env_state) > 0  # (L,) action order
    d2r = elig & (mission == DELIVERING) & at_loc & carrying

    rack_iota = jnp.arange(L, dtype=jnp.int32)

    def ret_one(carry, xs):
        mission, loc, time_arr, at_loc = carry
        if stochastic:
            i, kk = xs
        else:
            i = xs
        # Scatter-free "reserved" bitmap: TPU scatters are VMEM-write bound
        # (~0.12 ms each at B=1024); the (L, Na) compare+any is pure VPU.
        reserved = jnp.any(
            (loc[None, :] > G) & ((loc - G - 1)[None, :] == rack_iota[:, None]),
            axis=1,
        )
        cand = empty & ~reserved
        d = jnp.where(cand, dist_all[i, G:], INF32)
        if stochastic:
            best = _sampled_argmin(d, kk, temperature)
        else:
            best = jnp.argmin(d).astype(jnp.int32)
        ok = d2r[i] & (d[best] < INF32)
        mission = jnp.where(ok, mission.at[i].set(RETURNING), mission)
        loc = jnp.where(ok, loc.at[i].set(G + 1 + best), loc)
        time_arr = jnp.where(ok, time_arr.at[i].set(t), time_arr)
        at_loc = jnp.where(ok, at_loc.at[i].set(False), at_loc)
        return (mission, loc, time_arr, at_loc), None

    ret_xs = jnp.arange(Na)
    if stochastic:
        ret_xs = (ret_xs, jax.random.split(k_ret, Na))
    (mission, loc, time_arr, at_loc), _ = jax.lax.scan(
        ret_one, (mission, loc, time_arr, at_loc), ret_xs, unroll=4
    )

    # ---- [RETURNING -> None] (heuristic.py:111-113) ----
    done_ret = elig & (mission == RETURNING) & at_loc & (~carrying)
    mission = jnp.where(done_ret, NONE, mission)
    loc = jnp.where(done_ret, 0, loc)
    item_arr = jnp.where(done_ret, 0, item_arr)
    at_loc = jnp.where(done_ret, False, at_loc)

    # ---- Picker dispatch (heuristic.py:116-127) ----
    picker_loc = h.picker_loc
    if params.num_pickers > 0:
        Np = params.num_pickers
        pick_xy = xy[Na:]
        # Pickers whose mission cell is reached: clear (heuristic.py:124-127).
        pcell = params.action_cells[jnp.maximum(picker_loc - 1, 0)]
        p_arrived = (
            (picker_loc > 0)
            & (pick_xy[:, 0] == pcell[:, 1])
            & (pick_xy[:, 1] == pcell[:, 0])
        )
        picker_loc = jnp.where(p_arrived, 0, picker_loc)

        # Oldest PICKING/RETURNING AGV mission per picker zone.
        needs_picker = (mission == PICKING) | (mission == RETURNING)
        m_rack = jnp.where(loc > G, loc - G - 1, 0)
        m_zone = jnp.where(needs_picker, take_ids(zones, m_rack), -1)  # (Na,)
        # priority: older assignment first, then lower agv index
        prio = time_arr * Na + jnp.arange(Na, dtype=jnp.int32)
        prio = jnp.where(needs_picker, prio, jnp.int32(1 << 30))
        # For each picker p: argmin prio among missions with m_zone == p.
        zone_eq = m_zone[None, :] == jnp.arange(Np, dtype=jnp.int32)[:, None]
        prio_p = jnp.where(zone_eq, prio[None, :], 1 << 30)  # (Np, Na)
        best_agv = jnp.argmin(prio_p, axis=1)
        has_mission = jnp.min(prio_p, axis=1) < (1 << 30)
        new_loc = take_ids(loc, best_agv)
        picker_loc = jnp.where(
            (picker_loc == 0) & has_mission, new_loc, picker_loc
        )

    # ---- Actions (heuristic.py:130-133) ----
    agv_actions = jnp.where((mission != NONE) & (~busy), loc, 0)
    actions = jnp.concatenate([agv_actions, picker_loc[: params.num_pickers]])

    new_h = HeuristicState(
        agv_mission=mission,
        agv_loc=loc,
        agv_item=item_arr,
        agv_at_loc=at_loc,
        agv_time=time_arr,
        picker_loc=picker_loc,
        timestep=t + 1,
    )
    return actions, new_h


def reconstruct_state(params: EnvParams, env_state: EnvState) -> HeuristicState:
    """HeuristicState re-derived from the env state alone.

    The dispatcher's bookkeeping is recoverable because the env tracks
    the mission phase implicitly: `agent_busy`/`agent_target` say where
    an agent is heading, `agent_carrying` + `agent_has_delivered`
    (set at the goal, cleared at shelf return — env/step.py:550,637) say
    which leg of the pick->deliver->return cycle it is on. This makes a
    STATELESS expert possible: heuristic_policy(reconstruct_state(s), s)
    labels any state with the dispatcher's action — the expert oracle
    DAgger needs at states a learned policy visits, where threaded
    bookkeeping would desynchronize from reality.

    Deviations from the threaded state (measured in
    tests/test_stateless_expert.py): assignment timestamps are all zero,
    so the picker "oldest mission first" tie-break degrades to
    lowest-AGV-index order.
    """
    Na = params.num_agvs
    G, L = params.num_goals, params.num_racks
    busy = env_state.agent_busy[:Na]
    carrying = env_state.agent_carrying[:Na] > 0
    delivered = env_state.agent_has_delivered[:Na]
    target = env_state.agent_target[:Na]

    # Mission phase per AGV.
    mission = jnp.where(
        carrying & ~delivered,
        jnp.where(busy, DELIVERING, PICKING),
        jnp.where(
            carrying & delivered,
            jnp.where(busy, RETURNING, DELIVERING),
            jnp.where(busy, PICKING, NONE),
        ),
    ).astype(jnp.int32)
    # Idle carrying agents sit exactly where their last leg ended; setting
    # at_loc fires the phase-transition rules (p2d / d2r) that hand them
    # their next destination.
    at_loc = (~busy) & carrying
    loc = jnp.where(busy, target, 0).astype(jnp.int32)

    # Claimed queue items: the shelf a busy pickup-bound AGV is heading
    # to (the FIFO dedup needs it, or another AGV gets the same item).
    rack_shelf = (
        jnp.zeros(L + 1, jnp.int32)
        .at[
            jnp.where(
                grid_at(params.cell_to_rack, env_state.shelf_xy[:, 1],
                        env_state.shelf_xy[:, 0]) >= 0,
                grid_at(params.cell_to_rack, env_state.shelf_xy[:, 1],
                        env_state.shelf_xy[:, 0]),
                L,
            )
        ]
        .set(
            jnp.arange(1, env_state.shelf_xy.shape[0] + 1, dtype=jnp.int32),
            mode="drop",
        )[:L]
    )
    tgt_rack = jnp.where(target > G, target - G - 1, 0)
    heading_to_pick = busy & ~carrying & (target > G)
    item = jnp.where(
        carrying, env_state.agent_carrying[:Na],
        jnp.where(heading_to_pick, take_ids(rack_shelf, tgt_rack), 0),
    ).astype(jnp.int32)

    Np = max(params.num_pickers, 1)
    p_busy = env_state.agent_busy[Na:]
    p_target = env_state.agent_target[Na:]
    picker_loc = jnp.where(p_busy, p_target, 0).astype(jnp.int32)
    picker_loc = jnp.concatenate(
        [picker_loc, jnp.zeros(Np - picker_loc.shape[0], jnp.int32)]
    )[:Np]

    return HeuristicState(
        agv_mission=mission,
        agv_loc=loc,
        agv_item=item,
        agv_at_loc=at_loc,
        agv_time=jnp.zeros(Na, jnp.int32),
        picker_loc=picker_loc,
        timestep=env_state.cur_steps,
    )


def make_stateless_expert(params: EnvParams, layout: Layout):
    """Expert oracle for DAgger (train/train_bc.py): env state -> the
    dispatcher's macro actions, no threaded bookkeeping."""
    if params.num_pickers > 0:
        zones = jnp.asarray(picker_zones(layout, params.num_pickers))
    else:
        zones = jnp.zeros(params.num_racks, jnp.int32)

    def expert(params_, env_state):
        h = reconstruct_state(params_, env_state)
        actions, _ = heuristic_policy(params_, zones, env_state, h)
        return actions

    return expert


def heuristic_episode(env, render: bool = False, seed=None):
    """Reference-compatible episode runner (tarware/heuristic.py:26-146).

    `env` is a gym-adapter Warehouse (swarm_ode_tpu.make(...)). Returns
    (all_infos, global_episode_return, episode_returns) exactly like the
    reference; the whole episode runs as one jitted lax.scan on device.
    """
    import jax
    import numpy as np

    from swarm_ode_tpu.env import step as step_mod

    params, layout = env.params, env.layout
    policy = make_policy(params, layout)
    steps = params.max_steps or 500

    @jax.jit
    def run(key):
        es = step_mod.reset(params, key)
        h = init_state(params)

        def body(carry, _):
            es, h = carry
            a, h = policy(params, es, h)
            es, rew, done, info = step_mod.step(params, es, a)
            return (es, h), (rew, info)

        (es, h), (rewards, infos) = jax.lax.scan(
            body, (es, h), None, length=steps
        )
        return es, rewards, infos

    if seed is None:
        # Unseeded episodes must differ call to call (the reference draws
        # from the ambient global RNG): use a process-level counter.
        seed = heuristic_episode._unseeded_counter
        heuristic_episode._unseeded_counter += 1
    es, rewards, infos = run(jax.random.PRNGKey(seed))
    if render:
        from swarm_ode_tpu.env.rendering import render_state

        render_state(params, layout, es, mode="human")
    rewards = np.asarray(rewards)
    infos = jax.tree.map(np.asarray, infos)
    all_infos = [
        {k: v[t].tolist() if v[t].ndim else v[t].item() for k, v in infos.items()}
        for t in range(steps)
    ]
    episode_returns = rewards.sum(axis=0)
    return all_infos, float(rewards.sum()), episode_returns


heuristic_episode._unseeded_counter = 0


def make_policy(params: EnvParams, layout: Layout, temperature: float = 0.0):
    """Bind zones; returns policy_step(params, env_state, h) -> (actions, h).

    With temperature>0 the returned signature gains a PRNG key —
    policy_step(params, env_state, h, key) — and every AGV choice site
    samples proportional to exp(-distance/T) (the stochastic-expert
    ablation; see heuristic_policy)."""
    if params.num_pickers > 0:
        zones = jnp.asarray(picker_zones(layout, params.num_pickers))
    else:
        zones = jnp.zeros(params.num_racks, jnp.int32)

    if temperature and temperature > 0:

        def policy_step_stoch(params_, env_state, h, key):
            return heuristic_policy(
                params_, zones, env_state, h, key=key, temperature=temperature
            )

        return policy_step_stoch

    def policy_step(params_, env_state, h):
        return heuristic_policy(params_, zones, env_state, h)

    return policy_step
