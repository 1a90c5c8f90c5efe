"""On-device dynamic path planning.

Replaces the reference's `find_path(..., care_for_agents=True)` calls
(warehouse.py:469 clash replan, :502 stuck replan), which run native A* with
current agent positions as obstacles. On unit-cost grids BFS == A*, and a
batched min-plus relaxation over the grid is the vmappable / compilable form.

Two implementations:
  * `dynamic_fields` — pure jnp `lax.scan` stencil relaxation (reference
    implementation; always correct).
  * a Pallas VMEM-resident kernel (see swarm_ode_tpu/ops/bfs_pallas.py) that
    keeps the (A, H, W) distance block on-chip across iterations.
"""
from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from swarm_ode_tpu.definitions import Direction
from swarm_ode_tpu.env.state import EnvParams

INF32 = jnp.int32(1 << 28)

# Neighbor preference order (must match layout.NEIGHBOR_DYDX): UP, DOWN,
# LEFT, RIGHT as (dy, dx).
_NBR_DYDX = ((-1, 0), (1, 0), (0, -1), (0, 1))
_NBR_DIR = (Direction.UP, Direction.DOWN, Direction.LEFT, Direction.RIGHT)


def _shift(d: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """_shift(d, dy, dx)[..., y, x] == d[..., y+dy, x+dx], INF out of bounds."""
    out = jnp.full_like(d, INF32)
    H, W = d.shape[-2], d.shape[-1]
    ys = slice(max(0, dy), H + min(0, dy))
    yd = slice(max(0, -dy), H - max(0, dy))
    xs = slice(max(0, dx), W + min(0, dx))
    xd = slice(max(0, -dx), W - max(0, dx))
    return out.at[..., yd, xd].set(d[..., ys, xs])


def passable_grid(params, occupied, targets_yx, self_yx, classes):
    """(A, H, W) passable mask for per-agent replanning, plus the target
    mask. Targets and own cells are freed without scatters (equality
    masks), mirroring find_path's grid edits (warehouse.py:285,:303)."""
    A = targets_yx.shape[0]
    H, W = params.grid_h, params.grid_w
    free = jnp.ones((H, W), jnp.bool_)
    base = jnp.stack([free, params.picker_passable])  # (2, H, W)
    pas = base[classes] & ~occupied[None]  # (A, H, W)
    ys = jax.lax.broadcasted_iota(jnp.int32, (A, H, W), 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (A, H, W), 2)
    is_tgt = (ys == targets_yx[:, 0, None, None]) & (
        xs == targets_yx[:, 1, None, None]
    )
    is_self = (ys == self_yx[:, 0, None, None]) & (
        xs == self_yx[:, 1, None, None]
    )
    return pas | is_tgt | is_self, is_tgt


def passable_walled(params, occupied, targets_yx, self_yx, classes):
    """(A, H*(W+1)) bool passable mask directly in the kernel's walled-flat
    layout (ops/bfs_pallas.py): same semantics as passable_grid, but never
    materializes (A, H, W) in a layout the kernel input must transpose
    (the pad+reshape copy was 0.6 ms/step at B=1024)."""
    A = targets_yx.shape[0]
    H, W = params.grid_h, params.grid_w
    Ws = W + 1
    n = H * Ws
    occ_w = jnp.pad(occupied, ((0, 0), (0, 1))).reshape(n)
    # Constant-folded walled base masks (params are closure constants).
    free_w = jnp.pad(jnp.ones((H, W), jnp.bool_), ((0, 0), (0, 1))).reshape(n)
    pick_w = jnp.pad(params.picker_passable, ((0, 0), (0, 1))).reshape(n)
    base = jnp.where((classes == 1)[:, None], pick_w[None, :], free_w[None, :])
    pas = base & ~occ_w[None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (A, n), 1)
    tgt_w = targets_yx[:, 0] * Ws + targets_yx[:, 1]
    pos_w = self_yx[:, 0] * Ws + self_yx[:, 1]
    return pas | (col == tgt_w[:, None]) | (col == pos_w[:, None])


def replan_query(params, occupied, targets_yx, self_yx, classes, need=None):
    """Fused replan lookup: distance-to-target and next-hop at each agent's
    own cell only. Returns (d, nd, overflow).

    `need` marks the rows whose results the step actually consumes
    (replanning agents + potential clash triggers + stuck candidates); on
    the Pallas backend a vmapped batch compacts to those rows globally
    before the kernel runs (see ops/bfs_pallas.bfs_query_walled_batched).
    Rows outside `need` return (INF, -1). `overflow` counts need-rows that
    exceeded the compaction budget (0 in the uncompacted paths)."""
    A = classes.shape[0]
    H, W = params.grid_h, params.grid_w
    if need is None:
        need = jnp.ones(A, jnp.bool_)
    if params.bfs_backend == "pallas":
        from swarm_ode_tpu.ops.bfs_pallas import bfs_query_occ

        Ws = W + 1
        n = H * Ws
        # Compaction-first: ship only the (n,) per-env occupancy; the
        # (rows, n) passable masks are built inside the batched rule for
        # the compacted rows alone (ops/bfs_pallas.bfs_query_occ_batched)
        # — building them for every row up front cost ~2x the kernel.
        occ_w = jnp.pad(occupied, ((0, 0), (0, 1))).reshape(n)
        pick_w = jnp.pad(
            params.picker_passable, ((0, 0), (0, 1))
        ).reshape(n)
        tgt_w = targets_yx[:, 0] * Ws + targets_yx[:, 1]
        pos_w = self_yx[:, 0] * Ws + self_yx[:, 1]
        return bfs_query_occ(
            occ_w, tgt_w, pos_w, need, classes, pick_w, H, W,
            params.dynamic_bfs_iters, row_frac=params.replan_row_frac,
            rows_per_block=128, kernel=params.bfs_kernel,
        )
    dist, pas = dynamic_fields(params, occupied, targets_yx, self_yx, classes)
    d, nd = dist_nextdir_at(params, dist, pas, self_yx)
    return d, nd, jnp.int32(0)


def dynamic_fields(
    params: EnvParams,
    occupied: jnp.ndarray,  # (H, W) bool — cells holding any agent
    targets_yx: jnp.ndarray,  # (A, 2) int32 target cell per agent (y, x)
    self_yx: jnp.ndarray,  # (A, 2) int32 agent's own cell (y, x)
    classes: jnp.ndarray,  # (A,) int32 0 = free grid, 1 = picker
):
    """Per-agent BFS distance + next-hop with agents as obstacles.

    Mirrors find_path(care_for_agents=True) (warehouse.py:280-303): both
    agent layers are obstacles, the target cell and the agent's own cell are
    forced free, and pickers keep their highway-only restriction.

    Returns (dist, next_dir): (A, H, W) int32 / int8.
    """
    pas, is_tgt = passable_grid(params, occupied, targets_yx, self_yx, classes)
    H, W = params.grid_h, params.grid_w

    if params.bfs_backend == "pallas":
        from swarm_ode_tpu.ops.bfs_pallas import bfs_dist_pallas

        tgt_flat = targets_yx[:, 0] * W + targets_yx[:, 1]
        dist = bfs_dist_pallas(pas, tgt_flat, params.dynamic_bfs_iters)
        return dist, pas

    dist = jnp.where(is_tgt, 0, INF32)

    def relax(d, _):
        best = jnp.full_like(d, INF32)
        for dy, dx in _NBR_DYDX:
            best = jnp.minimum(best, _shift(d, dy, dx))
        d = jnp.where(pas, jnp.minimum(d, best + 1), d)
        return d, None

    dist, _ = jax.lax.scan(relax, dist, None, length=params.dynamic_bfs_iters)
    return dist, pas


def dist_nextdir_at(
    params: EnvParams,
    dist: jnp.ndarray,  # (A, H, W) from dynamic_fields
    pas: jnp.ndarray,  # (A, H, W) passable from dynamic_fields
    at_yx: jnp.ndarray,  # (A, 2) (y, x) query cell per agent
):
    """Distance and next-hop direction at one cell per agent.

    Only the agents' own cells are ever queried per step, so the full-grid
    next-hop field is never materialized (compile/runtime saving vs the
    static precomputed fields, which are host-side numpy).
    """
    A = dist.shape[0]
    H, W = params.grid_h, params.grid_w
    aidx = jnp.arange(A)
    yq, xq = at_yx[:, 0], at_yx[:, 1]
    best = jnp.full(A, INF32)
    next_dir = jnp.full(A, -1, jnp.int32)
    for (dy, dx), dval in zip(_NBR_DYDX, _NBR_DIR):
        ny = yq + dy
        nx = xq + dx
        in_b = (ny >= 0) & (ny < H) & (nx >= 0) & (nx < W)
        nyc = jnp.clip(ny, 0, H - 1)
        nxc = jnp.clip(nx, 0, W - 1)
        nbr = jnp.where(in_b, dist[aidx, nyc, nxc], INF32)
        nbr_pas = in_b & pas[aidx, nyc, nxc]
        cand = jnp.where(nbr_pas, nbr, INF32)
        take = cand < best
        next_dir = jnp.where(take, jnp.int32(dval), next_dir)
        best = jnp.where(take, cand, best)
    d_here = dist[aidx, yq, xq]
    here_pas = pas[aidx, yq, xq]
    # Step-off semantics for agents standing on an impassable cell.
    d_here = jnp.where(
        here_pas, d_here, jnp.where(best < INF32, best + 1, INF32)
    )
    next_dir = jnp.where((d_here == 0) | (d_here >= INF32), -1, next_dir)
    return d_here, next_dir


