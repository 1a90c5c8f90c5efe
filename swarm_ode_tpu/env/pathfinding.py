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
    A = targets_yx.shape[0]
    H, W = params.grid_h, params.grid_w
    free = jnp.ones((H, W), jnp.bool_)
    base = jnp.stack([free, params.picker_passable])  # (2, H, W)
    pas = base[classes] & ~occupied[None]  # (A, H, W)
    aidx = jnp.arange(A)
    pas = pas.at[aidx, targets_yx[:, 0], targets_yx[:, 1]].set(True)
    pas = pas.at[aidx, self_yx[:, 0], self_yx[:, 1]].set(True)

    dist = jnp.full((A, H, W), INF32)
    dist = dist.at[aidx, targets_yx[:, 0], targets_yx[:, 1]].set(0)

    def relax(d, _):
        best = jnp.full_like(d, INF32)
        for dy, dx in _NBR_DYDX:
            best = jnp.minimum(best, _shift(d, dy, dx))
        d = jnp.where(pas, jnp.minimum(d, best + 1), d)
        return d, None

    dist, _ = jax.lax.scan(relax, dist, None, length=params.dynamic_bfs_iters)

    # Next-hop toward the best *passable* neighbor (preference order).
    next_dir = jnp.full((A, H, W), -1, jnp.int8)
    best = jnp.full((A, H, W), INF32)
    for (dy, dx), dval in zip(_NBR_DYDX, _NBR_DIR):
        nbr = _shift(dist, dy, dx)
        nbr_pas = _shift(pas.astype(jnp.int32), dy, dx) == 1
        cand = jnp.where(nbr_pas, nbr, INF32)
        take = cand < best
        next_dir = jnp.where(take, jnp.int8(dval), next_dir)
        best = jnp.where(take, cand, best)
    # Step-off semantics for impassable cells (agent standing inside a rack).
    dist = jnp.where(pas, dist, jnp.where(best < INF32, best + 1, INF32))
    next_dir = jnp.where((dist == 0) | (dist >= INF32), jnp.int8(-1), next_dir)
    return dist, next_dir


