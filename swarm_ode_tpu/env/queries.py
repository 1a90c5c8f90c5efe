"""Gridless occupancy queries.

The reference recomputes 4 dense (H, W) id grids per step
(warehouse.py:319-330) and indexes them. Materializing those grids on TPU
means scatter ops — serialized and slow under vmap. Every query the step
pipeline actually makes is "which agent/shelf occupies cell c?" for a small
set of query cells, which vectorizes as an equality-mask reduction over the
agent/shelf position arrays: pure VPU work, no scatters.
"""
from __future__ import annotations

import jax.numpy as jnp


def occupant_max_id(
    xy: jnp.ndarray,  # (N, 2) entity positions (x, y)
    mask: jnp.ndarray,  # (N,) entity participates
    qx: jnp.ndarray,  # (Q,) query x
    qy: jnp.ndarray,  # (Q,) query y
) -> jnp.ndarray:
    """(Q,) highest 1-based entity id at each query cell (0 = none).

    Highest-id-wins matches the scatter-max convention of
    state.occupancy_grids.
    """
    eq = (xy[None, :, 0] == qx[:, None]) & (xy[None, :, 1] == qy[:, None])
    ids = jnp.arange(1, xy.shape[0] + 1, dtype=jnp.int32)
    return jnp.max(jnp.where(eq & mask[None, :], ids[None, :], 0), axis=1)


def any_at(xy, mask, qx, qy) -> jnp.ndarray:
    """(Q,) bool: any masked entity at the query cell."""
    eq = (xy[None, :, 0] == qx[:, None]) & (xy[None, :, 1] == qy[:, None])
    return jnp.any(eq & mask[None, :], axis=1)
