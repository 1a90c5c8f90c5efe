"""Pallas TPU kernel: VMEM-resident wavefront (BFS) distance fields.

The dynamic replanner (env/pathfinding.py) runs K min-plus relaxation
sweeps over an (A, H, W) distance block. As plain XLA ops each sweep
round-trips the block through HBM: K * 2 * A*H*W * 4B of traffic per env
step (~10 MB for medium) — the dominant cost of the batched env. This
kernel keeps the whole block in VMEM across all K iterations (medium:
28 x 25 x 22 x 4B = 60 KB), so HBM sees one read of the passable mask and
one write of the result.

Grid layout: the (H, W) grid flattens to one lane dimension of H*W (padded
to 128); the four neighbor reads become lane rotations by +-1 and +-W with
edge masks built from a column iota. One batch env per vmap lane (pallas_call
batches via its vmap rule).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = np.int32(1 << 28)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _bfs_kernel(pas_ref, tgt_ref, out_ref, *, H: int, W: int, iters: int):
    A, HWp = pas_ref.shape
    n = H * W
    col = jax.lax.broadcasted_iota(jnp.int32, (A, HWp), 1)
    x = col % W
    pas = pas_ref[:] != 0

    tgt = tgt_ref[:]  # (A, 1) flat target index per agent
    dist = jnp.where(col == tgt, jnp.int32(0), INF)

    # Neighbor validity masks (computed once; loop-invariant).
    ok_right = (x < W - 1) & (col + 1 < n)  # read f+1
    ok_left = x > 0  # read f-1
    ok_down = col + W < n  # read f+W
    ok_up = col >= W  # read f-W

    def body(_, d):
        # pltpu.roll requires non-negative shifts: numpy semantics
        # out[i] = d[(i - shift) mod n], so reading neighbor f+k uses
        # shift = HWp - k.
        right = jnp.where(ok_right, pltpu.roll(d, HWp - 1, axis=1), INF)
        left = jnp.where(ok_left, pltpu.roll(d, 1, axis=1), INF)
        down = jnp.where(ok_down, pltpu.roll(d, HWp - W, axis=1), INF)
        up = jnp.where(ok_up, pltpu.roll(d, W, axis=1), INF)
        best = jnp.minimum(jnp.minimum(right, left), jnp.minimum(down, up))
        return jnp.where(pas, jnp.minimum(d, best + 1), d)

    dist = jax.lax.fori_loop(0, iters, body, dist)
    out_ref[:] = dist


def _bfs_query_kernel(
    pas_ref, tgt_ref, pos_ref, dist_out, nd_out, *, H: int, W: int, iters: int
):
    """BFS + at-position query fused: emits only each agent's own-cell
    distance and best next-hop direction, so the full (A, H*W) field never
    leaves VMEM."""
    A, HWp = pas_ref.shape
    n = H * W
    col = jax.lax.broadcasted_iota(jnp.int32, (A, HWp), 1)
    x = col % W
    pas = pas_ref[:] != 0
    tgt = tgt_ref[:]
    dist = jnp.where(col == tgt, jnp.int32(0), INF)

    ok_right = (x < W - 1) & (col + 1 < n)
    ok_left = x > 0
    ok_down = col + W < n
    ok_up = col >= W

    def body(_, d):
        right = jnp.where(ok_right, pltpu.roll(d, HWp - 1, axis=1), INF)
        left = jnp.where(ok_left, pltpu.roll(d, 1, axis=1), INF)
        down = jnp.where(ok_down, pltpu.roll(d, HWp - W, axis=1), INF)
        up = jnp.where(ok_up, pltpu.roll(d, W, axis=1), INF)
        best = jnp.minimum(jnp.minimum(right, left), jnp.minimum(down, up))
        return jnp.where(pas, jnp.minimum(d, best + 1), d)

    dist = jax.lax.fori_loop(0, iters, body, dist)

    pos = pos_ref[:]  # (A, 1)
    at_pos = col == pos

    def value_at(arr, offset_ok, shift):
        v = jnp.where(offset_ok, pltpu.roll(arr, shift, axis=1), INF)
        return jnp.min(jnp.where(at_pos, v, INF), axis=1, keepdims=True)

    d_here = jnp.min(jnp.where(at_pos, dist, INF), axis=1, keepdims=True)
    pas_i = jnp.where(pas, jnp.int32(0), INF)  # 0 = passable

    # Neighbor preference order: UP, DOWN, LEFT, RIGHT (matches
    # pathfinding._NBR_DIR and the static-field tie-break).
    cands = [
        (value_at(dist, ok_up, W), value_at(pas_i, ok_up, W), 0),  # UP
        (value_at(dist, ok_down, HWp - W), value_at(pas_i, ok_down, HWp - W), 1),
        (value_at(dist, ok_left, 1), value_at(pas_i, ok_left, 1), 2),  # LEFT
        (value_at(dist, ok_right, HWp - 1), value_at(pas_i, ok_right, HWp - 1), 3),
    ]
    best = jnp.full((A, 1), INF)
    nd = jnp.full((A, 1), -1, jnp.int32)
    for dval, p_ok, code in cands:
        c = jnp.where(p_ok == 0, dval, INF)
        take = c < best
        nd = jnp.where(take, code, nd)
        best = jnp.where(take, c, best)
    here_pas = jnp.min(jnp.where(at_pos, pas_i, INF), axis=1, keepdims=True)
    d_here = jnp.where(
        here_pas == 0, d_here, jnp.where(best < INF, best + 1, INF)
    )
    nd = jnp.where((d_here == 0) | (d_here >= INF), -1, nd)
    dist_out[:] = d_here
    nd_out[:] = nd


def bfs_query_pallas(
    pas: jnp.ndarray,  # (A, H, W) bool
    tgt_flat: jnp.ndarray,  # (A,) int32
    pos_flat: jnp.ndarray,  # (A,) int32 — agent's own cell
    iters: int,
    interpret: bool = False,
):
    """Fused replan query: ((A,) dist-at-own-cell, (A,) next-hop Direction)."""
    A, H, W = pas.shape
    HWp = _round_up(H * W, 128)
    pas_flat = jnp.zeros((A, HWp), jnp.int32)
    pas_flat = pas_flat.at[:, : H * W].set(
        pas.reshape(A, H * W).astype(jnp.int32)
    )
    tgt = tgt_flat.astype(jnp.int32).reshape(A, 1)
    pos = pos_flat.astype(jnp.int32).reshape(A, 1)

    d_here, nd = pl.pallas_call(
        functools.partial(_bfs_query_kernel, H=H, W=W, iters=iters),
        out_shape=(
            jax.ShapeDtypeStruct((A, 1), jnp.int32),
            jax.ShapeDtypeStruct((A, 1), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(pas_flat, tgt, pos)
    return d_here[:, 0], nd[:, 0]


def bfs_dist_pallas(
    pas: jnp.ndarray,  # (A, H, W) bool — passable (targets/self pre-freed)
    tgt_flat: jnp.ndarray,  # (A,) int32 flat target index (y * W + x)
    iters: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(A, H, W) int32 BFS distances; INF where unreachable. vmap-able."""
    A, H, W = pas.shape
    HWp = _round_up(H * W, 128)
    pas_flat = jnp.zeros((A, HWp), jnp.int32)
    pas_flat = pas_flat.at[:, : H * W].set(
        pas.reshape(A, H * W).astype(jnp.int32)
    )
    tgt = tgt_flat.astype(jnp.int32).reshape(A, 1)

    out = pl.pallas_call(
        functools.partial(_bfs_kernel, H=H, W=W, iters=iters),
        out_shape=jax.ShapeDtypeStruct((A, HWp), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pas_flat, tgt)
    return out[:, : H * W].reshape(A, H, W)
