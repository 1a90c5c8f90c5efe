"""Pallas TPU kernel: VMEM-resident wavefront (BFS) distance fields.

The dynamic replanner (env/pathfinding.py) runs K min-plus relaxation
sweeps over an (A, H, W) distance block. As plain XLA ops each sweep
round-trips the block through HBM: K * 2 * A*H*W * 4B of traffic per env
step (~10 MB for medium) — the dominant cost of the batched env. This
kernel keeps the whole block in VMEM across all K iterations (medium:
28 x 25 x 22 x 4B = 60 KB), so HBM sees one read of the passable mask and
one write of the result.

Layout: the (H, W) grid flattens to one lane dimension with a **wall
column** appended to every row (stride W+1) and a wall row at the bottom:
walls are impassable (INF), so the four lane-rotation neighbor reads need
NO edge masks — a rotation that crosses a row boundary lands on a wall and
self-masks. This cuts the relaxation body from ~14 to ~10 VPU ops.

Batching: each sublane row is one agent's BFS, fully row-independent, so a
batch of envs packs as row concatenation — `bfs_query_pallas` carries a
custom_vmap rule that packs G envs per kernel program instead of pallas's
default one-program-per-env batching (the round-1 bottleneck).
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


def _walled(pas: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) bool -> (..., H*(W+1)) int32 with a wall column."""
    H, W = pas.shape[-2], pas.shape[-1]
    p = jnp.pad(pas.astype(jnp.int32), [(0, 0)] * (pas.ndim - 1) + [(0, 1)])
    return p.reshape(*pas.shape[:-2], H * (W + 1))


def _flat_walled(yx_or_flat_y, x=None, W: int = 0):
    """Flat index in the walled layout (stride W+1)."""
    if x is None:
        raise ValueError
    return yx_or_flat_y * (W + 1) + x


def _relax_body(pas, Ws: int, HWp: int):
    """One min-plus sweep in the walled layout: no edge masks needed."""

    def body(_, d):
        right = pltpu.roll(d, HWp - 1, axis=1)
        left = pltpu.roll(d, 1, axis=1)
        down = pltpu.roll(d, HWp - Ws, axis=1)
        up = pltpu.roll(d, Ws, axis=1)
        best = jnp.minimum(
            jnp.minimum(right, left), jnp.minimum(down, up)
        )
        return jnp.where(pas, jnp.minimum(d, best + 1), d)

    return body


def _bfs_kernel(pas_ref, tgt_ref, out_ref, *, Ws: int, iters: int):
    A, HWp = pas_ref.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (A, HWp), 1)
    pas = pas_ref[:] != 0
    tgt = tgt_ref[:]  # (A, 1) flat walled-layout target index per agent
    dist = jnp.where(col == tgt, jnp.int32(0), INF)
    dist = jax.lax.fori_loop(0, iters, _relax_body(pas, Ws, HWp), dist)
    out_ref[:] = dist


def _bfs_query_kernel(
    pas_ref, tgt_ref, pos_ref, dist_out, nd_out, *, Ws: int, iters: int
):
    """BFS + at-position query fused: emits only each agent's own-cell
    distance and best next-hop direction, so the full (A, HW) field never
    leaves VMEM."""
    A, HWp = pas_ref.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (A, HWp), 1)
    pas = pas_ref[:] != 0
    tgt = tgt_ref[:]
    dist = jnp.where(col == tgt, jnp.int32(0), INF)
    dist = jax.lax.fori_loop(0, iters, _relax_body(pas, Ws, HWp), dist)

    pos = pos_ref[:]  # (A, 1)
    at_pos = col == pos

    def value_at(arr, shift):
        v = pltpu.roll(arr, shift, axis=1)
        return jnp.min(jnp.where(at_pos, v, INF), axis=1, keepdims=True)

    d_here = jnp.min(jnp.where(at_pos, dist, INF), axis=1, keepdims=True)
    pas_i = jnp.where(pas, jnp.int32(0), INF)  # 0 = passable

    # Neighbor preference order: UP, DOWN, LEFT, RIGHT (matches
    # pathfinding._NBR_DIR and the static-field tie-break). Walls self-mask
    # through pas_i = INF.
    cands = [
        (value_at(dist, Ws), value_at(pas_i, Ws), 0),  # UP
        (value_at(dist, HWp - Ws), value_at(pas_i, HWp - Ws), 1),  # DOWN
        (value_at(dist, 1), value_at(pas_i, 1), 2),  # LEFT
        (value_at(dist, HWp - 1), value_at(pas_i, HWp - 1), 3),  # RIGHT
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


def _prep_walled(pas, tgt_flat, pos_flat, W: int):
    """Convert plain-flat (y*W+x) inputs to the walled layout."""
    ty, tx = tgt_flat // W, tgt_flat % W
    out = [ty * (W + 1) + tx]
    if pos_flat is not None:
        py, px = pos_flat // W, pos_flat % W
        out.append(py * (W + 1) + px)
    return _walled(pas), out


def _query_single(pas, tgt_flat, pos_flat, iters, interpret):
    A, H, W = pas.shape
    Ws = W + 1
    n = (H + 1) * Ws  # one wall row at the bottom
    HWp = _round_up(n, 128)
    pw, (tgt_w, pos_w) = _prep_walled(pas, tgt_flat, pos_flat, W)
    pas_flat = jnp.pad(pw, ((0, 0), (0, HWp - H * Ws)))
    tgt = tgt_w.astype(jnp.int32).reshape(A, 1)
    pos = pos_w.astype(jnp.int32).reshape(A, 1)

    d_here, nd = pl.pallas_call(
        functools.partial(_bfs_query_kernel, Ws=Ws, iters=iters),
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


def bfs_query_pallas_batched(
    pas: jnp.ndarray,  # (B, A, H, W) bool
    tgt_flat: jnp.ndarray,  # (B, A) int32, plain flat y*W+x
    pos_flat: jnp.ndarray,  # (B, A) int32
    iters: int,
    envs_per_block: int = 8,
    interpret: bool = False,
):
    """Packed batched replan query: G envs share one kernel program.

    The kernel is row-independent (each sublane row is one agent's BFS), so
    batching envs is pure row concatenation: (B, A, HW) -> (B*A, HWp) with
    a grid over B/G blocks of G*A rows. This amortizes per-program launch
    and pipeline overhead ~G x vs the default one-program-per-env vmap rule
    (the round-1 bottleneck: the kernel was 45% of env step time).
    VMEM per block: G*A*HWp*4B*(~6 live arrays) — G=8 on medium ~5 MB.
    """
    B, A, H, W = pas.shape
    Ws = W + 1
    n = (H + 1) * Ws
    HWp = _round_up(n, 128)
    G = max(1, min(envs_per_block, B))
    Bp = _round_up(B, G)
    nblk = Bp // G

    pw, (tgt_w, pos_w) = _prep_walled(pas, tgt_flat, pos_flat, W)
    pas2 = jnp.pad(
        pw.reshape(B, A * H * Ws), ((0, Bp - B), (0, 0))
    ).reshape(Bp * A, H * Ws)
    pas_flat = jnp.pad(pas2, ((0, 0), (0, HWp - H * Ws)))
    tgt = jnp.pad(tgt_w.astype(jnp.int32), ((0, Bp - B), (0, 0))).reshape(
        Bp * A, 1
    )
    pos = jnp.pad(pos_w.astype(jnp.int32), ((0, Bp - B), (0, 0))).reshape(
        Bp * A, 1
    )

    d_here, nd = pl.pallas_call(
        functools.partial(_bfs_query_kernel, Ws=Ws, iters=iters),
        grid=(nblk,),
        out_shape=(
            jax.ShapeDtypeStruct((Bp * A, 1), jnp.int32),
            jax.ShapeDtypeStruct((Bp * A, 1), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((G * A, HWp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G * A, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G * A, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((G * A, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G * A, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(pas_flat, tgt, pos)
    d_here = d_here.reshape(Bp, A)[:B]
    nd = nd.reshape(Bp, A)[:B]
    return d_here, nd


@functools.lru_cache(maxsize=None)
def _query_fn(iters: int, envs_per_block: int, interpret: bool):
    """custom_vmap wrapper: a vmapped query becomes ONE packed pallas_call
    (G envs per program) instead of pallas's default one-program-per-env
    batching rule."""

    @jax.custom_batching.custom_vmap
    def q(pas, tgt_flat, pos_flat):
        return _query_single(pas, tgt_flat, pos_flat, iters, interpret)

    @q.def_vmap
    def q_vmap(axis_size, in_batched, pas, tgt_flat, pos_flat):
        def bcast(x, b):
            return x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)

        pas = bcast(pas, in_batched[0])
        tgt_flat = bcast(tgt_flat, in_batched[1])
        pos_flat = bcast(pos_flat, in_batched[2])
        out = bfs_query_pallas_batched(
            pas, tgt_flat, pos_flat, iters, envs_per_block, interpret
        )
        return out, (True, True)

    return q


def bfs_query_pallas(
    pas: jnp.ndarray,  # (A, H, W) bool
    tgt_flat: jnp.ndarray,  # (A,) int32
    pos_flat: jnp.ndarray,  # (A,) int32 — agent's own cell
    iters: int,
    interpret: bool = False,
    envs_per_block: int = 8,
):
    """Fused replan query: ((A,) dist-at-own-cell, (A,) next-hop Direction).

    vmap over a batch of envs routes through the packed kernel (see
    bfs_query_pallas_batched)."""
    return _query_fn(int(iters), int(envs_per_block), bool(interpret))(
        pas, tgt_flat, pos_flat
    )


def bfs_dist_pallas(
    pas: jnp.ndarray,  # (A, H, W) bool — passable (targets/self pre-freed)
    tgt_flat: jnp.ndarray,  # (A,) int32 flat target index (y * W + x)
    iters: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(A, H, W) int32 BFS distances; INF where unreachable. vmap-able."""
    A, H, W = pas.shape
    Ws = W + 1
    n = (H + 1) * Ws
    HWp = _round_up(n, 128)
    pw, (tgt_w,) = _prep_walled(pas, tgt_flat, None, W)
    pas_flat = jnp.pad(pw, ((0, 0), (0, HWp - H * Ws)))
    tgt = tgt_w.astype(jnp.int32).reshape(A, 1)

    out = pl.pallas_call(
        functools.partial(_bfs_kernel, Ws=Ws, iters=iters),
        out_shape=jax.ShapeDtypeStruct((A, HWp), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pas_flat, tgt)
    return out[:, : H * Ws].reshape(A, H, Ws)[:, :, :W]
