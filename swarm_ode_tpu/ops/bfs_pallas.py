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


def _pallas_query_call(pas_flat, tgt, pos, Ws, iters, rows_per_block, interpret):
    """pallas_call over (R, HWp) rows in blocks of rows_per_block."""
    R, HWp = pas_flat.shape
    assert R % rows_per_block == 0
    nblk = R // rows_per_block
    rb = rows_per_block
    return pl.pallas_call(
        functools.partial(_bfs_query_kernel, Ws=Ws, iters=iters),
        grid=(nblk,),
        out_shape=(
            jax.ShapeDtypeStruct((R, 1), jnp.int32),
            jax.ShapeDtypeStruct((R, 1), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((rb, HWp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(pas_flat, tgt, pos)


def _query_walled_single(pas_w, tgt_w, pos_w, H, W, iters, interpret,
                         rows_per_block=None):
    """All-rows query for one env. pas_w: (A, H*(W+1)) bool walled-flat."""
    A, n = pas_w.shape
    Ws = W + 1
    HWp = _round_up(n + Ws, 128)  # >= one wall row of margin at the bottom
    rb = rows_per_block or A
    Ap = _round_up(A, rb)
    pas_flat = jnp.pad(pas_w.astype(jnp.int32), ((0, Ap - A), (0, HWp - n)))
    tgt = jnp.pad(tgt_w.astype(jnp.int32), (0, Ap - A)).reshape(Ap, 1)
    pos = jnp.pad(pos_w.astype(jnp.int32), (0, Ap - A)).reshape(Ap, 1)
    d_here, nd = _pallas_query_call(pas_flat, tgt, pos, Ws, iters, rb, interpret)
    return d_here[:A, 0], nd[:A, 0], jnp.int32(0)


def bfs_query_walled_batched(
    pas_w: jnp.ndarray,  # (B, A, H*(W+1)) bool, walled-flat
    tgt_w: jnp.ndarray,  # (B, A) int32 walled-flat target index
    pos_w: jnp.ndarray,  # (B, A) int32 walled-flat own cell
    need: jnp.ndarray,  # (B, A) bool — rows whose result is consumed
    H: int,
    W: int,
    iters: int,
    row_frac: float = 0.5,
    rows_per_block: int = 256,
    interpret: bool = False,
):
    """Globally-compacted batched replan query.

    The kernel is row-independent (each sublane row is one agent's BFS), so
    the whole batch flattens to B*A rows and ONLY the rows whose results the
    env step actually consumes (`need`: replanning agents, potential clash
    triggers, stuck candidates — measured ~45% of rows on medium) are
    gathered into a dense K = row_frac*B*A row block before the kernel runs.
    Results scatter back; un-needed rows report (INF, -1). If more rows are
    flagged than the budget (batch-sums concentrate tightly, so this is
    rare), the overflow count per env is returned for monitoring instead of
    failing silently (SURVEY.md §7 'no silent truncation').

    This supersedes round 1's `replan_budget` approximation: compaction is
    exact for every consumed row.
    """
    B, A, n = pas_w.shape
    Ws = W + 1
    HWp = _round_up(n + Ws, 128)
    BA = B * A
    BAp = _round_up(BA, rows_per_block)
    K = _round_up(max(int(BA * row_frac), 1), rows_per_block)

    pas2 = pas_w.reshape(BA, n)
    tgt2 = tgt_w.reshape(BA).astype(jnp.int32)
    pos2 = pos_w.reshape(BA).astype(jnp.int32)

    if K >= BA:  # no compaction: run every row
        pas_flat = jnp.pad(
            pas2.astype(jnp.int32), ((0, BAp - BA), (0, HWp - n))
        )
        tgt = jnp.pad(tgt2, (0, BAp - BA)).reshape(BAp, 1)
        pos = jnp.pad(pos2, (0, BAp - BA)).reshape(BAp, 1)
        d, nd = _pallas_query_call(
            pas_flat, tgt, pos, Ws, iters, rows_per_block, interpret
        )
        return (
            d[:BA, 0].reshape(B, A),
            nd[:BA, 0].reshape(B, A),
            jnp.zeros(B, jnp.int32),
        )

    flags = need.reshape(BA)
    iota = jnp.arange(BA, dtype=jnp.int32)
    prio = jnp.where(flags, iota, iota + BA)
    chosen = jnp.argsort(prio)[:K]  # flagged rows first, stable by index

    pasK = jnp.pad(
        jnp.take(pas2, chosen, axis=0).astype(jnp.int32),
        ((0, 0), (0, HWp - n)),
    )
    tgtK = jnp.take(tgt2, chosen).reshape(K, 1)
    posK = jnp.take(pos2, chosen).reshape(K, 1)
    dK, ndK = _pallas_query_call(
        pasK, tgtK, posK, Ws, iters, rows_per_block, interpret
    )

    d = jnp.full(BA, INF, jnp.int32).at[chosen].set(dK[:, 0])
    nd = jnp.full(BA, -1, jnp.int32).at[chosen].set(ndK[:, 0])
    covered = jnp.zeros(BA, jnp.bool_).at[chosen].set(True)
    overflow = jnp.sum((flags & ~covered).reshape(B, A), axis=1).astype(
        jnp.int32
    )
    return d.reshape(B, A), nd.reshape(B, A), overflow


def _passable_rows(occK, classK, tgtK, posK, pick_w, H, W):
    """(K, n) int32 passable masks for K compacted rows — the same
    semantics as env/pathfinding.passable_walled, but built only for the
    rows the kernel will actually run. occK: (K, n) bool env occupancy,
    classK: (K,) int32, tgtK/posK: (K,) walled-flat indices."""
    n = H * (W + 1)
    free_w = jnp.pad(
        jnp.ones((H, W), jnp.bool_), ((0, 0), (0, 1))
    ).reshape(n)
    base = jnp.where(
        (classK == 1)[:, None], pick_w[None, :], free_w[None, :]
    )
    col = jax.lax.broadcasted_iota(jnp.int32, base.shape, 1)
    pas = base & ~occK
    return (
        pas | (col == tgtK[:, None]) | (col == posK[:, None])
    ).astype(jnp.int32)


def bfs_query_occ_batched(
    occ_w: jnp.ndarray,  # (B, n) bool — per-env walled-flat occupancy
    tgt_w: jnp.ndarray,  # (B, A) int32 walled-flat target index
    pos_w: jnp.ndarray,  # (B, A) int32 walled-flat own cell
    classes: jnp.ndarray,  # (A,) int32 0 = free grid, 1 = picker
    need: jnp.ndarray,  # (B, A) bool
    pick_w: jnp.ndarray,  # (n,) bool — picker-passable base mask
    H: int,
    W: int,
    iters: int,
    row_frac: float = 0.5,
    rows_per_block: int = 256,
    interpret: bool = False,
    kernel: str = "int32",
):
    """Compaction-first batched replan query.

    The predecessor (bfs_query_walled_batched) received fully-built
    (B, A, n) passable masks and then kept only ~row_frac of the rows —
    paying mask construction and HBM traffic for every discarded row
    (~1.9x the kernel's own cost at B=1024 medium). Here row selection
    happens FIRST and the (K, n) masks are built from the (B, n) per-env
    occupancy + static base masks only for the chosen rows. Bit-identical
    results (tests/test_pallas_kernels.py pins it)."""
    B, n = occ_w.shape
    A = tgt_w.shape[1]
    Ws = W + 1
    HWp = _round_up(n + Ws, 128)
    BA = B * A
    K = _round_up(max(int(BA * row_frac), 1), rows_per_block)

    tgt2 = tgt_w.reshape(BA).astype(jnp.int32)
    pos2 = pos_w.reshape(BA).astype(jnp.int32)
    a_of = jnp.arange(BA, dtype=jnp.int32) % A

    if K >= BA:  # no compaction: run every row
        chosen = jnp.arange(BA, dtype=jnp.int32)
        Kp = _round_up(BA, rows_per_block)
    else:
        flags = need.reshape(BA)
        iota = jnp.arange(BA, dtype=jnp.int32)
        prio = jnp.where(flags, iota, iota + BA)
        chosen = jnp.argsort(prio)[:K]  # flagged rows first, stable
        Kp = K

    occK = jnp.take(occ_w, chosen // A, axis=0)  # (K, n)
    classK = jnp.take(classes.astype(jnp.int32), jnp.take(a_of, chosen))
    tgtK = jnp.take(tgt2, chosen)
    posK = jnp.take(pos2, chosen)
    pasK = _passable_rows(occK, classK, tgtK, posK, pick_w, H, W)
    if kernel == "bitpack32":
        from swarm_ode_tpu.ops.bfs_bitpack import bitpack_query_call

        dK, ndK = bitpack_query_call(
            pasK, tgtK, posK, H, W, iters,
            rows_per_block=min(rows_per_block, 128), interpret=interpret,
        )
        pad_rows = Kp - dK.shape[0]
        dK = jnp.pad(dK, ((0, pad_rows), (0, 0)), constant_values=INF)
        ndK = jnp.pad(ndK, ((0, pad_rows), (0, 0)), constant_values=-1)
    else:
        pad_rows = Kp - pasK.shape[0]
        pasK = jnp.pad(pasK, ((0, pad_rows), (0, HWp - n)))
        dK, ndK = _pallas_query_call(
            pasK,
            jnp.pad(tgtK, (0, pad_rows)).reshape(Kp, 1),
            jnp.pad(posK, (0, pad_rows)).reshape(Kp, 1),
            Ws, iters, rows_per_block, interpret,
        )

    if K >= BA:
        return (
            dK[:BA, 0].reshape(B, A),
            ndK[:BA, 0].reshape(B, A),
            jnp.zeros(B, jnp.int32),
        )
    d = jnp.full(BA, INF, jnp.int32).at[chosen].set(dK[:K, 0])
    nd = jnp.full(BA, -1, jnp.int32).at[chosen].set(ndK[:K, 0])
    covered = jnp.zeros(BA, jnp.bool_).at[chosen].set(True)
    overflow = jnp.sum(
        (need.reshape(BA) & ~covered).reshape(B, A), axis=1
    ).astype(jnp.int32)
    return d.reshape(B, A), nd.reshape(B, A), overflow


@functools.lru_cache(maxsize=None)
def _occ_query_fn(
    H: int, W: int, iters: int, row_frac: float, rows_per_block: int,
    interpret: bool, kernel: str = "int32",
):
    """custom_vmap wrapper for the compaction-first occ-based query."""

    @jax.custom_batching.custom_vmap
    def q(occ_w, tgt_w, pos_w, need, classes, pick_w):
        pas_w = (
            _passable_rows(
                jnp.broadcast_to(occ_w, (tgt_w.shape[0],) + occ_w.shape),
                classes.astype(jnp.int32), tgt_w.astype(jnp.int32),
                pos_w.astype(jnp.int32), pick_w, H, W,
            )
            != 0
        )
        return _query_walled_single(
            pas_w, tgt_w, pos_w, H, W, iters, interpret
        )

    @q.def_vmap
    def q_vmap(axis_size, in_batched, occ_w, tgt_w, pos_w, need, classes,
               pick_w):
        def bcast(x, b):
            return x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)

        occ_w = bcast(occ_w, in_batched[0])
        tgt_w = bcast(tgt_w, in_batched[1])
        pos_w = bcast(pos_w, in_batched[2])
        need = bcast(need, in_batched[3])
        # classes / pick_w are per-layout constants, never batched.
        out = bfs_query_occ_batched(
            occ_w, tgt_w, pos_w, classes, need, pick_w, H, W, iters,
            row_frac, rows_per_block, interpret, kernel,
        )
        return out, (True, True, True)

    return q


def bfs_query_occ(
    occ_w: jnp.ndarray,  # (n,) bool walled-flat occupancy
    tgt_w: jnp.ndarray,  # (A,) int32 walled-flat
    pos_w: jnp.ndarray,  # (A,) int32 walled-flat
    need: jnp.ndarray,  # (A,) bool
    classes: jnp.ndarray,  # (A,) int32
    pick_w: jnp.ndarray,  # (n,) bool
    H: int,
    W: int,
    iters: int,
    row_frac: float = 0.5,
    rows_per_block: int = 256,
    interpret: bool = False,
    kernel: str = "int32",
):
    """Compaction-first replan query. Returns (d, nd, overflow). Single-env
    calls compute every row (always on the int32 kernel — results are
    identical, tested); vmap routes through bfs_query_occ_batched, which
    builds passable masks only for the compacted rows and dispatches to
    the configured kernel variant."""
    return _occ_query_fn(
        int(H), int(W), int(iters), float(row_frac), int(rows_per_block),
        bool(interpret), str(kernel),
    )(occ_w, tgt_w, pos_w, need, classes, pick_w)


@functools.lru_cache(maxsize=None)
def _walled_query_fn(
    H: int, W: int, iters: int, row_frac: float, rows_per_block: int,
    interpret: bool,
):
    """custom_vmap wrapper: a vmapped walled query becomes ONE compacted
    packed pallas_call over the whole batch's rows instead of pallas's
    default one-program-per-env batching rule."""

    @jax.custom_batching.custom_vmap
    def q(pas_w, tgt_w, pos_w, need):
        return _query_walled_single(pas_w, tgt_w, pos_w, H, W, iters, interpret)

    @q.def_vmap
    def q_vmap(axis_size, in_batched, pas_w, tgt_w, pos_w, need):
        def bcast(x, b):
            return x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)

        pas_w = bcast(pas_w, in_batched[0])
        tgt_w = bcast(tgt_w, in_batched[1])
        pos_w = bcast(pos_w, in_batched[2])
        need = bcast(need, in_batched[3])
        out = bfs_query_walled_batched(
            pas_w, tgt_w, pos_w, need, H, W, iters, row_frac,
            rows_per_block, interpret,
        )
        return out, (True, True, True)

    return q


def bfs_query_walled(
    pas_w: jnp.ndarray,  # (A, H*(W+1)) bool walled-flat
    tgt_w: jnp.ndarray,  # (A,) int32 walled-flat
    pos_w: jnp.ndarray,  # (A,) int32 walled-flat
    need: jnp.ndarray,  # (A,) bool
    H: int,
    W: int,
    iters: int,
    row_frac: float = 0.5,
    rows_per_block: int = 256,
    interpret: bool = False,
):
    """Fused replan query in the walled layout. Returns (d, nd, overflow).

    Single-env calls compute every row; vmap over a batch routes through the
    globally-compacted packed kernel (bfs_query_walled_batched)."""
    return _walled_query_fn(
        int(H), int(W), int(iters), float(row_frac), int(rows_per_block),
        bool(interpret),
    )(pas_w, tgt_w, pos_w, need)


def bfs_query_pallas(
    pas: jnp.ndarray,  # (A, H, W) bool
    tgt_flat: jnp.ndarray,  # (A,) int32, plain flat y*W+x
    pos_flat: jnp.ndarray,  # (A,) int32 — agent's own cell
    iters: int,
    interpret: bool = False,
):
    """Fused replan query with plain (H, W) inputs: thin converter into the
    walled layout (kept for tests and non-hot callers)."""
    A, H, W = pas.shape
    Ws = W + 1
    pas_w = _walled(pas) != 0
    tgt_w = (tgt_flat // W) * Ws + tgt_flat % W
    pos_w = (pos_flat // W) * Ws + pos_flat % W
    d, nd, _ = bfs_query_walled(
        pas_w, tgt_w, pos_w, jnp.ones(A, jnp.bool_), H, W, iters,
        interpret=interpret,
    )
    return d, nd


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
    pw = _walled(pas)
    tgt_w = (tgt_flat // W) * Ws + tgt_flat % W
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
