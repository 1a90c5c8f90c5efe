"""Bit-packed wavefront BFS: 1 bit per cell, 32 cells per int lane.

The int32 min-plus kernel (ops/bfs_pallas.py) spends ~10 VPU ops per
sweep on every one of 640 lanes per query. For unit edge weights the
same wavefront is pure reachability: `reached |= (neighbor shifts) &
passable`, one BIT per cell — a query's whole grid packs into
WORDS = ceil((H*(W+1) + W+1) / 32) lanes (medium: 19), and
QPR = 128 // WORDS queries ride side-by-side in one 128-lane row.

Two tricks make the packed form practical:

1. **Per-row probe masks**: distance tracking needs the wavefront's
   arrival sweep at 5 cells (agent's own cell + 4 neighbors), whose bit
   positions differ per query. Each probe is shipped as a one-hot
   (rows, 128) bit mask built host-side from pure broadcast compares, and
   the kernel accumulates `cnt += ((r & probe) == 0)` as whole-register
   adds — correct at the probe's lane, garbage elsewhere; only the probe
   lane is read back. (A first design instead cyclically ROTATED every
   query so the tracked cells sat at constant bit positions — but the
   per-row rotation is a (K, M) dynamic gather in XLA, measured at ~10x
   the kernel's own cost per step on real TPU; the probe masks replace
   it with O(K*words) broadcast arithmetic.)
2. **Sweep-count distances**: a cell at BFS distance d stays unset for
   exactly the first d sweeps, so `cnt += (bit still unset)` accumulated
   per sweep IS the distance once the final mask confirms the bit was
   reached.

The packed bit space M = words*32 carries at least Ws margin bits above
the n grid cells. Margin bits are impassable (pas=0) and the wavefront
starts inside the grid (r0 = target bit, r stays a subset of pas), so the
kernel's cyclic cross-word carries only ever inject zeros across the
0/M boundary — neighbor offsets that underflow (top-row "up") wrap into
the margin and correctly read as unreachable.

Next-hop selection (UP, DOWN, LEFT, RIGHT preference, exact tie-break
parity with ops/bfs_pallas._bfs_query_kernel) runs on the host-side XLA
graph over the (K,) extracted values.

Semantics parity is pinned by tests/test_bfs_bitpack.py against the
int32 kernel on random grids and real env masks, and on real TPU by
experiments/bitpack_onchip.py (0/1120 mismatches).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = np.int32(1 << 28)


def _plan(H: int, W: int):
    Ws = W + 1
    if Ws >= 32:
        # The cross-word neighbor carry uses `r << Ws` / `prev >> (32-Ws)`,
        # which assumes a ±Ws shift crosses at most one 32-bit word; wider
        # walled rows would silently mis-pathfind (ADVICE.md round 2).
        raise ValueError(
            f"bitpack32 requires walled width W+1 < 32, got {Ws}; "
            "use bfs_kernel='int32' for this layout"
        )
    n = H * Ws
    words = -(-(n + Ws) // 32)  # ceil; >= one wall-row margin
    M = words * 32
    qpr = 128 // words
    if qpr < 1:
        raise ValueError(f"grid too large for 32-bit packing: {words} words")
    return Ws, n, words, M, qpr


def _bitpack_kernel(pas_ref, r0_ref, probe_refs, cnt_refs, fin_ref, *,
                    words, qpr, iters, Ws):
    u32 = jnp.uint32
    shape = pas_ref.shape

    # Lane-classification masks, built in-kernel from the lane iota
    # (pallas rejects captured trace-time constants as closures).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    used = lane < qpr * words
    w_of = lane % words
    full = jnp.uint32(0xFFFFFFFF)
    zero = jnp.uint32(0)

    def lane_mask(sel):
        return jnp.where(sel, full, zero)

    m_first = lane_mask(used & (w_of == 0))
    m_notfirst = lane_mask(used & (w_of != 0))
    m_last = lane_mask(used & (w_of == words - 1))
    m_notlast = lane_mask(used & (w_of != words - 1))

    pas = pas_ref[:].astype(u32)
    r = r0_ref[:].astype(u32)
    probes = [p[:].astype(u32) for p in probe_refs]
    cnts = [jnp.zeros(shape, jnp.int32) for _ in range(5)]

    def body(_, carry):
        r, cnts = carry
        cnts = [
            c + jnp.where((r & m) == 0, 1, 0)
            for c, m in zip(cnts, probes)
        ]
        # pltpu.roll wants non-negative shifts: -s == 128 - s (mod 128).
        r1 = pltpu.roll(r, 1, axis=1)  # lane l <- word l-1
        rm1 = pltpu.roll(r, 127, axis=1)  # lane l <- word l+1
        rw = pltpu.roll(r, 128 - (words - 1), axis=1)  # l <- l+words-1
        rwm = pltpu.roll(r, words - 1, axis=1)  # lane l <- l-(words-1)
        # carry sources: previous word within the query, or (at word 0)
        # the query's own LAST word — the cyclic wrap; margin bits there
        # are never set, so the wrap injects only zeros (module docstring).
        prev = (r1 & m_notfirst) | (rw & m_first)
        nxt = (rm1 & m_notlast) | (rwm & m_last)
        m_p1 = (r << 1) | (prev >> 31)
        m_m1 = (r >> 1) | (nxt << 31)
        m_pW = (r << Ws) | (prev >> (32 - Ws))
        m_mW = (r >> Ws) | (nxt << (32 - Ws))
        r = (r | m_p1 | m_m1 | m_pW | m_mW) & pas
        return r, cnts

    r, cnts = jax.lax.fori_loop(0, iters, body, (r, cnts))
    for ref, c in zip(cnt_refs, cnts):
        ref[:] = c
    fin_ref[:] = r.astype(jnp.int32)


def _pack_rows(vals_u32, qpr, words, rb):
    """(K, words) uint32 -> (R, 128) int32 rows of qpr queries, R a
    multiple of rb."""
    K = vals_u32.shape[0]
    Kp = -(-K // qpr) * qpr
    v = jnp.pad(vals_u32, ((0, Kp - K), (0, 0)))
    rows = v.reshape(Kp // qpr, qpr * words)
    rows = jnp.pad(rows, ((0, 0), (0, 128 - qpr * words)))
    R = rows.shape[0]
    Rp = -(-R // rb) * rb
    return jnp.pad(rows, ((0, Rp - R), (0, 0))).astype(jnp.int32), K, Kp


def _extract_at(buf, qpr, words, w_idx, K):
    """(R, 128) -> (K,) value at each query's per-row word lane w_idx."""
    v = buf[:, : qpr * words].reshape(-1, words)[:K]
    return jnp.take_along_axis(v, w_idx[:, None], axis=1)[:, 0]


def bitpack_query_call(pas_flat, tgt, pos, H, W, iters,
                       rows_per_block=128, interpret=False):
    """Drop-in equivalent of ops.bfs_pallas._pallas_query_call over plain
    walled-flat inputs: pas_flat (K, >=n) int {0,1}, tgt/pos (K,) or
    (K, 1) walled-flat indices. Returns (d_here (K,1), nd (K,1)) int32
    with identical semantics to the int32 kernel."""
    Ws, n, words, M, qpr = _plan(H, W)
    K = pas_flat.shape[0]
    tgt = tgt.reshape(K).astype(jnp.int32)
    pos = pos.reshape(K).astype(jnp.int32)
    pas = pas_flat[:, :n].astype(jnp.int32)

    # Pack 32 cells/lane in absolute (unrotated) bit space; bits >= n are
    # the impassable margin. Disjoint shifted bits: sum == or.
    pasM = jnp.pad(pas, ((0, 0), (0, M - n)))
    shifts = jnp.asarray(np.arange(32, dtype=np.uint32), jnp.uint32)
    packed = (
        (pasM.reshape(K, words, 32).astype(jnp.uint32)
         << shifts[None, None, :])
        .sum(-1, dtype=jnp.uint32)
    )

    word_iota = jnp.arange(words, dtype=jnp.int32)[None, :]

    def bit_words(p):
        """(K,) absolute bit positions -> (K, words) one-hot bit masks."""
        return jnp.where(
            word_iota == (p // 32)[:, None],
            jnp.uint32(1) << (p % 32).astype(jnp.uint32)[:, None],
            jnp.uint32(0),
        )

    reach0 = bit_words(tgt)
    # Probe positions: own cell + 4 neighbors, mod M so top-row "up" (and
    # friends) wraps into the never-reached margin -> reads as INF.
    names = ("pos", "up", "down", "left", "right")
    deltas = (0, -Ws, Ws, -1, 1)
    sp_pos = {k: (pos + d) % M for k, d in zip(names, deltas)}

    rb = rows_per_block
    pasP, K_, Kp = _pack_rows(packed, qpr, words, rb)
    r0P, _, _ = _pack_rows(reach0, qpr, words, rb)
    probePs = [_pack_rows(bit_words(sp_pos[k]), qpr, words, rb)[0]
               for k in names]
    R = pasP.shape[0]

    kern = functools.partial(
        _bitpack_kernel, words=words, qpr=qpr, iters=iters, Ws=Ws,
    )

    def wrapped(pas_ref, r0_ref, p0, p1, p2, p3, p4,
                c0, c1, c2, c3, c4, fin):
        kern(pas_ref, r0_ref, (p0, p1, p2, p3, p4),
             (c0, c1, c2, c3, c4), fin)

    spec = pl.BlockSpec((rb, 128), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        wrapped,
        grid=(R // rb,),
        out_shape=tuple(
            jax.ShapeDtypeStruct((R, 128), jnp.int32) for _ in range(6)
        ),
        in_specs=[spec] * 7,
        out_specs=tuple(spec for _ in range(6)),
        interpret=interpret,
    )(pasP, r0P, *probePs)
    cnt_bufs = dict(zip(names, outs[:5]))
    fin = outs[5]

    d = {}
    for name in names:
        w_idx = sp_pos[name] // 32
        bit = (sp_pos[name] % 32).astype(jnp.uint32)
        cnt = _extract_at(cnt_bufs[name], qpr, words, w_idx, K)
        f = _extract_at(fin, qpr, words, w_idx, K).astype(jnp.uint32)
        reach = (f >> bit) & 1
        d[name] = jnp.where(reach == 1, cnt, INF)

    # Neighbor passability from the unpacked mask (same treatment as the
    # int32 kernel's pas_i: wall margin and out-of-range are impassable).
    def pas_at(delta):
        idx = (pos + delta) % M
        ok = (idx < n) & (
            jnp.take_along_axis(pas, jnp.minimum(idx, n - 1)[:, None],
                                axis=1)[:, 0]
            > 0
        )
        return ok

    order = (("up", -Ws), ("down", Ws), ("left", -1), ("right", 1))
    best = jnp.full((K,), INF, jnp.int32)
    nd = jnp.full((K,), -1, jnp.int32)
    for code, (name, delta) in enumerate(order):
        c = jnp.where(pas_at(delta), d[name], INF)
        take = c < best
        nd = jnp.where(take, code, nd)
        best = jnp.where(take, c, best)
    d_here = d["pos"]
    here_ok = pas_at(0)
    d_here = jnp.where(
        here_ok, d_here, jnp.where(best < INF, best + 1, INF)
    )
    nd = jnp.where((d_here == 0) | (d_here >= INF), -1, nd)
    return d_here[:, None], nd[:, None]
