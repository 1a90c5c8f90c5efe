"""On-chip proof for the bitpack32 BFS kernel (VERDICT r2 #1).

1. Mosaic-compiles ops/bfs_bitpack.py (interpret=False) on the real TPU.
2. Asserts bit-identical (d, nd) vs the int32 min-plus kernel on real
   medium-env passable masks (the hot-loop rebuild of
   /root/reference/tarware/warehouse.py:261-317).
3. Wall-clocks both kernels at the bench.py operating point
   (K = row_frac * B * A rows of the medium grid) with a host readback —
   block_until_ready alone lies through the axon tunnel (NOTES.md).

Usage: python experiments/bitpack_onchip.py [--K 12416] [--reps 5]
"""
from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def build_env_rows(n_resets: int, seed0: int = 0):
    """Real medium-env passable rows: one row per agent per reset, plus
    randomized busy/occupancy variety via different reset keys."""
    from swarm_ode_tpu.config import EnvConfig
    from swarm_ode_tpu.env import step as step_mod
    from swarm_ode_tpu.env.layout import build_layout
    from swarm_ode_tpu.env.pathfinding import passable_walled
    from swarm_ode_tpu.env.state import (
        agent_class,
        make_params,
        occupancy_grids,
    )

    cfg = EnvConfig.from_env_id("tarware-medium-19agvs-9pickers-partialobs-v1")
    lay = build_layout(cfg)
    params = make_params(cfg, lay)
    H, W = params.grid_h, params.grid_w
    Ws = W + 1
    cls = agent_class(params)
    A = params.num_agents
    rng = np.random.RandomState(seed0)

    @jax.jit
    def rows_for(key, tgt_idx):
        es = step_mod.reset(params, key)
        agv_g, pick_g, _, _ = occupancy_grids(params, es)
        occ = (agv_g > 0) | (pick_g > 0)
        tgt = params.action_cells[tgt_idx]
        self_yx = es.agent_xy[:, ::-1]
        pas = passable_walled(params, occ, tgt, self_yx, cls)
        return (
            pas.astype(jnp.int32),
            tgt[:, 0] * Ws + tgt[:, 1],
            self_yx[:, 0] * Ws + self_yx[:, 1],
        )

    pases, tgts, poss = [], [], []
    for s in range(n_resets):
        tgt_idx = jnp.asarray(
            rng.randint(params.num_goals, params.num_actions - 1, A)
        )
        p, t, q = rows_for(jax.random.PRNGKey(seed0 + s), tgt_idx)
        pases.append(p)
        tgts.append(t)
        poss.append(q)
    pas = jnp.concatenate(pases)
    tgt = jnp.concatenate(tgts).astype(jnp.int32)
    pos = jnp.concatenate(poss).astype(jnp.int32)
    return params, pas, tgt, pos, H, W


def run_int32(pas, tgt, pos, H, W, iters, rb=128):
    from swarm_ode_tpu.ops.bfs_pallas import _pallas_query_call, _round_up

    K, n = pas.shape
    Ws = W + 1
    HWp = _round_up(n + Ws, 128)
    Kp = _round_up(K, rb)
    pasP = jnp.pad(pas, ((0, Kp - K), (0, HWp - n)))
    t = jnp.pad(tgt, (0, Kp - K)).reshape(Kp, 1)
    p = jnp.pad(pos, (0, Kp - K)).reshape(Kp, 1)
    d, nd = _pallas_query_call(pasP, t, p, Ws, iters, rb, False)
    return d[:K], nd[:K]


def run_bitpack(pas, tgt, pos, H, W, iters, rb=128):
    from swarm_ode_tpu.ops.bfs_bitpack import bitpack_query_call

    return bitpack_query_call(
        pas, tgt, pos, H, W, iters, rows_per_block=rb, interpret=False
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--K", type=int, default=12416,
                    help="timing rows (bench operating point)")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--resets", type=int, default=40)
    args = ap.parse_args()

    print("devices:", jax.devices(), flush=True)
    params, pas, tgt, pos, H, W = build_env_rows(args.resets)
    iters = int(params.dynamic_bfs_iters)
    K = pas.shape[0]
    print(f"parity rows: {K} (H={H} W={W} iters={iters})", flush=True)

    f_int = jax.jit(lambda a, b, c: run_int32(a, b, c, H, W, iters))
    f_bp = jax.jit(lambda a, b, c: run_bitpack(a, b, c, H, W, iters))

    d_i, nd_i = jax.tree.map(np.asarray, f_int(pas, tgt, pos))
    d_b, nd_b = jax.tree.map(np.asarray, f_bp(pas, tgt, pos))
    mism_d = int((d_i != d_b).sum())
    mism_nd = int((nd_i != nd_b).sum())
    print(f"ON-CHIP PARITY: d mismatches={mism_d}/{K} "
          f"nd mismatches={mism_nd}/{K}", flush=True)
    assert mism_d == 0 and mism_nd == 0, "bitpack32 != int32 on chip"

    # Timing at the bench operating point: tile real rows up to K and
    # scan INNER kernel calls inside one jit — a single dispatch pays
    # ~40 ms of tunnel RTT, so per-call time = slope between two scan
    # lengths, not a one-shot wall clock.
    reps_idx = np.resize(np.arange(K), args.K)
    pasT = jnp.asarray(np.asarray(pas)[reps_idx])
    tgtT = jnp.asarray(np.asarray(tgt)[reps_idx])
    posT = jnp.asarray(np.asarray(pos)[reps_idx])

    def chained(fn, n_calls):
        @jax.jit
        def run(pas, tgt, pos):
            def body(acc, _):
                # fold the accumulator into pos (identity: +0 via min with
                # a huge value) so calls can't be CSE'd away
                d, nd = fn(pas, tgt, pos + (acc[:1] & 0))
                return acc + d[:, 0] + nd[:, 0], None

            acc, _ = jax.lax.scan(
                body, jnp.zeros(pas.shape[0], jnp.int32), None,
                length=n_calls,
            )
            return acc

        return run

    n_lo, n_hi = 2, 2 + args.reps
    for name, fn in (
        ("int32", lambda a, b, c: run_int32(a, b, c, H, W, iters)),
        ("bitpack32", lambda a, b, c: run_bitpack(a, b, c, H, W, iters)),
    ):
        t_ms = {}
        for n_calls in (n_lo, n_hi):
            run = chained(fn, n_calls)
            out = run(pasT, tgtT, posT)  # compile + warm
            _ = int(np.asarray(out[0]))
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                out = run(pasT, tgtT, posT)
                _ = int(np.asarray(out[0]))  # real readback
                best = min(best, time.time() - t0)
            t_ms[n_calls] = best * 1e3
        per_call = (t_ms[n_hi] - t_ms[n_lo]) / (n_hi - n_lo)
        print(
            f"{name}: {per_call:.3f} ms/call for K={args.K} rows "
            f"({args.K / per_call * 1e3 / 1e6:.2f}M rows/s; "
            f"raw {n_lo}x={t_ms[n_lo]:.1f}ms {n_hi}x={t_ms[n_hi]:.1f}ms)",
            flush=True,
        )


if __name__ == "__main__":
    main()
