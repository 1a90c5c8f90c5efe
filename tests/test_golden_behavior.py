"""Golden behavioral regression: seeded heuristic episodes must keep their
aggregate statistics (SURVEY.md §4 — the reference's regression signal is
seeded episodes + the committed stats spreadsheet).

Medium-env parity vs the reference xlsx is checked on TPU runs
(experiments/bfs_iters.py logs); this CPU test pins the tiny-env behavior
against ranges recorded at commit time so semantic drift in the step
pipeline is caught.
"""
import jax
import numpy as np
import pytest

from swarm_ode_tpu.config import EnvConfig
from swarm_ode_tpu.env import step as step_mod
from swarm_ode_tpu.env.env import rollout
from swarm_ode_tpu.env.layout import build_layout
from swarm_ode_tpu.env.state import make_params
from swarm_ode_tpu.policies import heuristic as H


def run_episode_stats(seed: int, deadlock_break: int = 0):
    import dataclasses

    cfg = dataclasses.replace(
        EnvConfig.from_env_id("tarware-tiny-3agvs-2pickers-partialobs-v1"),
        deadlock_break=deadlock_break,
    )
    lay = build_layout(cfg)
    params = make_params(cfg, lay)
    policy = H.make_policy(params, lay)

    @jax.jit
    def run(key):
        es = step_mod.reset(params, key)
        h = H.init_state(params)
        es, h, (rewards, done, info) = rollout(params, policy, h, es, 500)
        return rewards, info

    rewards, info = jax.tree.map(np.asarray, run(jax.random.PRNGKey(seed)))
    return {
        "deliveries": int(info["shelf_deliveries"].sum()),
        "clashes": int(info["clashes"].sum()),
        "stucks": int(info["stucks"].sum()),
        "return": float(rewards.sum()),
    }


def test_tiny_heuristic_stats_in_recorded_range():
    # NOTE: tiny seed 2 wedges in a mutual picker blockade — each picker
    # parks on the single highway cell giving access to the other's target
    # rack, so no detour exists. Tracing the reference's conflict/stuck
    # rules (warehouse.py:461-519) shows its semantics deadlock identically;
    # with only 2 pickers the tiny map makes this reachable. Golden seeds
    # below avoid it; the deadlock seed is asserted separately.
    stats = [run_episode_stats(s) for s in (0, 1, 3)]
    deliveries = [s["deliveries"] for s in stats]
    clashes = [s["clashes"] for s in stats]
    # Ranges recorded at commit time (tiny 3 AGVs + 2 Pickers, 500 steps).
    for d in deliveries:
        assert 8 <= d <= 45, deliveries
    for c in clashes:
        assert c <= 200, clashes
    assert np.mean(deliveries) >= 12
    # returns track deliveries (1 per delivery + 0.2 handoffs - time penalty)
    for s in stats:
        assert s["return"] == pytest.approx(
            s["deliveries"] * 1.0
            + 0.1 * 2 * s["deliveries"] * 2  # load+unload handoffs (approx)
            - 0.001 * 500 * 5,
            abs=s["deliveries"] * 0.6 + 3.0,
        )


def test_tiny_seed2_blockade_and_deadlock_break():
    """Tiny seed 2's mutual picker blockade: each picker parks on the single
    highway cell giving access to the other's target rack, so no detour
    exists. With reference semantics (deadlock_break=0) the episode wedges
    — 0 deliveries, clashes accumulating every step. The TPU-rebuild
    deadlock_break option (EnvConfig.deadlock_break=N escape steps after a
    no-detour replan / hard abandon) shakes the geometry loose while still
    routing escape moves through the Phase-2 conflict rules."""
    wedged = run_episode_stats(2)
    assert wedged["deliveries"] == 0
    assert wedged["clashes"] > 500  # the wedge clashes nearly every step

    broken = run_episode_stats(2, deadlock_break=8)
    assert broken["deliveries"] >= 8
    assert broken["clashes"] < wedged["clashes"] / 4
