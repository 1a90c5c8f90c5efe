"""Debug-mode simulation invariant checks.

The reference's closest analogue to a race detector is its built-in
collision machinery plus the clash/stuck counters in `info`
(SURVEY.md §5). This module adds the explicit invariant checker the
TPU rebuild owes: structural consistency assertions over EnvState,
runnable inside jit via `jax.experimental.checkify` or on host arrays.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from swarm_ode_tpu.definitions import AgentType
from swarm_ode_tpu.env.state import EnvParams, EnvState


def check_state(params: EnvParams, state: EnvState) -> None:
    """Checkify-able invariant assertions. Wrap with
    `checkify.checkify(lambda s: check_state(params, s))` to get errors out
    of jitted code, or call on host-side states in tests."""
    A, S = params.num_agents, params.num_shelves
    x, y = state.agent_xy[:, 0], state.agent_xy[:, 1]

    checkify.check(jnp.all((x >= 0) & (x < params.grid_w)), "agent x oob")
    checkify.check(jnp.all((y >= 0) & (y < params.grid_h)), "agent y oob")

    # No two same-layer agents on one cell — the simulation tolerates
    # transient overlap only while one is in fixing-clash mode
    # (warehouse.py:474-478), so assert: overlap implies someone fixing.
    is_picker = params.agent_type == AgentType.PICKER
    same_cell = (x[:, None] == x[None, :]) & (y[:, None] == y[None, :])
    same_layer = is_picker[:, None] == is_picker[None, :]
    off_diag = ~jnp.eye(A, dtype=bool)
    overlap = same_cell & same_layer & off_diag
    fixing_pair = (state.agent_fixing_clash[:, None] > 0) | (
        state.agent_fixing_clash[None, :] > 0
    )
    checkify.check(
        jnp.all(~overlap | fixing_pair),
        "same-layer agents overlap without fixing-clash",
    )

    # Every shelf is either on the grid or carried by exactly one agent.
    carry_counts = jnp.zeros(S + 1, jnp.int32).at[state.agent_carrying].add(1)
    checkify.check(
        jnp.all(carry_counts[1:] <= 1), "shelf carried by multiple agents"
    )

    # Carried ids and queue entries are valid shelf ids.
    checkify.check(
        jnp.all((state.agent_carrying >= 0) & (state.agent_carrying <= S)),
        "invalid carried shelf id",
    )
    checkify.check(
        jnp.all((state.request_queue >= 1) & (state.request_queue <= S)),
        "invalid request queue entry",
    )
    # Queue entries unique.
    rq = state.request_queue
    dup = (rq[:, None] == rq[None, :]) & ~jnp.eye(rq.shape[0], dtype=bool)
    checkify.check(jnp.all(~dup), "duplicate request queue entries")

    # Non-carried shelves occupy distinct cells.
    carried = (
        jnp.zeros(S + 1, jnp.bool_).at[state.agent_carrying].set(True)[1:]
    )
    sx, sy = state.shelf_xy[:, 0], state.shelf_xy[:, 1]
    s_same = (sx[:, None] == sx[None, :]) & (sy[:, None] == sy[None, :])
    s_both = (~carried)[:, None] & (~carried)[None, :]
    s_off = ~jnp.eye(S, dtype=bool)
    checkify.check(
        jnp.all(~(s_same & s_both & s_off)), "two shelves on one cell"
    )


def checked_step(params: EnvParams):
    """Returns a step function that raises on invariant violations
    (debug-mode env, analogous to a sanitizer build)."""
    from swarm_ode_tpu.env import step as step_mod

    def _step(state, actions):
        new_state, rewards, done, info = step_mod.step(params, state, actions)
        err, _ = checkify.checkify(lambda s: check_state(params, s))(new_state)
        return err, (new_state, rewards, done, info)

    def wrapped(state, actions):
        err, out = jax.jit(_step)(state, actions)
        err.throw()
        return out

    return wrapped
