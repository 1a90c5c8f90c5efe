"""Policy export for serving (beyond-reference).

A deployed dispatcher should not drag the training stack along: serving
needs one hermetic artifact that maps an observation to macro actions.
This module builds that artifact with `jax.export`: the trained network
(BC clone, QMIX/IQL Q-net — anything exposing agv/picker value heads),
its parameters, the mask reconstruction, and optionally the claim
auction (rl/coordination.py) are traced into a single StableHLO program
and serialized to bytes. The blob is independent of this package's
Python code — it replays on any runtime with a compatible jax, on CPU or
TPU, and is versioned by jax.export's calling-convention machinery.

Everything is a function of the OBSERVATION ALONE: valid-action masks
come from masks_from_feats (the replay-path reconstruction) and busy
flags from busy_from_feats, so a server needs no simulator state.

The reference has no serving story at all (its policies live inside
training scripts — SURVEY.md §2.4).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import export as jax_export

from swarm_ode_tpu.graphs.hetero import (
    hetero_graph_from_obs,
    masks_from_feats,
    split_observation,
)
from swarm_ode_tpu.rl import coordination


def make_policy_fn(env_params, net, net_params,
                   coordinated: bool = False) -> Callable:
    """obs (A, obs_len) -> greedy actions (A,) int32, as a pure function.

    `net` follows the composite protocol (apply(params, graph) ->
    {'agv_q_values', 'picker_q_values'}) shared by the RL networks and
    the BC clone (train/run_rl._make_network)."""

    def policy(obs: jnp.ndarray) -> jnp.ndarray:
        g = hetero_graph_from_obs(env_params, obs)
        out = net.apply(net_params, g)
        scores = jnp.concatenate(
            [out["agv_q_values"], out["picker_q_values"]], axis=0
        )
        a_f, p_f, l_f = split_observation(env_params, obs)
        masks = masks_from_feats(env_params, a_f, p_f, l_f)
        if coordinated:
            return coordination.coordinated_argmax(
                scores, masks, env_params.num_agvs,
                1 + env_params.num_goals,
                active=~coordination.busy_from_feats(a_f, p_f),
            )
        return jnp.argmax(
            jnp.where(masks > 0, scores, -jnp.inf), axis=-1
        ).astype(jnp.int32)

    return policy


def export_policy(policy_fn: Callable, example_obs) -> bytes:
    """Trace + serialize a policy to a hermetic StableHLO blob."""
    spec = jax.ShapeDtypeStruct(example_obs.shape, jnp.float32)
    exported = jax_export.export(jax.jit(policy_fn))(spec)
    return bytes(exported.serialize())


def load_policy(blob: bytes) -> Callable:
    """Deserialize an exported policy into a callable obs -> actions.

    The result runs under jit on the current backend; the original
    Python model code and parameters are NOT needed."""
    exported = jax_export.deserialize(blob)

    def policy(obs):
        return exported.call(jnp.asarray(obs, jnp.float32))

    return policy
