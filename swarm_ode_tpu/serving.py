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
from swarm_ode_tpu.graphs.temporal import TemporalWindow, build_temporal_graph
from swarm_ode_tpu.rl import coordination


def make_policy_fn(env_params, net, net_params,
                   coordinated: bool = False,
                   temperature: float = 0.0) -> Callable:
    """obs (A, obs_len) -> actions (A,) int32, as a pure function.

    temperature=0: greedy (argmax, optionally through the claim
    auction); the policy is a function of the observation alone.
    temperature>0: claim-masked sequential sampling from
    softmax(scores/T) — the signature becomes (obs, seed: uint32) so the
    server controls the randomness. Sampling is the measured fix for
    argmax brittleness of cloned dispatchers (RESULTS.md: 72 -> ~125
    pick rate on the same checkpoint).

    `net` follows the composite protocol (apply(params, graph) ->
    {'agv_q_values', 'picker_q_values'}) shared by the RL networks and
    the BC clone (train/run_rl._make_network)."""

    def scores_and_masks(obs):
        g = hetero_graph_from_obs(env_params, obs)
        out = net.apply(net_params, g)
        scores = jnp.concatenate(
            [out["agv_q_values"], out["picker_q_values"]], axis=0
        )
        a_f, p_f, l_f = split_observation(env_params, obs)
        masks = masks_from_feats(env_params, a_f, p_f, l_f)
        active = ~coordination.busy_from_feats(a_f, p_f)
        return scores, masks, active

    rack_start = 1 + env_params.num_goals

    if temperature > 0:

        def policy(obs: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
            scores, masks, active = scores_and_masks(obs)
            return coordination.coordinated_sample(
                scores / temperature, masks, env_params.num_agvs,
                rack_start, jax.random.PRNGKey(seed), active=active,
            )

        return policy

    def policy(obs: jnp.ndarray) -> jnp.ndarray:
        scores, masks, active = scores_and_masks(obs)
        if coordinated:
            return coordination.coordinated_argmax(
                scores, masks, env_params.num_agvs, rack_start,
                active=active,
            )
        return jnp.argmax(
            jnp.where(masks > 0, scores, -jnp.inf), axis=-1
        ).astype(jnp.int32)

    return policy


def make_gde_fn(model, params, distance_threshold: float = 5.0,
                horizon: int = 4) -> Callable:
    """Flagship trajectory model as a pure serving function.

    (window_obs (W, N, D) float32, count () int32) ->
    predicted positions (horizon+1, N, 2) float32 for the newest valid
    frame's agents at t = 0..horizon — the trajectory surface of the
    reference's train_gde.py:47-106, deployable without Python model
    code (same jax.export story as the dispatchers above)."""
    t_span = jnp.arange(horizon + 1, dtype=jnp.float32)

    def predict(obs: jnp.ndarray, count: jnp.ndarray) -> jnp.ndarray:
        W, N = obs.shape[0], obs.shape[1]
        g = build_temporal_graph(
            TemporalWindow(obs=obs, count=count),
            model.num_agvs, distance_threshold,
        )
        traj = model.apply(params, g, t_span)["trajectories"]
        traj = traj.reshape(t_span.shape[0], W, N, 2)
        # Newest valid frame's agent nodes carry the prediction.
        return traj[:, jnp.maximum(count - 1, 0)]

    return predict


# Lower every blob for both backends so an artifact exported from a TPU
# session replays on a CPU box (and vice versa) — jax.export records the
# lowering platforms and refuses mismatched ones at call time. Some TPU
# plugin backends register under a non-standard platform name that
# multi-platform lowering rejects; fall back to the single current
# platform there rather than failing the export.
_PLATFORMS = ("cpu", "tpu")


def export_fn(fn: Callable, *arg_specs) -> bytes:
    """Trace + serialize any jittable fn to a hermetic StableHLO blob."""
    try:
        exported = jax_export.export(
            jax.jit(fn), platforms=_PLATFORMS
        )(*arg_specs)
    except Exception:
        exported = jax_export.export(jax.jit(fn))(*arg_specs)
    return bytes(exported.serialize())


def export_policy(policy_fn: Callable, example_obs,
                  stochastic: bool = False) -> bytes:
    """Trace + serialize a policy to a hermetic StableHLO blob.

    stochastic=True exports the (obs, seed) calling convention of a
    temperature policy."""
    obs_spec = jax.ShapeDtypeStruct(example_obs.shape, jnp.float32)
    if stochastic:
        seed_spec = jax.ShapeDtypeStruct((), jnp.uint32)
        return export_fn(policy_fn, obs_spec, seed_spec)
    return export_fn(policy_fn, obs_spec)


def export_gde(gde_fn: Callable, window: int, num_agents: int,
               obs_dim: int) -> bytes:
    """Serialize a make_gde_fn predictor for (W, N, D) windows."""
    return export_fn(
        gde_fn,
        jax.ShapeDtypeStruct((window, num_agents, obs_dim), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.int32),
    )


def load_gde(blob: bytes) -> Callable:
    """Deserialize an exported trajectory model into
    (window_obs, count) -> (horizon+1, N, 2)."""
    exported = jax_export.deserialize(blob)

    def predict(obs, count):
        return exported.call(
            jnp.asarray(obs, jnp.float32), jnp.asarray(count, jnp.int32)
        )

    return predict


def load_policy(blob: bytes) -> Callable:
    """Deserialize an exported policy into a callable obs[, seed] ->
    actions (seed required iff the blob was exported stochastic).

    The result runs under jit on the current backend; the original
    Python model code and parameters are NOT needed."""
    exported = jax_export.deserialize(blob)
    n_args = len(exported.in_avals)

    def policy(obs, seed=None):
        if n_args == 2:
            if seed is None:
                raise ValueError(
                    "stochastic policy blob: pass seed=<uint32>"
                )
            return exported.call(
                jnp.asarray(obs, jnp.float32),
                jnp.asarray(seed, jnp.uint32),
            )
        return exported.call(jnp.asarray(obs, jnp.float32))

    return policy
