"""Functional environment API: single-env and batched (vmapped) entry points.

This is the TPU-native replacement for the reference's `Warehouse(gym.Env)`
object (warehouse.py:91-766): `reset`/`step` are pure functions of
(params, state), jit-compiled once and vmappable over thousands of envs
(BASELINE.json north star: >=1e6 batched env steps/s).
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from swarm_ode_tpu.config import EnvConfig
from swarm_ode_tpu.env import observations, step as step_mod
from swarm_ode_tpu.env.state import EnvParams, EnvState, make_params


class WarehouseEnv:
    """Thin convenience wrapper binding an EnvConfig to the pure functions.

    All methods are jit-compiled and safe to vmap: `reset`/`step` take and
    return explicit state.
    """

    def __init__(self, config: EnvConfig):
        self.config = config
        self.params: EnvParams = make_params(config)

    # ---- single env ----
    @functools.partial(jax.jit, static_argnums=0)
    def reset(self, key: jnp.ndarray) -> Tuple[jnp.ndarray, EnvState]:
        state = step_mod.reset(self.params, key)
        return observations.observe(self.params, state), state

    @functools.partial(jax.jit, static_argnums=0)
    def step(
        self, state: EnvState, actions: jnp.ndarray
    ) -> Tuple[jnp.ndarray, EnvState, jnp.ndarray, jnp.ndarray, Dict]:
        new_state, rewards, done, info = step_mod.step(self.params, state, actions)
        obs = observations.observe(self.params, new_state)
        return obs, new_state, rewards, done, info

    @functools.partial(jax.jit, static_argnums=0)
    def action_masks(self, state: EnvState) -> jnp.ndarray:
        return observations.compute_valid_action_masks(self.params, state)

    # ---- batched ----
    @functools.partial(jax.jit, static_argnums=0)
    def reset_batch(self, keys: jnp.ndarray) -> Tuple[jnp.ndarray, EnvState]:
        state = jax.vmap(step_mod.reset, in_axes=(None, 0))(self.params, keys)
        obs = jax.vmap(observations.observe, in_axes=(None, 0))(self.params, state)
        return obs, state

    @functools.partial(jax.jit, static_argnums=0)
    def step_batch(self, state: EnvState, actions: jnp.ndarray):
        new_state, rewards, done, info = jax.vmap(
            step_mod.step, in_axes=(None, 0, 0)
        )(self.params, state, actions)
        obs = jax.vmap(observations.observe, in_axes=(None, 0))(self.params, new_state)
        return obs, new_state, rewards, done, info

    def __hash__(self):
        return hash(self.config)

    def __eq__(self, other):
        return isinstance(other, WarehouseEnv) and self.config == other.config


def rollout(
    params: EnvParams,
    policy_step,
    policy_state,
    env_state: EnvState,
    num_steps: int,
):
    """Scan a policy through the env for `num_steps`, collecting per-step info.

    `policy_step(params, env_state, policy_state) -> (actions, policy_state)`
    must be a pure function. Returns (env_state, policy_state, traj) where
    traj stacks (rewards, done, info) over time. Episodes do NOT auto-reset;
    pair with `auto_reset_rollout` for continuous batched collection.
    """

    def body(carry, _):
        env_state, policy_state = carry
        actions, policy_state = policy_step(params, env_state, policy_state)
        env_state, rewards, done, info = step_mod.step(params, env_state, actions)
        return (env_state, policy_state), (rewards, done, info)

    (env_state, policy_state), traj = jax.lax.scan(
        body, (env_state, policy_state), None, length=num_steps
    )
    return env_state, policy_state, traj


def auto_reset_rollout(
    params: EnvParams,
    policy_step,
    policy_init,
    env_state: EnvState,
    policy_state,
    num_steps: int,
    key: jnp.ndarray,
):
    """Like `rollout` but episodes restart in place when done — continuous
    batched collection (vmap over this for fleets of envs).

    `policy_init()` must return a fresh policy state (pytree matching
    `policy_state`). Returns (env_state, policy_state, key, traj) where traj
    additionally carries the per-step done flags marking episode boundaries.
    """

    def body(carry, _):
        env_state, policy_state, key = carry
        actions, policy_state = policy_step(params, env_state, policy_state)
        env_state, rewards, done, info = step_mod.step(params, env_state, actions)
        key, sub = jax.random.split(key)
        fresh_env = step_mod.reset(params, sub)
        fresh_pol = policy_init()
        env_state = jax.tree.map(
            lambda new, cur: jnp.where(done, new, cur), fresh_env, env_state
        )
        policy_state = jax.tree.map(
            lambda new, cur: jnp.where(done, new, cur), fresh_pol, policy_state
        )
        return (env_state, policy_state, key), (rewards, done, info)

    (env_state, policy_state, key), traj = jax.lax.scan(
        body, (env_state, policy_state, key), None, length=num_steps
    )
    return env_state, policy_state, key, traj
