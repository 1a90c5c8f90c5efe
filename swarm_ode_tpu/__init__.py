"""swarm_ode_tpu — TPU-native rebuild of dkssud715/swarm-ode.

A graph-neural-ODE + multi-agent-RL research stack over the TA-RWARE
warehouse simulator, redesigned for TPU: pure-functional vmappable env,
Pallas kernels for the hot paths, shard_map data parallelism, on-device
odeint. See SURVEY.md for the reference layer map this mirrors.
"""
from __future__ import annotations

import itertools
import os

# Persistent XLA compilation cache: this host has a single vCPU, so
# recompiling the (large) env/training programs dominates wall-clock.
# Cached executables are reused across processes and pytest runs.
if not os.environ.get("SWARM_ODE_TPU_NO_CACHE"):
    import jax

    _cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/swarm_ode_tpu_jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover — older jax without the flag
        pass

from swarm_ode_tpu.config import SIZES, REQUEST_QUEUES, EnvConfig, env_id
from swarm_ode_tpu.definitions import (
    Action,
    AgentType,
    CollisionLayers,
    Direction,
    RewardType,
)

__version__ = "0.1.0"

__all__ = [
    "Action",
    "AgentType",
    "CollisionLayers",
    "Direction",
    "EnvConfig",
    "RewardType",
    "env_id",
    "make",
    "register_gym_envs",
]

_REGISTERED = False


def register_gym_envs():
    """Register every `tarware-{size}-{N}agvs-{M}pickers-{obs}obs-v1` id
    with gymnasium (reference tarware/__init__.py:26-45)."""
    global _REGISTERED
    if _REGISTERED:
        return
    import gymnasium as gym

    for size, obs_type, num_agvs, num_pickers in itertools.product(
        SIZES, ("partial", "global"), range(1, 20), range(1, 10)
    ):
        gym.register(
            id=env_id(size, num_agvs, num_pickers, obs_type),
            entry_point="swarm_ode_tpu.env.gym_adapter:Warehouse",
            kwargs={
                "column_height": 8,
                "shelf_rows": SIZES[size][0],
                "shelf_columns": SIZES[size][1],
                "num_agvs": num_agvs,
                "num_pickers": num_pickers,
                "request_queue_size": REQUEST_QUEUES[size],
                "max_inactivity_steps": None,
                "max_steps": 500,
                "reward_type": RewardType.INDIVIDUAL,
                "observation_type": obs_type,
            },
        )
    _REGISTERED = True


def full_registration():
    """Alias of register_gym_envs (reference tarware/__init__.py:47-67 —
    its version passes a `sensor_range` kwarg Warehouse never accepted, so
    the working equivalent is the standard registration)."""
    register_gym_envs()


def make(env_id_str: str, **overrides):
    """Create a gym-adapter Warehouse directly from a reference-style env id
    (no gymnasium registry required)."""
    from swarm_ode_tpu.env.gym_adapter import Warehouse

    cfg = EnvConfig.from_env_id(env_id_str, **overrides)
    return Warehouse(
        shelf_columns=cfg.shelf_columns,
        column_height=cfg.column_height,
        shelf_rows=cfg.shelf_rows,
        num_agvs=cfg.num_agvs,
        num_pickers=cfg.num_pickers,
        request_queue_size=cfg.request_queue_size,
        max_inactivity_steps=cfg.max_inactivity_steps,
        max_steps=cfg.max_steps,
        reward_type=cfg.reward_type,
        normalised_coordinates=cfg.normalised_coordinates,
        observation_type=cfg.observation_type,
        replan_mode=cfg.replan_mode,
    )
