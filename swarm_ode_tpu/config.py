"""Environment configuration and the `tarware-...` naming-scheme registry.

The reference encodes env variants in gym id strings
(`tarware-{size}-{n}agvs-{m}pickers-{obs}obs-v1`, reference
tarware/__init__.py:26-45). Here the same scheme parses into an explicit
dataclass; the gym registry in `swarm_ode_tpu/__init__.py` is built on top.
"""
from __future__ import annotations

import dataclasses
import re
from typing import Optional

from swarm_ode_tpu.definitions import RewardType

# (shelf_rows, shelf_columns) per size name (reference tarware/__init__.py:10-16)
SIZES = {
    "tiny": (1, 3),
    "small": (2, 3),
    "medium": (2, 5),
    "large": (3, 5),
    "extralarge": (4, 7),
}

# Request-queue size per size name (reference tarware/__init__.py:18-24)
REQUEST_QUEUES = {
    "tiny": 20,
    "small": 20,
    "medium": 20,
    "large": 40,
    "extralarge": 60,
}

OBS_TYPES = ("partial", "global")

_ENV_ID_RE = re.compile(
    r"^tarware-(?P<size>tiny|small|medium|large|extralarge)"
    r"-(?P<agvs>\d+)agvs-(?P<pickers>\d+)pickers-(?P<obs>partial|global)obs-v1$"
)


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """Static environment configuration (hashable; jit-specialization key).

    Mirrors `Warehouse.__init__` kwargs (reference warehouse.py:95-108 and
    the registry defaults at tarware/__init__.py:33-44).
    """

    shelf_rows: int
    shelf_columns: int
    column_height: int = 8
    num_agvs: int = 1
    num_pickers: int = 0
    request_queue_size: int = 20
    max_inactivity_steps: Optional[int] = None
    max_steps: Optional[int] = 500
    reward_type: int = int(RewardType.INDIVIDUAL)
    normalised_coordinates: bool = False
    observation_type: str = "global"
    # --- TPU-rebuild extensions (no reference counterpart) ---
    # How agents flagged for replanning route around other agents:
    #   "bfs"    - on-device BFS with agents as obstacles (closest to the
    #              reference's find_path(care_for_agents=True)).
    #   "greedy" - one-step lookahead penalizing occupied cells (cheap).
    #   "off"    - keep following the static shortest-path field.
    replan_mode: str = "bfs"
    # BFS implementation: 'auto' picks the Pallas VMEM-resident kernel on
    # TPU and the XLA stencil scan on CPU; force with 'pallas' / 'xla'.
    bfs_backend: str = "auto"
    # Replan-BFS relaxation sweeps; 0 = auto (max(32, (H+W)//2)).
    dynamic_bfs_iters: int = 0
    # Pallas replan-kernel variant: 'int32' (min-plus distance field) or
    # 'bitpack32' (1-bit wavefront, 32 cells/lane + per-row probe masks —
    # ops/bfs_bitpack.py; bit-identical results on chip: 0/1120 mismatches,
    # 4.2x faster at the bench operating point — experiments/
    # bitpack_onchip.py). 'auto' picks bitpack32 when the walled width
    # fits a lane word (W+1 < 32, true for every predefined size) and
    # falls back to int32 for wider custom layouts.
    bfs_kernel: str = "auto"
    # Batched-replan compaction budget: in a vmapped batch, the BFS kernel
    # runs only the rows the step consumes (replanning agents, potential
    # clash triggers, stuck candidates), compacted across envs into a dense
    # block of row_frac * batch * agents rows. Exact for every consumed row;
    # overflow beyond the budget is counted in info['replan_overflow'].
    # 1.0 disables compaction.
    # The 0.22 default is the sweep-selected operating point WITH rejoin
    # (needed rows ~2.0/step/env on medium, zero overflow at B=2048 —
    # results_data/rejoin_sweep_r4.log). If you set replan_rejoin=False,
    # raise this to 0.43: always-replan needs ~7.5 rows/step/env.
    replan_row_frac: float = 0.22
    # Rejoin: drop an agent out of replan mode once its dynamic field
    # agrees with the static field at its own cell (same next-hop, same
    # distance) — from there the static follower takes the identical
    # move, and any later blockage re-arms replanning through the normal
    # Phase-2 trigger. The reference computes ONE frozen path per clash
    # (warehouse.py:469) and follows it without recomputation; without
    # rejoin our recompute-every-step design keeps querying BFS for the
    # whole rest of the mission. Throughput lever; default flipped after
    # the pre-registered gate was met (medium 243,359 steps/s >= 230k with
    # zero overflow at row_frac 0.22; parity pick rate 122.6 vs reference
    # 116.0 — results_data/parity_rejoin_r4.json, RESULTS.md rounds 4-5).
    replan_rejoin: bool = True
    # Deadlock-break (no reference counterpart; the reference's stuck rules
    # deadlock on no-detour geometry, e.g. the tiny-map mutual picker
    # blockade — tests/test_golden_behavior.py). 0 = reference semantics.
    # N > 0: after a hard stuck abandon the agent spends N steps taking
    # random highway-legal micro moves (flowing through the normal
    # conflict-resolution rules), shaking blocking geometry loose.
    deadlock_break: int = 0

    @property
    def num_agents(self) -> int:
        return self.num_agvs + self.num_pickers

    @staticmethod
    def from_env_id(env_id: str, **overrides) -> "EnvConfig":
        """Parse a reference-style env id into a config.

        Reference naming: tarware/__init__.py:31.
        """
        m = _ENV_ID_RE.match(env_id)
        if m is None:
            raise ValueError(f"Unrecognized env id: {env_id!r}")
        size = m.group("size")
        rows, cols = SIZES[size]
        kwargs = dict(
            shelf_rows=rows,
            shelf_columns=cols,
            column_height=8,
            num_agvs=int(m.group("agvs")),
            num_pickers=int(m.group("pickers")),
            request_queue_size=REQUEST_QUEUES[size],
            max_inactivity_steps=None,
            max_steps=500,
            reward_type=int(RewardType.INDIVIDUAL),
            observation_type=m.group("obs"),
        )
        kwargs.update(overrides)
        return EnvConfig(**kwargs)


def env_id(size: str, num_agvs: int, num_pickers: int, obs_type: str) -> str:
    return f"tarware-{size}-{num_agvs}agvs-{num_pickers}pickers-{obs_type}obs-v1"
