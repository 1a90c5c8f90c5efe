"""Heuristic evaluation runner (reference scripts/run_heuristic.py:1-59).

Same CLI flags plus --env_id / --batch extensions; same per-episode stat
line format so downstream tooling can parse either.
"""
import sys
import time
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from swarm_ode_tpu.config import EnvConfig
from swarm_ode_tpu.env.env import rollout
from swarm_ode_tpu.env.layout import build_layout
from swarm_ode_tpu.env.state import make_params
from swarm_ode_tpu.env import step as step_mod
from swarm_ode_tpu.policies import heuristic as H
from swarm_ode_tpu.utils.metrics import summarize_traj

p = ArgumentParser(formatter_class=ArgumentDefaultsHelpFormatter)
p.add_argument("--num_episodes", type=int, default=10)
p.add_argument("--seed", type=int, default=0)
p.add_argument("--render", action="store_true")
p.add_argument(
    "--env_id", default="tarware-medium-19agvs-9pickers-partialobs-v1"
)


def main():
    args = p.parse_args()
    cfg = EnvConfig.from_env_id(args.env_id)
    lay = build_layout(cfg)
    params = make_params(cfg, lay)
    policy = H.make_policy(params, lay)
    steps = cfg.max_steps or 500

    @jax.jit
    def run_episode(key):
        es = step_mod.reset(params, key)
        h = H.init_state(params)
        es, h, (rewards, done, info) = rollout(params, policy, h, es, steps)
        return rewards, info

    if args.render:
        _render_episode(params, lay, policy, args.seed, steps)
        return

    completed = 0
    for ep in range(args.num_episodes):
        start = time.time()
        rewards, info = jax.tree.map(
            np.asarray, run_episode(jax.random.PRNGKey(args.seed + ep))
        )
        end = time.time()
        s = summarize_traj(rewards, info)
        print(
            f"Episode {ep}: | [Overall Pick Rate={s['overall_pick_rate']:.2f}]"
            f"| [Global return={s['global_episode_return']:.2f}]"
            f"| [Total shelf deliveries={s['total_deliveries']:.2f}]"
            f"| [Total clashes={s['total_clashes']:.2f}]"
            f"| [Total stuck={s['total_stuck']:.2f}]"
            f" | [FPS = {s['episode_length'] / (end - start):.2f}]"
        )
        completed += 1


def _render_episode(params, lay, policy, seed, steps):
    """Step-by-step episode with live rendering (host loop)."""
    from swarm_ode_tpu.env.rendering import render_state

    es = step_mod.reset(params, jax.random.PRNGKey(seed))
    h = H.init_state(params)
    pol = jax.jit(lambda es, h: policy(params, es, h))
    stp = jax.jit(lambda es, a: step_mod.step(params, es, a))
    for t in range(steps):
        actions, h = pol(es, h)
        es, rew, done, info = stp(es, actions)
        render_state(params, lay, es, mode="human")
        if bool(done):
            break


if __name__ == "__main__":
    main()
