"""Render a heuristic episode to an animated GIF (replaces the reference's
interactive pyglet viewer for headless use; reference rendering.py R1)."""
import sys
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from swarm_ode_tpu.config import EnvConfig
from swarm_ode_tpu.env import step as step_mod
from swarm_ode_tpu.env.layout import build_layout
from swarm_ode_tpu.env.rendering import render_state
from swarm_ode_tpu.env.state import make_params
from swarm_ode_tpu.policies import heuristic as H

p = ArgumentParser(formatter_class=ArgumentDefaultsHelpFormatter)
p.add_argument("--env_id", default="tarware-tiny-3agvs-2pickers-partialobs-v1")
p.add_argument("--steps", type=int, default=120)
p.add_argument("--every", type=int, default=2, help="render every Nth step")
p.add_argument("--seed", type=int, default=0)
p.add_argument("--out", default="episode.gif")

if __name__ == "__main__":
    args = p.parse_args()
    cfg = EnvConfig.from_env_id(args.env_id)
    lay = build_layout(cfg)
    params = make_params(cfg, lay)
    policy = H.make_policy(params, lay)
    es = step_mod.reset(params, jax.random.PRNGKey(args.seed))
    h = H.init_state(params)
    pol = jax.jit(lambda es, h: policy(params, es, h))
    stp = jax.jit(lambda es, a: step_mod.step(params, es, a))

    from PIL import Image

    frames = []
    for t in range(args.steps):
        if t % args.every == 0:
            frames.append(Image.fromarray(render_state(params, lay, es)))
        a, h = pol(es, h)
        es, rew, done, info = stp(es, a)
        if bool(done):
            break
    frames[0].save(
        args.out,
        save_all=True,
        append_images=frames[1:],
        duration=120,
        loop=0,
    )
    print(f"wrote {args.out} ({len(frames)} frames)")
