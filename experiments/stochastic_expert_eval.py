"""Stochastic-expert ablation: does randomizing the FIFO dispatcher's
own choices recover the learned dispatcher's paired win?

The RESULTS.md learned-vs-expert tables left one fairness question open:
the sampled clone's margin might come partly from stochasticity per se
(breaking the deterministic expert's repeated tie-break congestion)
rather than from the clone's learned action distribution. This driver
answers it with the SAME paired protocol (same env seeds, E lockstep
envs x 500 steps per seed): deterministic dispatcher vs the dispatcher
with Gumbel-sampled choice sites (policies/heuristic._sampled_argmin,
P(i) ~ exp(-distance_i/T)).

T << 1 (e.g. 0.001) randomizes ONLY exact argmin ties (distances are
integer Manhattan cells); larger T admits farther candidates.
"""
import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

p = argparse.ArgumentParser()
p.add_argument("--env", default="tarware-medium-19agvs-9pickers-partialobs-v1")
p.add_argument("--temps", type=float, nargs="*",
               default=[0.001, 0.25, 0.5, 1.0, 2.0])
p.add_argument("--seeds", type=int, default=12)
p.add_argument("--seed_base", type=int, default=700,
               help="same base as paired_clone_eval.py so rows pair up")
p.add_argument("--episodes", type=int, default=8)
p.add_argument("--out", default=None)
p.add_argument("--cpu", action="store_true")
args = p.parse_args()

if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from swarm_ode_tpu.config import EnvConfig  # noqa: E402
from swarm_ode_tpu.env import step as step_mod  # noqa: E402
from swarm_ode_tpu.env.layout import build_layout  # noqa: E402
from swarm_ode_tpu.env.state import make_params  # noqa: E402
from swarm_ode_tpu.policies import heuristic as H  # noqa: E402
from swarm_ode_tpu.utils.metrics import pick_rate  # noqa: E402

cfg = EnvConfig.from_env_id(args.env)
lay = build_layout(cfg)
params = make_params(cfg, lay)
E = args.episodes
steps = cfg.max_steps or 500
SEEDS = tuple(range(args.seed_base, args.seed_base + args.seeds))


def expert_run(temperature):
    policy = H.make_policy(params, lay, temperature=temperature)

    @jax.jit
    def run(key):
        kr, key = jax.random.split(key)
        es = jax.vmap(step_mod.reset, in_axes=(None, 0))(
            params, jax.random.split(kr, E)
        )
        hs = jax.vmap(lambda _: H.init_state(params))(jnp.arange(E))

        def body(c, k):
            es, hs = c
            if temperature > 0:
                a, hs = jax.vmap(
                    lambda e, h, kk: policy(params, e, h, kk)
                )(es, hs, jax.random.split(k, E))
            else:
                a, hs = jax.vmap(lambda e, h: policy(params, e, h))(es, hs)
            es2, _, _, info = jax.vmap(
                lambda e, ai: step_mod.step(params, e, ai)
            )(es, a)
            return (es2, hs), (info["shelf_deliveries"].sum(),
                               info["clashes"].sum())

        _, (d, c) = jax.lax.scan(body, (es, hs), jax.random.split(key, steps))
        return d.sum() / E, c.sum() / E

    return run


out = {"env": args.env, "episodes_per_seed": E, "protocol":
       "paired, same seeds as paired_clone_eval.py (seed_base=%d)"
       % args.seed_base}

det = expert_run(0.0)
dr, dc = zip(*[jax.tree.map(float, det(jax.random.PRNGKey(s)))
               for s in SEEDS])
hr = [pick_rate(d, steps) for d in dr]
out["deterministic"] = {
    "rates": hr, "mean": float(np.mean(hr)),
    "sem": float(np.std(hr) / np.sqrt(len(hr))),
    "clashes": float(np.mean(dc)),
}
print("deterministic", round(np.mean(hr), 2), "+-",
      round(out["deterministic"]["sem"], 2),
      "clashes", round(np.mean(dc), 1), flush=True)

for T in args.temps:
    run = expert_run(T)
    sr, sc = zip(*[jax.tree.map(float, run(jax.random.PRNGKey(s)))
                   for s in SEEDS])
    cr = [pick_rate(d, steps) for d in sr]
    diff = np.array(cr) - np.array(hr)
    out[f"stochastic_T{T}"] = {
        "rates": cr, "mean": float(np.mean(cr)),
        "sem": float(np.std(cr) / np.sqrt(len(cr))),
        "clashes": float(np.mean(sc)),
        "paired_diff_mean": float(diff.mean()),
        "paired_diff_sem": float(diff.std() / np.sqrt(len(diff))),
    }
    print(f"T={T}", round(np.mean(cr), 2), "paired diff",
          round(diff.mean(), 2), "+-",
          round(diff.std() / np.sqrt(len(diff)), 2),
          "clashes", round(np.mean(sc), 1), flush=True)

if args.out:
    pathlib.Path(args.out).write_text(json.dumps(out, indent=2))
