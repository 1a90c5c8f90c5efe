"""Run episodes with an exported serving blob (serving.py).

The deployment-side counterpart of experiments/export_policy.py: loads a
hermetic StableHLO policy (observation -> macro actions; no model code
or parameters needed) and drives the env with it, printing the
reference-style greedy stat line (run_heuristic.py:30-58 convention).

    python scripts/serve_policy.py --blob runs/policy_qmix30k_coord.stablehlo \
        --num_episodes 4
"""
import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

p = argparse.ArgumentParser()
p.add_argument("--blob", required=True, help=".stablehlo policy file")
p.add_argument("--env_id",
               default="tarware-medium-19agvs-9pickers-partialobs-v1")
p.add_argument("--num_episodes", type=int, default=4)
p.add_argument("--seed", type=int, default=0)
p.add_argument("--cpu", action="store_true")
args = p.parse_args()

if args.cpu:
    # Must run BEFORE importing swarm_ode_tpu: env/step.py creates jnp
    # constants at import, which initializes the default (axon) backend.
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import numpy as np  # noqa: E402

from swarm_ode_tpu.config import EnvConfig  # noqa: E402
from swarm_ode_tpu.env import observations, step as step_mod  # noqa: E402
from swarm_ode_tpu.env.layout import build_layout  # noqa: E402
from swarm_ode_tpu.env.state import make_params  # noqa: E402
from swarm_ode_tpu.serving import load_policy  # noqa: E402
from swarm_ode_tpu.utils.metrics import pick_rate  # noqa: E402

env_cfg = EnvConfig.from_env_id(args.env_id)
params = make_params(env_cfg, build_layout(env_cfg))
steps = env_cfg.max_steps or 500
policy = load_policy(pathlib.Path(args.blob).read_bytes())

for ep in range(args.num_episodes):
    es = step_mod.reset(params, jax.random.PRNGKey(args.seed + ep))
    obs = observations.observe(params, es)
    ret, deliv, clash = 0.0, 0, 0
    for _ in range(steps):
        a = policy(np.asarray(obs, np.float32))
        es, rew, done, info = step_mod.step(params, es,
                                            jax.numpy.asarray(a))
        obs = observations.observe(params, es)
        ret += float(np.asarray(rew).sum())
        deliv += int(info["shelf_deliveries"])
        clash += int(info["clashes"])
    print(
        f"Episode {ep}: | [Overall Pick Rate={pick_rate(deliv, steps):.2f}]"
        f"| [Global return={ret:.2f}]"
        f"| [Total shelf deliveries={deliv}]"
        f"| [Total clashes={clash}]",
        flush=True,
    )
