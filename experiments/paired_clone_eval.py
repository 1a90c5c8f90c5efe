"""Paired clone-vs-dispatcher evaluation on one env size.

Same env seeds for both policies (8 lockstep envs x 500 steps per
seed); reports per-T means, SEMs, and paired differences. The protocol
behind the RESULTS.md learned-dispatcher tables."""
import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

p = argparse.ArgumentParser()
p.add_argument("--env", required=True)
p.add_argument("--ckpt", required=True, help="q_params checkpoint dir")
p.add_argument("--net", default="gnn")
p.add_argument("--hidden_dim", type=int, default=64)
p.add_argument("--temps", type=float, nargs="*", default=[2.0, 3.0])
p.add_argument("--seeds", type=int, default=12)
p.add_argument("--seed_base", type=int, default=700)
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
from swarm_ode_tpu.env import observations, step as step_mod  # noqa: E402
from swarm_ode_tpu.env.layout import build_layout  # noqa: E402
from swarm_ode_tpu.env.state import make_params  # noqa: E402
from swarm_ode_tpu.graphs.hetero import hetero_graph_from_obs  # noqa: E402
from swarm_ode_tpu.policies import heuristic as H  # noqa: E402
from swarm_ode_tpu.rl import coordination  # noqa: E402
from swarm_ode_tpu.train.run_rl import RLRunConfig, _make_network  # noqa: E402
from swarm_ode_tpu.utils.checkpoint import CheckpointManager  # noqa: E402
from swarm_ode_tpu.utils.metrics import pick_rate  # noqa: E402

cfg = EnvConfig.from_env_id(args.env)
lay = build_layout(cfg)
params = make_params(cfg, lay)
net = _make_network(
    RLRunConfig(net=args.net, hidden_dim=args.hidden_dim),
    params.num_actions, params.num_agvs, params.num_pickers,
    coord_scale=1.0 / max(params.grid_h, params.grid_w),
)
key = jax.random.PRNGKey(0)
es0 = step_mod.reset(params, key)
tmpl = net.init(key, hetero_graph_from_obs(params,
                                           observations.observe(params, es0)))
rack_start = 1 + params.num_goals
E = args.episodes
steps = cfg.max_steps or 500
SEEDS = tuple(range(args.seed_base, args.seed_base + args.seeds))
qp = jax.tree.map(
    jnp.asarray,
    CheckpointManager(args.ckpt).restore(
        {"q_params": jax.tree.map(np.asarray, tmpl)}
    )["q_params"],
)


def clone_run(T):
    def act(o, e, k):
        out = net.apply(qp, hetero_graph_from_obs(params, o))
        logits = jnp.concatenate(
            [out["agv_q_values"], out["picker_q_values"]], 0
        )
        masks = observations.compute_valid_action_masks(params, e)
        return coordination.coordinated_sample(
            logits / T, masks, params.num_agvs, rack_start, k,
            active=~e.agent_busy,
        )

    @jax.jit
    def run(key):
        kr, key = jax.random.split(key)
        es = jax.vmap(step_mod.reset, in_axes=(None, 0))(
            params, jax.random.split(kr, E)
        )
        obs = jax.vmap(lambda e: observations.observe(params, e))(es)

        def body(c, k):
            es, obs = c
            a = jax.vmap(act)(obs, es, jax.random.split(k, E))
            es2, _, _, info = jax.vmap(
                lambda e, ai: step_mod.step(params, e, ai)
            )(es, a)
            obs2 = jax.vmap(lambda e: observations.observe(params, e))(es2)
            return (es2, obs2), info["shelf_deliveries"].sum()

        _, d = jax.lax.scan(body, (es, obs), jax.random.split(key, steps))
        return d.sum() / E

    return run


policy = H.make_policy(params, lay)


@jax.jit
def heur_run(key):
    kr, key = jax.random.split(key)
    es = jax.vmap(step_mod.reset, in_axes=(None, 0))(
        params, jax.random.split(kr, E)
    )
    hs = jax.vmap(lambda _: H.init_state(params))(jnp.arange(E))

    def body(c, _):
        es, hs = c
        a, hs = jax.vmap(lambda e, h: policy(params, e, h))(es, hs)
        es2, _, _, info = jax.vmap(
            lambda e, ai: step_mod.step(params, e, ai)
        )(es, a)
        return (es2, hs), info["shelf_deliveries"].sum()

    _, d = jax.lax.scan(body, (es, hs), None, length=steps)
    return d.sum() / E


out = {"env": args.env, "ckpt": args.ckpt, "episodes_per_seed": E}
hr = [pick_rate(float(heur_run(jax.random.PRNGKey(s))), steps)
      for s in SEEDS]
out["heuristic"] = {"rates": hr, "mean": float(np.mean(hr)),
                    "sem": float(np.std(hr) / np.sqrt(len(hr)))}
print("heuristic", round(np.mean(hr), 2), "+-",
      round(out["heuristic"]["sem"], 2), flush=True)
for T in args.temps:
    run = clone_run(T)
    cr = [pick_rate(float(run(jax.random.PRNGKey(s))), steps)
          for s in SEEDS]
    d = np.array(cr) - np.array(hr)
    out[f"clone_T{T}"] = {
        "rates": cr, "mean": float(np.mean(cr)),
        "sem": float(np.std(cr) / np.sqrt(len(cr))),
        "paired_diff_mean": float(d.mean()),
        "paired_diff_sem": float(d.std() / np.sqrt(len(d))),
    }
    print(f"T={T}", round(np.mean(cr), 2), "paired diff",
          round(d.mean(), 2), "+-", round(d.std() / np.sqrt(len(d)), 2),
          flush=True)
if args.out:
    pathlib.Path(args.out).write_text(json.dumps(out, indent=2))
