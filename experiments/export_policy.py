"""Export a trained checkpoint as a hermetic serving blob (serving.py).

Loads an RL (QMIX/IQL) or BC checkpoint, wraps the policy — network +
mask reconstruction + optional claim auction — and serializes it with
jax.export. Verifies the reloaded blob is action-identical to the live
policy over rolled env steps before writing.
"""
import argparse
import hashlib
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

p = argparse.ArgumentParser()
p.add_argument("--ckpt", required=True, help="checkpoint dir")
p.add_argument("--kind", default="qmix", choices=["qmix", "iql", "bc"],
               help="checkpoint layout: RL agent state or BC q_params")
p.add_argument("--env_id",
               default="tarware-medium-19agvs-9pickers-partialobs-v1")
p.add_argument("--net", default="gnode")
p.add_argument("--hidden_dim", type=int, default=64)
p.add_argument("--coordinated", action="store_true")
p.add_argument("--temperature", type=float, default=0.0,
               help="export a stochastic (obs, seed) policy sampling "
                    "at softmax(scores/T) through the claim auction")
p.add_argument("--out", default=None, help="output .stablehlo path")
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
from swarm_ode_tpu.graphs.hetero import hetero_graph_from_obs  # noqa: E402
from swarm_ode_tpu.serving import (  # noqa: E402
    export_policy,
    load_policy,
    make_policy_fn,
)
from swarm_ode_tpu.train.run_rl import RLRunConfig, _make_network  # noqa: E402
from swarm_ode_tpu.utils.checkpoint import CheckpointManager  # noqa: E402

env_cfg = EnvConfig.from_env_id(args.env_id)
lay = build_layout(env_cfg)
params = make_params(env_cfg, lay)
net = _make_network(
    RLRunConfig(net=args.net, hidden_dim=args.hidden_dim),
    params.num_actions, params.num_agvs, params.num_pickers,
    coord_scale=1.0 / float(max(params.grid_h, params.grid_w)),
)
key = jax.random.PRNGKey(0)
es = step_mod.reset(params, key)
obs = observations.observe(params, es)
fresh = net.init(key, hetero_graph_from_obs(params, obs))

mgr = CheckpointManager(args.ckpt)
if args.kind == "bc":
    restored = mgr.restore({"q_params": jax.tree.map(np.asarray, fresh)})
    if restored is None:
        sys.exit(f"no checkpoint in {args.ckpt}")
    q_params = jax.tree.map(jax.numpy.asarray, restored["q_params"])
else:
    # RL agent state: reconstruct the template exactly as run_marl resume
    # does, then take the Q-network subtree.
    from swarm_ode_tpu.train.run_rl import run_marl  # noqa: F401

    if args.kind == "qmix":
        from swarm_ode_tpu.env.observations import observe
        from swarm_ode_tpu.graphs.hetero import split_observation
        from swarm_ode_tpu.rl.qmix import QMIXAgent, QMIXConfig

        a_f, p_f, l_f = split_observation(params, obs)
        gs_dim = int(a_f.size + p_f.size + l_f.size)
        agent = QMIXAgent(net, params, gs_dim, QMIXConfig())
    else:
        from swarm_ode_tpu.rl.dqn import DQNConfig, IQLAgent

        agent = IQLAgent(net, params, DQNConfig())
    astate = agent.init(key, hetero_graph_from_obs(params, obs))
    restored = mgr.restore({"agent": jax.tree.map(np.asarray, astate)})
    if restored is None:
        sys.exit(f"no checkpoint in {args.ckpt}")
    ag = restored["agent"]
    prm = ag.params if hasattr(ag, "params") else ag["params"]
    q_params = jax.tree.map(
        jax.numpy.asarray,
        prm["q"] if isinstance(prm, dict) and "q" in prm else prm,
    )

policy = make_policy_fn(params, net, q_params,
                        coordinated=args.coordinated,
                        temperature=args.temperature)
stochastic = args.temperature > 0
blob = export_policy(policy, obs, stochastic=stochastic)

# Verification: reloaded blob == live policy over rolled steps.
served = load_policy(blob)
cur = es
o = obs
for t in range(5):
    if stochastic:
        want = np.asarray(policy(o, jax.numpy.uint32(t)))
        got = np.asarray(served(np.asarray(o, np.float32), t))
    else:
        want = np.asarray(policy(o))
        got = np.asarray(served(np.asarray(o, np.float32)))
    assert (want == got).all(), "served blob diverged from live policy"
    cur, _, _, _ = step_mod.step(params, cur, jax.numpy.asarray(want))
    o = observations.observe(params, cur)

out = pathlib.Path(
    args.out or f"/root/repo/runs/policy_{args.kind}"
    + ("_coord" if args.coordinated else "") + ".stablehlo"
)
out.write_bytes(blob)
meta = {
    "ckpt": args.ckpt, "kind": args.kind, "env_id": args.env_id,
    "net": args.net, "hidden_dim": args.hidden_dim,
    "coordinated": bool(args.coordinated),
    "temperature": args.temperature, "bytes": len(blob),
    "sha256": hashlib.sha256(blob).hexdigest(),
    "verified_steps": 5,
}
pathlib.Path(str(out) + ".json").write_text(json.dumps(meta, indent=2))
print(json.dumps(meta, indent=2))
