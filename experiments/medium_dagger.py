"""DAgger: iterative dispatcher cloning with on-policy expert relabeling.

Plain BC compounds errors (runs/bc_medium_cpu_probe*: decision accuracy
does not predict rollout quality). Each DAgger round rolls the current
clone, labels every visited state with the stateless expert oracle
(policies/heuristic.reconstruct_state), aggregates, and retrains —
training exactly the recoveries the clone needs. All collection runs as
jitted lockstep-env scans on device.
"""
import argparse
import glob
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

p = argparse.ArgumentParser()
p.add_argument("--env", default="tarware-medium-19agvs-9pickers-partialobs-v1")
p.add_argument("--files", nargs="*", default=None)
p.add_argument("--net", default="gnn")
p.add_argument("--hidden_dim", type=int, default=64)
p.add_argument("--rounds", type=int, default=3)
p.add_argument("--episodes_per_round", type=int, default=32)
p.add_argument("--epochs0", type=int, default=20,
               help="initial BC epochs on the base dataset")
p.add_argument("--epochs_per_round", type=int, default=6)
p.add_argument("--beta0", type=float, default=0.25,
               help="round-0 expert-mixture rate, halved each round")
p.add_argument("--collect_temperature", type=float, default=0.0,
               help="collect rollouts with the sampled serving operator "
                    "at this temperature (0 = coordinated argmax)")
p.add_argument("--batch_size", type=int, default=64)
p.add_argument("--lr", type=float, default=1e-3)
p.add_argument("--stride", type=int, default=2)
p.add_argument("--max_episodes", type=int, default=0)
p.add_argument("--eval_episodes", type=int, default=8)
p.add_argument("--seed", type=int, default=0)
p.add_argument("--tag", default="")
p.add_argument("--out_dir", default=None)
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
from swarm_ode_tpu.env.layout import build_layout  # noqa: E402
from swarm_ode_tpu.env.state import make_params  # noqa: E402
from swarm_ode_tpu.train import train_bc as bc  # noqa: E402
from swarm_ode_tpu.train.run_rl import RLRunConfig, _make_network  # noqa: E402

files = args.files or sorted(
    glob.glob(f"/root/repo/datasets/warehouse_data_{args.env}_seed*.h5")
)
if not files:
    sys.exit(f"no dataset files for {args.env}")

size = args.env.split("-")[1]
OUT = pathlib.Path(args.out_dir or f"/root/repo/runs/dagger_{size}"
                   + (f"_{args.tag}" if args.tag else ""))
OUT.mkdir(parents=True, exist_ok=True)

env_cfg = EnvConfig.from_env_id(args.env)
lay = build_layout(env_cfg)
params = make_params(env_cfg, lay)
net = _make_network(
    RLRunConfig(net=args.net, hidden_dim=args.hidden_dim),
    params.num_actions, params.num_agvs, params.num_pickers,
    coord_scale=1.0 / float(max(params.grid_h, params.grid_w)),
)

def bc_cfg(epochs):
    return bc.BCConfig(
        env_id=args.env, net=args.net, hidden_dim=args.hidden_dim,
        lr=args.lr, epochs=epochs, batch_size=args.batch_size,
        seed=args.seed, checkpoint_dir=str(OUT / "ckpt"),
    )

t0 = time.time()
obs_np, act_np, busy_np, ep_np = bc.load_decision_arrays(
    files, args.stride, args.max_episodes
)
print(f"[dagger] base dataset {obs_np.shape[0]} rows "
      f"({int(ep_np.max()) + 1} episodes)", flush=True)

out = bc.train_bc(bc_cfg(args.epochs0),
                  arrays=(obs_np, act_np, busy_np, ep_np))
net_params = out["params"]
rounds_log = [{"round": -1, "history": out["history"]}]

key = jax.random.PRNGKey(args.seed + 99)
steps = env_cfg.max_steps or 500
best_eval = {"round": -1, "pick_rate": -1.0}
for r in range(args.rounds):
    beta = args.beta0 * (0.5 ** r)
    key, kc, ke = jax.random.split(key, 3)
    o, a, b = bc.collect_dagger(
        params, lay, net, net_params, args.episodes_per_round, kc,
        beta=beta, coordinated=True,
        temperature=args.collect_temperature,
    )
    # Flattened step-major: row t*E + e belongs to rollout episode e.
    base_ep = int(ep_np.max()) + 1
    e_ids = base_ep + np.tile(
        np.arange(args.episodes_per_round, dtype=np.int32),
        o.shape[0] // args.episodes_per_round,
    )
    obs_np = np.concatenate([obs_np, o])
    act_np = np.concatenate([act_np, a])
    busy_np = np.concatenate([busy_np, b])
    ep_np = np.concatenate([ep_np, e_ids])
    print(f"[dagger] round {r}: beta={beta:.3f}, +{o.shape[0]} rows "
          f"(total {obs_np.shape[0]})", flush=True)

    out = bc.train_bc(
        bc_cfg(args.epochs_per_round),
        arrays=(obs_np, act_np, busy_np, ep_np),
        init_params=net_params,
    )
    net_params = out["params"]
    evals = {}
    for coord in (False, True):
        evals["coordinated" if coord else "independent"] = (
            bc.evaluate_policy(params, net, net_params,
                               args.eval_episodes, ke, coordinated=coord)
        )
    for T in (1.5, 3.0):
        evals[f"sampled_T{T}"] = bc.evaluate_policy(
            params, net, net_params, args.eval_episodes, ke, temperature=T
        )
    rounds_log.append(
        {"round": r, "beta": beta, "rows": int(obs_np.shape[0]),
         "history": out["history"], "eval": evals}
    )
    # Keep the best policy by rollout quality (best of the serving-time
    # operators), not the last round's: per-round evals are noisy and a
    # retrain can regress (the CPU probe saw 100.4 -> 85.3 between
    # rounds at 4 eval episodes).
    coord_rate = max(evals["coordinated"]["pick_rate"],
                     evals["sampled_T1.5"]["pick_rate"],
                     evals["sampled_T3.0"]["pick_rate"])
    if coord_rate > best_eval["pick_rate"]:
        best_eval = {"round": r, "pick_rate": coord_rate}
        from swarm_ode_tpu.utils.checkpoint import CheckpointManager

        CheckpointManager(str(OUT / "ckpt_best")).save(
            r, {"q_params": jax.tree.map(np.asarray, net_params)},
            force=True,
        )

result = {
    "best_eval": best_eval,
    "env": args.env, "net": args.net, "rounds": args.rounds,
    "episodes_per_round": args.episodes_per_round,
    "epochs0": args.epochs0, "epochs_per_round": args.epochs_per_round,
    "rounds_log": rounds_log, "minutes": (time.time() - t0) / 60,
}
(OUT / "result.json").write_text(json.dumps(result, indent=2))
final = rounds_log[-1].get("eval", {})
print(json.dumps({"final_eval": final,
                  "minutes": result["minutes"]}, indent=2))
