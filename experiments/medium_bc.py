"""Behavior cloning from the logged FIFO dispatcher (train/train_bc.py).

Trains the RL Q-network class on the heuristic's decision record in the
on-disk datasets, then greedy-rolls the cloned policy with BOTH action
operators (independent argmax and the claim auction). The checkpoint's
q_params drop into QMIX/IQL via --init_q_from (RL from demonstrations).
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
p.add_argument("--files", nargs="*", default=None,
               help="HDF5 dataset paths (default: datasets/ for --env)")
p.add_argument("--net", default="gnode")
p.add_argument("--hidden_dim", type=int, default=64)
p.add_argument("--epochs", type=int, default=20)
p.add_argument("--batch_size", type=int, default=64)
p.add_argument("--lr", type=float, default=1e-3)
p.add_argument("--stride", type=int, default=2,
               help="step subsampling within episodes")
p.add_argument("--max_episodes", type=int, default=0)
p.add_argument("--eval_episodes", type=int, default=8)
p.add_argument("--seed", type=int, default=0)
p.add_argument("--tag", default="", help="suffix for the output dir")
p.add_argument("--out_dir", default=None)
p.add_argument("--cpu", action="store_true",
               help="force the CPU backend (smoke tests)")
args = p.parse_args()

if args.cpu:
    # Must run BEFORE importing swarm_ode_tpu: env/step.py creates jnp
    # constants at import, which initializes the default (axon) backend.
    import jax

    jax.config.update("jax_platforms", "cpu")

from swarm_ode_tpu.config import EnvConfig  # noqa: E402
from swarm_ode_tpu.env.layout import build_layout  # noqa: E402
from swarm_ode_tpu.env.state import make_params  # noqa: E402
from swarm_ode_tpu.train import train_bc as bc  # noqa: E402
from swarm_ode_tpu.train.run_rl import RLRunConfig, _make_network  # noqa: E402

files = args.files or sorted(
    glob.glob(f"/root/repo/datasets/warehouse_data_{args.env}_seed*.h5")
)
if not files:
    sys.exit(f"no dataset files for {args.env} — run scripts/collect_data.py")

size = args.env.split("-")[1]
OUT = pathlib.Path(args.out_dir or f"/root/repo/runs/bc_{size}"
                   + (f"_{args.tag}" if args.tag else ""))
OUT.mkdir(parents=True, exist_ok=True)

t0 = time.time()
out = bc.train_bc(
    bc.BCConfig(
        env_id=args.env,
        files=files,
        net=args.net,
        hidden_dim=args.hidden_dim,
        lr=args.lr,
        epochs=args.epochs,
        batch_size=args.batch_size,
        step_stride=args.stride,
        max_episodes=args.max_episodes,
        seed=args.seed,
        checkpoint_dir=str(OUT / "ckpt"),
    ),
    verbose=True,
)

# Greedy rollouts with both operators on the best-val params.
env_cfg = EnvConfig.from_env_id(args.env)
params = make_params(env_cfg, build_layout(env_cfg))
net = _make_network(
    RLRunConfig(net=args.net, hidden_dim=args.hidden_dim),
    params.num_actions, params.num_agvs, params.num_pickers,
    coord_scale=1.0 / float(max(params.grid_h, params.grid_w)),
)
import jax  # noqa: E402

evals = {}
for coord in (False, True):
    evals["coordinated" if coord else "independent"] = bc.evaluate_policy(
        params, net, out["params"], args.eval_episodes,
        jax.random.PRNGKey(args.seed + 17), coordinated=coord,
    )
# Coordinated sampling at temperature: the measured antidote to argmax
# brittleness (RESULTS.md — the over-fit clone rolls 72 argmax vs ~125
# sampled at T=1.5-2).
for T in (1.5, 2.0):
    evals[f"sampled_T{T}"] = bc.evaluate_policy(
        params, net, out["params"], args.eval_episodes,
        jax.random.PRNGKey(args.seed + 23), temperature=T,
    )

result = {
    "env": args.env,
    "files": files,
    "net": args.net,
    "hidden_dim": args.hidden_dim,
    "epochs": args.epochs,
    "stride": args.stride,
    "history": out["history"],
    "best_val_loss": out["best_val_loss"],
    "eval": evals,
    "minutes": (time.time() - t0) / 60,
}
(OUT / "result.json").write_text(json.dumps(result, indent=2))
print(json.dumps({k: v for k, v in result.items() if k != "history"},
                 indent=2))
