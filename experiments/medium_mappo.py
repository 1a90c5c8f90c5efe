"""MAPPO on medium-19-9 (rl/ppo.py): coordinated sequential policy,
centralized value, optional BC/DAgger warm start — the clone-then-improve
recipe aimed at the FIFO dispatcher's 127.6 pick rate."""
import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

p = argparse.ArgumentParser()
p.add_argument("--env", default="tarware-medium-19agvs-9pickers-partialobs-v1")
p.add_argument("--net", default="gnn")
p.add_argument("--hidden_dim", type=int, default=64)
p.add_argument("--num_envs", type=int, default=8)
p.add_argument("--num_strides", type=int, default=125,
               help="episodes = num_strides * num_envs")
p.add_argument("--lr", type=float, default=3e-4)
p.add_argument("--ppo_epochs", type=int, default=2)
p.add_argument("--minibatch", type=int, default=128)
p.add_argument("--entropy_coef", type=float, default=0.01)
p.add_argument("--clip_eps", type=float, default=0.2)
p.add_argument("--init_from", default=None,
               help="BC/DAgger checkpoint dir (q_params) to warm-start")
p.add_argument("--no_coordinated", action="store_true")
p.add_argument("--mesh_devices", type=int, default=0,
               help="dp-shard envs over the first N devices (0 = one)")
p.add_argument("--eval_every", type=int, default=25)
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

from swarm_ode_tpu.rl.ppo import MAPPOConfig, run_mappo  # noqa: E402
from swarm_ode_tpu.utils.logging import MetricsLogger  # noqa: E402

size = args.env.split("-")[1]
OUT = pathlib.Path(args.out_dir or f"/root/repo/runs/mappo_{size}"
                   + (f"_{args.tag}" if args.tag else ""))
OUT.mkdir(parents=True, exist_ok=True)

cfg = MAPPOConfig(
    env_id=args.env,
    net=args.net,
    hidden_dim=args.hidden_dim,
    num_envs=args.num_envs,
    num_strides=args.num_strides,
    lr=args.lr,
    ppo_epochs=args.ppo_epochs,
    minibatch=args.minibatch,
    entropy_coef=args.entropy_coef,
    clip_eps=args.clip_eps,
    coordinated=not args.no_coordinated,
    init_from=args.init_from,
    mesh_devices=args.mesh_devices,
    eval_every=args.eval_every,
    eval_episodes=args.eval_episodes,
    seed=args.seed,
    checkpoint_dir=str(OUT / "ckpt"),
)
logger = MetricsLogger(project="swarm_ode_tpu", name="mappo_medium",
                       out_dir=str(OUT), use_wandb=False)
t0 = time.time()
out = run_mappo(cfg, verbose=True, logger=logger)
hist = out["history"]
n = len(hist)
q = max(1, n // 4)
print(f"\n{args.num_strides * args.num_envs} episodes in "
      f"{(time.time() - t0) / 60:.1f} min")
for name in ("pick_rate", "eval_pick_rate"):
    vals = [h[name] for h in hist if name in h]
    if not vals:
        continue
    qq = max(1, len(vals) // 4)
    quarts = [sum(vals[i:i + qq]) / len(vals[i:i + qq])
              for i in range(0, len(vals), qq)]
    print(f"{name} quartile means: " + ", ".join(f"{v:.2f}" for v in quarts))
(OUT / "result.json").write_text(json.dumps(
    {"config": {k: v for k, v in vars(args).items()}, "history": hist},
    indent=2,
))
