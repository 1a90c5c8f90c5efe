"""COMA learning curve on medium-19-9 with the counterfactual advantage
(VERDICT item 5, second half): the reference wires COMA (gru.py:182-511)
but its loop never produced a curve; this commits one.

Per-stride stats stream to runs/coma_medium/coma_medium.jsonl.
"""
import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

OUT = pathlib.Path("/root/repo/runs/coma_medium")

p = argparse.ArgumentParser()
p.add_argument("--num_episodes", type=int, default=2000)
p.add_argument("--num_envs", type=int, default=8)
p.add_argument("--env_id",
               default="tarware-medium-19agvs-9pickers-partialobs-v1")
p.add_argument("--lr_actor", type=float, default=1e-3)
p.add_argument("--lr_critic", type=float, default=1e-3)
p.add_argument("--entropy", type=float, default=0.01)
p.add_argument("--entropy_decay", type=float, default=1.0)
p.add_argument("--eval_every", type=int, default=0,
               help="greedy probe cadence in episodes (0 = off)")
p.add_argument("--eval_episodes", type=int, default=8)
p.add_argument("--tag", default="", help="suffix for the output dir")
p.add_argument("--out_dir", default=None)
p.add_argument("--coordinated", action="store_true",
               help="claim-masked sequential sampling scored under its "
                    "exact density (rl/coordination.py)")
p.add_argument("--cpu", action="store_true")
args = p.parse_args()
if args.cpu:
    # Must run BEFORE importing swarm_ode_tpu: env/step.py creates jnp
    # constants at import, which initializes the default (axon) backend.
    import jax

    jax.config.update("jax_platforms", "cpu")

from swarm_ode_tpu.train.run_rl import RLRunConfig, run_marl  # noqa: E402
from swarm_ode_tpu.utils.logging import MetricsLogger  # noqa: E402

if args.tag:
    OUT = pathlib.Path(str(OUT) + "_" + args.tag)
if args.out_dir:
    OUT = pathlib.Path(args.out_dir)
OUT.mkdir(parents=True, exist_ok=True)

cfg = RLRunConfig(
    env_id=args.env_id,
    algo="coma",
    net="gnode",
    num_envs=args.num_envs,
    num_episodes=args.num_episodes,
    hidden_dim=64,
    buffer_size=50_000,
    batch_size=64,
    learn_every=4,
    team_reward="mean",
    coma_lr_actor=args.lr_actor,
    coma_lr_critic=args.lr_critic,
    coma_entropy=args.entropy,
    coma_entropy_decay=args.entropy_decay,
    coordinated=args.coordinated,
    eval_every=args.eval_every,
    eval_episodes=args.eval_episodes,
    checkpoint_dir=str(OUT / "ckpt"),
    checkpoint_every=500,
)
logger = MetricsLogger(project="swarm_ode_tpu", name="coma_medium",
                       out_dir=str(OUT), use_wandb=False)
t0 = time.time()
out = run_marl(cfg, logger=logger, verbose=True)
hist = out["history"]
n = len(hist)
q = max(1, n // 4)
print(f"\n{args.num_episodes} episodes in {(time.time()-t0)/60:.1f} min")
for name in ("pick_rate", "return"):
    vals = [h[name] for h in hist if name in h]
    quarts = [sum(vals[i:i+q]) / len(vals[i:i+q])
              for i in range(0, len(vals), q)]
    print(f"{name} quartile means: " +
          " ".join(f"{v:.3f}" for v in quarts))
