"""5000-episode IQL run on medium-19-9 — individual per-agent rewards
give each agent its own credit signal (deliveries/handoffs are
individually attributed in env/step.py), the easier learning problem next
to QMIX's team reward. Reference analogue: SimpleIndependentDQN
(run_gnode.py:529-716), which never demonstrated learning at this scale.

Per-stride stats stream to runs/iql_medium/iql_medium.jsonl.
"""
import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from swarm_ode_tpu.train.run_rl import RLRunConfig, run_marl
from swarm_ode_tpu.utils.logging import MetricsLogger

OUT = pathlib.Path("/root/repo/runs/iql_medium")
OUT.mkdir(parents=True, exist_ok=True)

p = argparse.ArgumentParser()
p.add_argument("--num_episodes", type=int, default=5000)
p.add_argument("--num_envs", type=int, default=8)
args = p.parse_args()

cfg = RLRunConfig(
    env_id="tarware-medium-19agvs-9pickers-partialobs-v1",
    algo="iql",
    net="gnode",
    num_envs=args.num_envs,
    num_episodes=args.num_episodes,
    hidden_dim=64,
    buffer_size=200_000,
    batch_size=64,
    learn_every=4,
    n_step=3,
    epsilon_decay=0.99995,
    checkpoint_dir=str(OUT / "ckpt"),
    checkpoint_every=500,
)
logger = MetricsLogger(project="swarm_ode_tpu", name="iql_medium",
                       out_dir=str(OUT), use_wandb=False)
t0 = time.time()
out = run_marl(cfg, logger=logger, verbose=True)
hist = out["history"]
n = len(hist)
q = max(1, n // 8)
print(f"\n{args.num_episodes} episodes in {(time.time()-t0)/60:.1f} min")
for name in ("loss", "pick_rate"):
    vals = [h[name] for h in hist if name in h]
    octs = [sum(vals[i:i+q]) / len(vals[i:i+q])
            for i in range(0, len(vals), q)]
    print(f"{name} octile means: " +
          " ".join(f"{v:.3f}" for v in octs))
