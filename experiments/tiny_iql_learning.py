import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
from swarm_ode_tpu.train.run_rl import RLRunConfig, run_marl

cfg = RLRunConfig(
    env_id="tarware-tiny-3agvs-2pickers-partialobs-v1",
    algo="iql", net="gnn", num_envs=4, num_episodes=120,
    hidden_dim=64, buffer_size=60_000, batch_size=64,
)
out = run_marl(cfg, verbose=False)
hist = out["history"]
rets = [h["return"] for h in hist]
losses = [h["loss"] for h in hist]
k = max(len(rets)//4, 1)
print("returns first-quarter mean:", round(float(np.mean(rets[:k])),2),
      "| last-quarter mean:", round(float(np.mean(rets[-k:])),2))
print("losses first/last:", round(losses[0],3), round(losses[-1],3))
print("per-iteration returns:", [round(r,1) for r in rets[::3]])
