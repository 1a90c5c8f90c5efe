import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
from swarm_ode_tpu.train.run_rl import RLRunConfig, run_marl
cfg = RLRunConfig(
    env_id="tarware-medium-19agvs-9pickers-partialobs-v1",
    algo="qmix", net="gnode", num_envs=8, num_episodes=64,
    hidden_dim=64, buffer_size=100_000, batch_size=64,
)
out = run_marl(cfg, verbose=False)
hist = out["history"]
print("losses:", [round(h["loss"],1) for h in hist])
print("pick rates:", [round(h["pick_rate"],1) for h in hist])
