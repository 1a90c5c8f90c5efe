import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from swarm_ode_tpu.train.run_rl import RLRunConfig, run_marl

cfg = RLRunConfig(
    env_id="tarware-medium-19agvs-9pickers-partialobs-v1",
    algo="qmix", net="gnode", num_envs=4, num_episodes=12,
    hidden_dim=64, buffer_size=50_000, batch_size=32,
)
out = run_marl(cfg, verbose=True)
hist = out["history"]
print("mean pick rate first/last:", hist[0]["pick_rate"], hist[-1]["pick_rate"])
