import sys, pathlib, time, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
from swarm_ode_tpu.data.dataset import TrajectoryDataset
from swarm_ode_tpu.train.train_gde import GDETrainConfig, train_gde
from swarm_ode_tpu import analysis

ds = TrajectoryDataset.from_h5(["/root/repo/datasets/medium_seed0.h5"], seq_len=5, max_episodes=12)
print("windows:", len(ds), "obs_dim:", ds.obs_dim, flush=True)
cfg = GDETrainConfig(num_epochs=10, batch_size=32, hidden_dim=64,
                     checkpoint_dir="/root/repo/runs/gde_medium_ckpt")
out = train_gde(ds, cfg)
print("best val:", out["best_val_loss"])
m = analysis.evaluate_gde(out["model"], out["params"], ds, indices=range(0, 2000, 10))
print(json.dumps({k: round(float(v), 4) for k, v in m.items()}, indent=1))
