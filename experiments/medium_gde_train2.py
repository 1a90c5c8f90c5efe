import sys, pathlib, time, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
from swarm_ode_tpu.data.dataset import TrajectoryDataset
from swarm_ode_tpu.train.train_gde import GDETrainConfig, train_gde

ds = TrajectoryDataset.from_h5(["/root/repo/datasets/medium_seed0.h5"], seq_len=5, max_episodes=12)
print("windows:", len(ds), flush=True)
cfg = GDETrainConfig(num_epochs=6, batch_size=32, hidden_dim=64, device_data=True)
t0 = time.time()
out = train_gde(ds, cfg)
print("total:", round(time.time()-t0,1), "s; best val:", round(out["best_val_loss"],4))
