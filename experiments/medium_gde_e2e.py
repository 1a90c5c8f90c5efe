import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from swarm_ode_tpu.data.collect import collect_data

t0 = time.time()
stats = collect_data(
    "tarware-medium-19agvs-9pickers-partialobs-v1",
    num_episodes=24, seed=0,
    out_path="/root/repo/datasets/medium_seed0.h5",
    batch=8, chunk=50, verbose=True,
)
print("datagen done in", round(time.time()-t0,1), "s")
