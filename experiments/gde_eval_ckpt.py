"""Evaluate a GDE checkpoint with the full metric suite (analysis.evaluate_gde)
without retraining — used when a training run was cut early (the driver only
writes result.json after a complete run). Writes <run_dir>/result.json with
the same "metrics" shape the driver produces.
"""
import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--run_dir", default="/root/repo/runs/gde_medium_ref_h4")
ap.add_argument("--env",
                default="tarware-medium-19agvs-9pickers-partialobs-v1")
ap.add_argument("--seeds", type=int, nargs="*",
                default=[0, 1000, 2000, 3000, 4000])
ap.add_argument("--hidden_dim", type=int, default=64)
ap.add_argument("--max_episodes", type=int, default=None)
ap.add_argument("--cpu", action="store_true")
args = ap.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

from swarm_ode_tpu import analysis  # noqa: E402
from swarm_ode_tpu.data.dataset import TrajectoryDataset  # noqa: E402
from swarm_ode_tpu.graphs.temporal import TemporalWindow, build_temporal_graph  # noqa: E402
from swarm_ode_tpu.models.gde import GraphODE  # noqa: E402
from swarm_ode_tpu.utils.checkpoint import CheckpointManager  # noqa: E402

DATA = pathlib.Path("/root/repo/datasets")
RUN = pathlib.Path(args.run_dir)

files = [str(DATA / f"warehouse_data_{args.env}_seed{s}.h5")
         for s in args.seeds]
files = [f for f in files if pathlib.Path(f).exists()]
ds = TrajectoryDataset.from_h5(files, seq_len=5,
                               max_episodes=args.max_episodes)
print(f"windows: {len(ds)}", flush=True)

model = GraphODE(node_dim=ds.obs_dim, num_agvs=ds.num_agvs,
                 num_pickers=ds.num_pickers, hidden_dim=args.hidden_dim)
w0 = ds.batch([0])
g0 = build_temporal_graph(
    TemporalWindow(obs=jnp.asarray(w0["obs"][0]),
                   count=jnp.int32(w0["count"][0])),
    ds.num_agvs, 5.0,
)
params0 = model.init(jax.random.PRNGKey(0), g0, jnp.array([0.0, 1.0]))
ck = CheckpointManager(str(RUN / "ckpt"))
restored = ck.restore({"params": jax.tree.map(np.asarray, params0)},
                      partial=True)
params = restored["params"]
print(f"restored checkpoint step {ck.latest_step()}", flush=True)

m = analysis.evaluate_gde(model, params, ds,
                          indices=range(0, len(ds), max(1, len(ds) // 4000)))
metrics = {k: round(float(v), 4) for k, v in m.items()}
print(json.dumps(metrics, indent=1), flush=True)

out_path = RUN / "result.json"
payload = {"metrics": metrics, "checkpoint_step": int(ck.latest_step()),
           "windows": len(ds), "note": "evaluated from checkpoint"}
if out_path.exists():  # keep any training history already there
    prev = json.loads(out_path.read_text())
    prev.update(payload)
    payload = prev
out_path.write_text(json.dumps(payload, indent=1))
print("saved", out_path)
