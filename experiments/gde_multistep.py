"""Multi-horizon GDE evaluation: integrate the trained ODE to t = 1..H
in ONE solve and score each horizon against the true future positions —
the continuous-time capability the discrete 1-step baselines don't have
(reference result_analysis.ipynb's multi_step cell approximates this with
teacher-forced 1-step predictions; here the ODE genuinely extrapolates).

Baseline: persistence (position frozen at the last observed frame).
Uses the reference-scale checkpoint from experiments/medium_gde_ref_scale.py.
"""
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import numpy as np

import argparse

ap = argparse.ArgumentParser()
ap.add_argument("--data_dir", default="/root/repo/datasets",
               help="dataset .h5 directory (smokes point this at "
                    "the committed tests/fixtures/datasets)")
ap.add_argument("--run_dir", default="/root/repo/runs/gde_medium_ref")
ap.add_argument("--horizon", type=int, default=4)
ap.add_argument("--batch", type=int, default=64)
ap.add_argument("--max_episodes", type=int, default=40)
ap.add_argument("--max_batches", type=int, default=0, help="0 = all")
ap.add_argument("--hidden_dim", type=int, default=64,
                help="must match the checkpointed model")
ap.add_argument("--cpu", action="store_true",
                help="force the CPU backend (smoke tests)")
ap.add_argument("--env",
                default="tarware-medium-19agvs-9pickers-partialobs-v1")
args = ap.parse_args()
DATA = pathlib.Path(args.data_dir)
if args.cpu:
    # Must run BEFORE importing swarm_ode_tpu: env/step.py creates jnp
    # constants at import, which initializes the default (axon) backend.
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from swarm_ode_tpu.data.dataset import TrajectoryDataset  # noqa: E402
from swarm_ode_tpu.graphs.temporal import (  # noqa: E402
    TemporalWindow,
    build_temporal_batch,
    build_temporal_graph,
)
from swarm_ode_tpu.models.gde import GraphODE  # noqa: E402
from swarm_ode_tpu.utils.checkpoint import CheckpointManager  # noqa: E402

ENV = args.env
# DATA set from --data_dir above
CKPT = pathlib.Path(args.run_dir) / "ckpt"
OUT = pathlib.Path(args.run_dir) / "multistep.json"
HORIZON = args.horizon
B = args.batch

# Held-out-ish slice: last seed file only, modest episode count.
ds = TrajectoryDataset.from_h5(
    [str(DATA / f"warehouse_data_{ENV}_seed4000.h5")], seq_len=5,
    max_episodes=args.max_episodes,
)
print(f"windows: {len(ds)}", flush=True)

model = GraphODE(node_dim=ds.obs_dim, num_agvs=ds.num_agvs,
                 num_pickers=ds.num_pickers, hidden_dim=args.hidden_dim)
w0 = ds.batch([0])
g0 = build_temporal_graph(
    TemporalWindow(obs=jnp.asarray(w0["obs"][0]),
                   count=jnp.int32(w0["count"][0])),
    ds.num_agvs, 5.0,
)
t_span = jnp.arange(HORIZON + 1, dtype=jnp.float32)
params0 = model.init(jax.random.PRNGKey(0), g0, jnp.array([0.0, 1.0]))
ck = CheckpointManager(str(CKPT))
restored = ck.restore({"params": jax.tree.map(np.asarray, params0)},
                      partial=True)
if restored is None:
    sys.exit(f"no checkpoint found under {CKPT} (empty or missing run dir)")
params = restored["params"]
print(f"restored checkpoint step {ck.latest_step()}", flush=True)


@jax.jit
def predict_traj(obs, count):
    g = build_temporal_batch(obs, count, ds.num_agvs)
    pred = model.apply_batched(params, g, t_span)["trajectories"]
    # (H+1, B, W, N, 2) -> newest-frame agents per horizon: (H+1, B, N, 2)
    cur = jnp.take_along_axis(
        pred, jnp.maximum(count - 1, 0)[None, :, None, None, None], axis=2
    )[:, :, 0]
    return cur


# Windows whose episode has >= HORIZON future steps after the window end.
# ds._index rows are (episode, t); next_pos is t+1, so require t+H < T.
idx = np.asarray(ds._index)
T = ds.episodes[0].shape[0]
valid = np.nonzero(idx[:, 1] + HORIZON < T - 1)[0][:: max(1, len(idx) // 3000)]
print(f"eval windows: {len(valid)}", flush=True)

errs = [[] for _ in range(HORIZON)]
perrs = [[] for _ in range(HORIZON)]
if args.max_batches:
    valid = valid[: args.max_batches * B]
for i in range(0, len(valid) - B + 1, B):
    sel = valid[i:i + B]
    b = ds.batch(sel)
    traj = np.asarray(predict_traj(jnp.asarray(b["obs"]),
                                   jnp.asarray(b["count"], jnp.int32)))
    last_pos = np.stack([
        np.asarray(ds._positions[idx[j, 0]][idx[j, 1]]) for j in sel
    ])  # (B, N, 2) position at window end (persistence baseline)
    for h in range(1, HORIZON + 1):
        true = np.stack([
            np.asarray(ds._positions[idx[j, 0]][idx[j, 1] + h]) for j in sel
        ])
        errs[h - 1].append(np.linalg.norm(traj[h] - true, axis=-1).mean())
        perrs[h - 1].append(np.linalg.norm(last_pos - true, axis=-1).mean())

rows = {}
for h in range(1, HORIZON + 1):
    rows[f"h{h}"] = {
        "gde_mean_error": float(np.mean(errs[h - 1])),
        "persistence_mean_error": float(np.mean(perrs[h - 1])),
    }
    print(f"horizon +{h}: GDE {rows[f'h{h}']['gde_mean_error']:.3f} cells"
          f" vs persistence {rows[f'h{h}']['persistence_mean_error']:.3f}",
          flush=True)
OUT.write_text(json.dumps(rows, indent=1))
print("saved", OUT)
