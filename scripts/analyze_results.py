"""Trajectory-prediction evaluation CLI (reference
scripts/result_analysis.ipynb cells 1-4): loads a trained GDE checkpoint,
evaluates position error / success rates / collision prediction on a
dataset."""
import json
import sys
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from swarm_ode_tpu import analysis
from swarm_ode_tpu.data.dataset import TrajectoryDataset
from swarm_ode_tpu.graphs.temporal import TemporalWindow, build_temporal_graph
from swarm_ode_tpu.models.gde import GraphODE
from swarm_ode_tpu.utils.checkpoint import CheckpointManager

p = ArgumentParser(formatter_class=ArgumentDefaultsHelpFormatter)
p.add_argument("--files", nargs="+", required=True, help="h5 dataset paths")
p.add_argument("--checkpoint_dir", required=True)
p.add_argument("--seq_len", type=int, default=5)
p.add_argument("--hidden_dim", type=int, default=64)
p.add_argument("--max_episodes", type=int, default=None)
p.add_argument("--max_windows", type=int, default=2000)

if __name__ == "__main__":
    args = p.parse_args()
    ds = TrajectoryDataset.from_h5(args.files, seq_len=args.seq_len,
                                   max_episodes=args.max_episodes)
    model = GraphODE(node_dim=ds.obs_dim, hidden_dim=args.hidden_dim)
    b0 = ds.batch([0])
    import jax.numpy as jnp

    g0 = build_temporal_graph(
        TemporalWindow(obs=jnp.asarray(b0["obs"][0]),
                       count=jnp.int32(b0["count"][0])),
        ds.num_agvs,
    )
    params = model.init(jax.random.PRNGKey(0), g0, jnp.array([0.0, 1.0]))
    mgr = CheckpointManager(args.checkpoint_dir)
    restored = mgr.restore(
        {"params": jax.tree.map(np.asarray, params)}, partial=True
    )
    if restored is None:
        sys.exit("No checkpoint found")
    indices = range(min(len(ds), args.max_windows))
    metrics = analysis.evaluate_gde(model, restored["params"], ds, indices)
    print(json.dumps({k: round(v, 5) for k, v in metrics.items()}, indent=2))
