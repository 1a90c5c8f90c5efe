"""Dataset analysis CLI (reference scripts/analyze_dataset.ipynb):
spatial density heatmaps and trajectory statistics over logged HDF5 data."""
import json
import sys
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from swarm_ode_tpu import analysis
from swarm_ode_tpu.data.dataset import TrajectoryDataset, extract_positions_np

p = ArgumentParser(formatter_class=ArgumentDefaultsHelpFormatter)
p.add_argument("--files", nargs="+", required=True)
p.add_argument("--max_episodes", type=int, default=None)
p.add_argument("--heatmap_out", default=None, help="save density heatmap PNG")

if __name__ == "__main__":
    args = p.parse_args()
    ds = TrajectoryDataset.from_h5(args.files, max_episodes=args.max_episodes)
    all_pos = [
        extract_positions_np(ep, ds.num_agvs) for ep in ds.episodes
    ]
    stats = {}
    per_ep = [analysis.trajectory_statistics(p_) for p_ in all_pos]
    for k in per_ep[0]:
        stats[k] = float(np.mean([s[k] for s in per_ep]))
    stats["episodes"] = len(ds.episodes)
    stats["steps_per_episode"] = int(ds.episodes[0].shape[0])
    print(json.dumps(stats, indent=2))

    if args.heatmap_out:
        H = int(max(p_[..., 1].max() for p_ in all_pos)) + 2
        W = int(max(p_[..., 0].max() for p_ in all_pos)) + 2
        density = analysis.spatial_density(
            np.concatenate([p_.reshape(-1, 2) for p_ in all_pos]), (H, W)
        )
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imshow(density, cmap="viridis")
        plt.colorbar(label="visit density")
        plt.title("agent spatial density")
        plt.savefig(args.heatmap_out, dpi=120, bbox_inches="tight")
        print(f"saved {args.heatmap_out}")
