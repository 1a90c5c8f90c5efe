"""Offline GDE training CLI (reference scripts/train_gde.py:428-535).

Defaults mirror the reference: 5 seed files of the medium-19-9 env,
200 epochs, batch 32, lr 1e-3, weight decay 1e-4.
"""
import sys
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from swarm_ode_tpu.data.dataset import TrajectoryDataset
from swarm_ode_tpu.train.train_gde import GDETrainConfig, train_gde
from swarm_ode_tpu.utils.logging import MetricsLogger

p = ArgumentParser(formatter_class=ArgumentDefaultsHelpFormatter)
p.add_argument("--env_id", default="tarware-medium-19agvs-9pickers-partialobs-v1")
p.add_argument("--seeds", nargs="*", type=int, default=[0, 1000, 2000, 3000, 4000])
p.add_argument("--data_dir", default=".")
p.add_argument("--files", nargs="*", default=None,
               help="explicit h5 paths (overrides env_id/seeds naming)")
p.add_argument("--num_epochs", type=int, default=200)
p.add_argument("--batch_size", type=int, default=32)
p.add_argument("--lr", type=float, default=1e-3)
p.add_argument("--weight_decay", type=float, default=1e-4)
p.add_argument("--hidden_dim", type=int, default=64)
p.add_argument("--ode_solver", default="euler",
               choices=["euler", "midpoint", "rk4", "dopri5"])
p.add_argument("--seq_len", type=int, default=5)
p.add_argument("--max_episodes", type=int, default=None)
p.add_argument("--checkpoint_dir", default=None)

if __name__ == "__main__":
    args = p.parse_args()
    files = args.files or [
        str(Path(args.data_dir) / f"warehouse_data_{args.env_id}_seed{s}.h5")
        for s in args.seeds
    ]
    files = [f for f in files if Path(f).exists()]
    if not files:
        sys.exit("No dataset files found; run scripts/collect_data.py first.")
    ds = TrajectoryDataset.from_h5(files, seq_len=args.seq_len,
                                   max_episodes=args.max_episodes)
    print(f"Loaded {len(ds)} step pairs from {len(files)} files "
          f"(node dim {ds.obs_dim}; {ds.num_agvs} AGVs, {ds.num_pickers} Pickers)")
    cfg = GDETrainConfig(
        num_epochs=args.num_epochs,
        batch_size=args.batch_size,
        lr=args.lr,
        weight_decay=args.weight_decay,
        hidden_dim=args.hidden_dim,
        ode_solver=args.ode_solver,
        checkpoint_dir=args.checkpoint_dir,
    )
    logger = MetricsLogger("graph-ode-warehouse", config=vars(args),
                           out_dir="runs")
    out = train_gde(ds, cfg, logger=logger)
    logger.finish()
    print(f"Best val loss: {out['best_val_loss']:.6f}")
