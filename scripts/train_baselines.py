"""GRU/LSTM baseline training CLI (reference scripts/train_baselines.py:338-531)."""
import sys
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from swarm_ode_tpu.data.dataset import TrajectoryDataset
from swarm_ode_tpu.train.train_baselines import (
    BaselineTrainConfig,
    MODEL_FACTORIES,
    train_baseline,
)

p = ArgumentParser(formatter_class=ArgumentDefaultsHelpFormatter)
p.add_argument("--env_id", default="tarware-medium-19agvs-9pickers-partialobs-v1")
p.add_argument("--seeds", nargs="*", type=int, default=[0, 1000, 2000, 3000, 4000])
p.add_argument("--data_dir", default=".")
p.add_argument("--files", nargs="*", default=None)
p.add_argument("--models", nargs="*", default=list(MODEL_FACTORIES),
               choices=list(MODEL_FACTORIES))
p.add_argument("--num_epochs", type=int, default=200)
p.add_argument("--batch_size", type=int, default=32)
p.add_argument("--hidden_dim", type=int, default=128)
p.add_argument("--seq_len", type=int, default=5)
p.add_argument("--max_episodes", type=int, default=None)

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
    for model in args.models:
        cfg = BaselineTrainConfig(
            model=model,
            num_epochs=args.num_epochs,
            batch_size=args.batch_size,
            hidden_dim=args.hidden_dim,
        )
        out = train_baseline(ds, cfg)
        print(f"[{model}] best val loss: {out['best_val_loss']:.6f}")
