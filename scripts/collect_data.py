"""Dataset generation driver (reference scripts/collect_data.py:416-441).

Default sweep matches the reference: 5 env configs x 5 base seeds x 200
episodes; flags let you scope it down.
"""
import sys
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from swarm_ode_tpu.data.collect import collect_data

DEFAULT_ENVS = [
    "tarware-tiny-3agvs-2pickers-partialobs-v1",
    "tarware-small-6agvs-3pickers-partialobs-v1",
    "tarware-medium-10agvs-5pickers-partialobs-v1",
    "tarware-medium-19agvs-9pickers-partialobs-v1",
    "tarware-large-15agvs-8pickers-partialobs-v1",
]
DEFAULT_SEEDS = [0, 1000, 2000, 3000, 4000]

p = ArgumentParser(formatter_class=ArgumentDefaultsHelpFormatter)
p.add_argument("--env_ids", nargs="*", default=DEFAULT_ENVS)
p.add_argument("--seeds", nargs="*", type=int, default=DEFAULT_SEEDS)
p.add_argument("--num_episodes", type=int, default=200)
p.add_argument("--batch", type=int, default=8)
p.add_argument("--out_dir", default=".")
p.add_argument(
    "--schema", default="columnar", choices=["columnar", "reference"],
    help="columnar: stacked per-episode datasets (~50x smaller files); "
    "reference: the upstream group-per-step layout for interop",
)

if __name__ == "__main__":
    args = p.parse_args()
    Path(args.out_dir).mkdir(parents=True, exist_ok=True)
    for env_id in args.env_ids:
        for seed in args.seeds:
            out = str(
                Path(args.out_dir) / f"warehouse_data_{env_id}_seed{seed}.h5"
            )
            if Path(out).exists():
                import h5py

                with h5py.File(out, "r") as f:
                    n = sum(1 for k in f.keys() if k.startswith("episode_"))
                if n >= args.num_episodes:
                    print(f"Skipping {out} (complete: {n} episodes)")
                    continue
            print(f"Starting data collection for {env_id} with seed {seed}")
            collect_data(
                env_id,
                num_episodes=args.num_episodes,
                seed=seed,
                out_path=out,
                batch=args.batch,
                schema=args.schema,
            )
            print(f"Completed data collection for {env_id} with seed {seed}")
