"""Online RL: plain hetero-GNN network + QMIX (reference scripts/graph.py
GraphMARL_QMIX loop, :632-701)."""
import sys
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from swarm_ode_tpu.train.run_rl import RLRunConfig, run_marl
from swarm_ode_tpu.utils.logging import MetricsLogger

p = ArgumentParser(formatter_class=ArgumentDefaultsHelpFormatter)
p.add_argument("--num_episodes", type=int, default=1000)
p.add_argument("--seed", type=int, default=0)
p.add_argument("--env_id", default="tarware-medium-19agvs-9pickers-partialobs-v1")
p.add_argument("--hidden_dim", type=int, default=64)

if __name__ == "__main__":
    args = p.parse_args()
    cfg = RLRunConfig(
        env_id=args.env_id,
        algo="qmix",
        net="gnn",
        num_episodes=args.num_episodes,
        hidden_dim=args.hidden_dim,
        seed=args.seed,
    )
    logger = MetricsLogger("swarm_ode", name="gnn+qmix", config=vars(args),
                           out_dir="runs")
    run_marl(cfg, logger=logger)
    logger.finish()
