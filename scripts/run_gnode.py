"""Online RL: Graph-ODE network + QMIX (reference scripts/run_gnode.py
"ode+qmix" run, :1328-1531)."""
import sys
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from swarm_ode_tpu.train.run_rl import RLRunConfig, run_marl
from swarm_ode_tpu.utils.logging import MetricsLogger

p = ArgumentParser(formatter_class=ArgumentDefaultsHelpFormatter)
p.add_argument("--num_episodes", type=int, default=1000)
p.add_argument("--seed", type=int, default=0)
p.add_argument("--render", action="store_true")
p.add_argument("--env_id", default="tarware-medium-19agvs-9pickers-partialobs-v1")
p.add_argument("--algo", default="qmix", choices=["iql", "qmix", "coma"])
p.add_argument("--net", default="gnode", choices=["gnode", "gnn", "gru"])
p.add_argument("--hidden_dim", type=int, default=128)
p.add_argument("--checkpoint_dir", default=None)
p.add_argument("--checkpoint_every", type=int, default=100)
p.add_argument("--num_envs", type=int, default=1)
p.add_argument("--n_step", type=int, default=3)
p.add_argument("--learn_every", type=int, default=1)
p.add_argument("--batch_size", type=int, default=32)
p.add_argument("--no_value_transform", action="store_true",
               help="disable R2D2 h-transform value rescaling (QMIX)")
p.add_argument("--team_reward", default="mean", choices=["mean", "sum"])
p.add_argument("--gamma", type=float, default=None,
               help="discount override (default: per-algo reference value)")
p.add_argument("--td_clip", type=float, default=0.0,
               help="raw-space clamp on QMIX bootstrap targets (0 = off)")
p.add_argument("--huber_delta", type=float, default=0.0,
               help="Huber delta for the QMIX TD loss (0 = MSE)")
p.add_argument("--target_tau", type=float, default=0.0,
               help="Polyak target update rate (0 = hard sync)")
p.add_argument("--epsilon_decay", type=float, default=None,
               help="per-update epsilon decay override")
p.add_argument("--eval_every", type=int, default=0,
               help="greedy (epsilon=0) eval probe every N episodes (0=off)")
p.add_argument("--eval_episodes", type=int, default=8)
p.add_argument("--resume_from", default=None,
               help="checkpoint dir to resume agent state from")
p.add_argument("--coordinated", action="store_true",
               help="conflict-masked sequential action selection "
                    "(rl/coordination.py): no two idle same-type agents "
                    "double-book a rack in one macro step")

if __name__ == "__main__":
    args = p.parse_args()
    cfg = RLRunConfig(
        env_id=args.env_id,
        algo=args.algo,
        net=args.net,
        num_episodes=args.num_episodes,
        hidden_dim=args.hidden_dim,
        num_envs=args.num_envs,
        n_step=args.n_step,
        learn_every=args.learn_every,
        batch_size=args.batch_size,
        value_transform=not args.no_value_transform,
        team_reward=args.team_reward,
        gamma=args.gamma,
        td_clip=args.td_clip,
        huber_delta=args.huber_delta,
        target_tau=args.target_tau,
        epsilon_decay=args.epsilon_decay,
        seed=args.seed,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every,
        eval_every=args.eval_every,
        eval_episodes=args.eval_episodes,
        resume_from=args.resume_from,
        coordinated=args.coordinated,
    )
    logger = MetricsLogger("swarm_ode", name=f"{args.net}+{args.algo}",
                           config=vars(args), out_dir="runs")
    run_marl(cfg, logger=logger)
    logger.finish()
