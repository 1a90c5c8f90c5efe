"""Greedy-probe evaluation of a trained RL checkpoint.

Runs run_marl in evaluation-only mode (num_episodes=0): restores the
agent from --resume_from and rolls pure-greedy (epsilon=0) episodes,
optionally with coordinated (claim-auction) action selection
(rl/coordination.py). Training the Q-network is untouched, so comparing
--coordinated off/on on the SAME checkpoint isolates coordination as a
pure policy-improvement operator — the structural lever from the round-3
QMIX plateau analysis (RESULTS.md).

Reference convention: greedy stat-line rollouts (run_heuristic.py:30-58).
"""
import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

p = argparse.ArgumentParser()
p.add_argument("--resume_from", required=True,
               help="checkpoint dir (e.g. runs/qmix_medium_5k_v2_30k/ckpt)")
p.add_argument("--env_id",
               default="tarware-medium-19agvs-9pickers-partialobs-v1")
p.add_argument("--algo", default="qmix")
p.add_argument("--net", default="gnode")
p.add_argument("--hidden_dim", type=int, default=64)
p.add_argument("--eval_episodes", type=int, default=8)
p.add_argument("--seeds", type=int, default=3,
               help="independent probe repeats (different env seeds)")
p.add_argument("--coordinated", action="store_true")
p.add_argument("--stochastic", action="store_true",
               help="evaluate the training-time action distribution "
                    "(COMA: sampled policy) instead of greedy")
p.add_argument("--cpu", action="store_true",
               help="force the CPU backend (TPU busy/down)")
p.add_argument("--out", default=None, help="append one JSON line here")
args = p.parse_args()

if args.cpu:
    # Must run BEFORE importing swarm_ode_tpu: env/step.py creates jnp
    # constants at import, which initializes the default (axon) backend.
    import jax

    jax.config.update("jax_platforms", "cpu")

from swarm_ode_tpu.train.run_rl import RLRunConfig, run_marl  # noqa: E402

t0 = time.time()
probes = []
for s in range(args.seeds):
    cfg = RLRunConfig(
        env_id=args.env_id,
        algo=args.algo,
        net=args.net,
        hidden_dim=args.hidden_dim,
        num_episodes=0,  # eval-only mode
        buffer_size=64,  # unused in eval-only mode; keep allocation tiny
        eval_episodes=args.eval_episodes,
        seed=1_000_003 * (s + 1),
        resume_from=args.resume_from,
        coordinated=args.coordinated,
        eval_stochastic=args.stochastic,
    )
    out = run_marl(cfg, verbose=True)
    probes.append(out["history"][0])

rates = [pr["eval_pick_rate"] for pr in probes]
summary = {
    "checkpoint": args.resume_from,
    "env_id": args.env_id,
    "coordinated": bool(args.coordinated),
    "stochastic": bool(args.stochastic),
    "eval_episodes": args.eval_episodes,
    "seeds": args.seeds,
    "pick_rates": rates,
    "mean_pick_rate": sum(rates) / len(rates),
    "mean_deliveries": sum(pr["eval_deliveries"] for pr in probes)
    / len(probes),
    "minutes": (time.time() - t0) / 60,
}
line = json.dumps(summary)
print(line)
if args.out:
    with pathlib.Path(args.out).open("a") as f:
        f.write(line + "\n")
