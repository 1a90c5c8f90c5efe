"""Honest-temperature paired evaluation of a cloned dispatcher.

Round-3's beats-the-expert DAgger result picked the sampling temperature
T from a sweep evaluated on the SAME paired seeds used for the
significance test (VERDICT r3 weak #4 — selection bias). This wrapper
removes it: T is chosen on a SELECTION seed set, then the winner is
evaluated once on a DISJOINT, larger eval seed set, and only that final
paired difference is reported.

Runs `paired_clone_eval.py` twice as a subprocess (selection, final) and
writes one combined JSON. CPU-backend friendly (--cpu) so it can run
beside a busy chip.
"""
import argparse
import json
import pathlib
import subprocess
import sys

HERE = pathlib.Path(__file__).resolve().parent

p = argparse.ArgumentParser()
p.add_argument("--env", required=True)
p.add_argument("--ckpt", required=True)
p.add_argument("--net", default="gnn")
p.add_argument("--hidden_dim", type=int, default=64)
p.add_argument("--temps", type=float, nargs="*",
               default=[1.5, 2.0, 2.5, 3.0, 4.0])
p.add_argument("--select_seeds", type=int, default=8)
p.add_argument("--select_seed_base", type=int, default=100)
p.add_argument("--eval_seeds", type=int, default=24)
p.add_argument("--eval_seed_base", type=int, default=700,
               help="must be disjoint from the selection range")
p.add_argument("--episodes", type=int, default=8)
p.add_argument("--out", required=True)
p.add_argument("--cpu", action="store_true")
args = p.parse_args()

sel_lo = args.select_seed_base
sel_hi = args.select_seed_base + args.select_seeds
ev_lo = args.eval_seed_base
ev_hi = args.eval_seed_base + args.eval_seeds
assert ev_hi <= sel_lo or sel_hi <= ev_lo, "seed ranges overlap"

out_path = pathlib.Path(args.out)
out_path.parent.mkdir(parents=True, exist_ok=True)


def run_paired(temps, seeds, seed_base, tag):
    tmp = out_path.with_suffix(f".{tag}.json")
    cmd = [
        sys.executable, str(HERE / "paired_clone_eval.py"),
        "--env", args.env, "--ckpt", args.ckpt,
        "--net", args.net, "--hidden_dim", str(args.hidden_dim),
        "--temps", *[str(t) for t in temps],
        "--seeds", str(seeds), "--seed_base", str(seed_base),
        "--episodes", str(args.episodes), "--out", str(tmp),
    ]
    if args.cpu:
        cmd.append("--cpu")
    print(f"[{tag}]", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)
    return json.loads(tmp.read_text())


sel = run_paired(args.temps, args.select_seeds, args.select_seed_base,
                 "select")
best_t = max(
    args.temps,
    key=lambda t: sel[f"clone_T{t}"]["paired_diff_mean"],
)
print(f"selected T={best_t} on seeds [{sel_lo},{sel_hi}) "
      f"(paired diff {sel[f'clone_T{best_t}']['paired_diff_mean']:.2f})",
      flush=True)

fin = run_paired([best_t], args.eval_seeds, args.eval_seed_base, "final")
row = fin[f"clone_T{best_t}"]
t_stat = (row["paired_diff_mean"] / row["paired_diff_sem"]
          if row["paired_diff_sem"] > 0 else float("inf"))
combined = {
    "env": args.env, "ckpt": args.ckpt, "protocol": {
        "temps": args.temps,
        "selection_seeds": [sel_lo, sel_hi],
        "eval_seeds": [ev_lo, ev_hi],
        "episodes_per_seed": args.episodes,
    },
    "selection": sel, "best_T": best_t, "final": fin,
    "headline": {
        "clone_mean": row["mean"], "clone_sem": row["sem"],
        "heuristic_mean": fin["heuristic"]["mean"],
        "heuristic_sem": fin["heuristic"]["sem"],
        "paired_diff_mean": row["paired_diff_mean"],
        "paired_diff_sem": row["paired_diff_sem"],
        "t_stat": t_stat, "n_seeds": args.eval_seeds,
    },
}
out_path.write_text(json.dumps(combined, indent=2))
print(json.dumps({"metric": "honest_t_paired_diff",
                  "env": args.env, "best_T": best_t,
                  "value": round(row["paired_diff_mean"], 2),
                  "sem": round(row["paired_diff_sem"], 2),
                  "t_stat": round(t_stat, 2)}), flush=True)
