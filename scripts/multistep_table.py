"""Merge the multi-horizon eval JSONs into one markdown table.

Columns: GDE(h=1), GDE(h=4), persistence, pos_lstm/pos_gru autoregressive
rollouts, LSTM teacher-forced (upper bound — peeks at true observations
through t+h-1; labeled). All runs share the same eval slice
(seed4000 windows, experiments/gde_multistep.py protocol).
"""
import argparse
import json
import pathlib

ap = argparse.ArgumentParser()
ap.add_argument("--gde_h1", default="/root/repo/runs/gde_medium_ref/multistep.json")
ap.add_argument("--gde_h4", default="/root/repo/runs/gde_medium_ref_h4/multistep.json")
ap.add_argument("--gde_h4w",
                default="/root/repo/runs/gde_medium_ref_h4w/multistep.json",
                help="horizon-weighted flagship (round-4)")
ap.add_argument("--baselines",
                default="/root/repo/runs/baselines_medium/multistep.json")
args = ap.parse_args()

cols = {}  # name -> {h: err}


def _resolve(path):
    """Prefer the live runs/ copy; fall back to the committed
    results_data/sizes/ harvest (scripts/harvest_results.py) so a fresh
    clone prints the full table."""
    p = pathlib.Path(path)
    if p.exists():
        return p
    return pathlib.Path("/root/repo/results_data/sizes",
                        f"{p.parent.name}__{p.name}")


def add(path, mapping, optional=False):
    p = _resolve(path)
    if not p.exists():
        if not optional:
            print(f"<!-- missing: {p} -->")
        return
    data = json.loads(p.read_text())
    for h_key, row in data.items():
        h = int(h_key[1:])
        for json_name, col in mapping.items():
            if json_name in row:
                cols.setdefault(col, {})[h] = row[json_name]


add(args.gde_h1, {"gde_mean_error": "GDE (h=1)",
                  "persistence_mean_error": "persistence"})
# Uniform h=4 is superseded by the weighted flagship (RESULTS.md round 4:
# weighted dominates at every horizon); its round-3 artifact died with
# runs/, so the row prints only when a local copy exists.
add(args.gde_h4, {"gde_mean_error": "GDE (h=4)"}, optional=True)
add(args.gde_h4w, {"gde_mean_error": "GDE (h=4, weighted)"})
add(args.baselines, {"pos_lstm_mean_error": "pos-LSTM (rollout)",
                     "pos_gru_mean_error": "pos-GRU (rollout)",
                     "lstm_mean_error": "LSTM (teacher-forced*)"})

order = ["GDE (h=4, weighted)", "GDE (h=4)", "GDE (h=1)",
         "pos-LSTM (rollout)", "pos-GRU (rollout)",
         "LSTM (teacher-forced*)", "persistence"]
names = [n for n in order if n in cols]
hs = sorted({h for c in cols.values() for h in c})
print("| model | " + " | ".join(f"t=+{h}" for h in hs) + " |")
print("|" + "---|" * (len(hs) + 1))
for n in names:
    cells = [f"{cols[n][h]:.3f}" if h in cols[n] else "—" for h in hs]
    print(f"| {n} | " + " | ".join(cells) + " |")
print()
print("*teacher-forced: consumes TRUE observations up to t+h-1 (the "
      "reference's multi-step convention) — an upper bound, not a rollout.")
