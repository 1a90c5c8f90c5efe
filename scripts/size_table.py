"""Assemble the multi-size model-comparison table (reference
train_baselines.py:455-461 sweeps tiny/small/medium10/large; this repo
adds medium-19-9 and extralarge).

Reads baselines_<short> results.json (medium_baselines_table.py output)
and gde_<short>_ref_h4 result.json (medium_gde_ref_scale.py output) for
each size — preferring the live runs/ copy, falling back to the
committed results_data/sizes/ harvest (scripts/harvest_results.py) so a
fresh clone prints the full table — and prints one markdown table of
next-step val MSE / mean position error / success@1.0 per (size, model).

Usage: python scripts/size_table.py [--sizes tiny small medium10 large]
"""
import argparse
import json
import pathlib
import sys

RUNS = pathlib.Path("/root/repo/runs")
HARVEST = pathlib.Path("/root/repo/results_data/sizes")
DEFAULT_SIZES = ["tiny", "small", "medium10", "medium", "large",
                 "extralarge"]

p = argparse.ArgumentParser()
p.add_argument("--sizes", nargs="*", default=DEFAULT_SIZES)
p.add_argument("--models", nargs="*",
               default=["gde", "gru", "lstm", "pos_gru", "pos_lstm"])
args = p.parse_args()


def fmt(v):
    return f"{v:.4f}" if isinstance(v, (int, float)) else "—"


def _find(run_name: str, fname: str):
    live = RUNS / run_name / fname
    if live.exists():
        return live
    harvested = HARVEST / f"{run_name}__{fname}"
    return harvested if harvested.exists() else None


rows = []
for size in args.sizes:
    table = {}
    bj = _find(f"baselines_{size}", "results.json")
    if bj is not None:
        table.update(json.loads(bj.read_text()))
    # Mini-recipe restores (10 epochs, 120 episodes) fill models whose
    # full-recipe artifacts died with runs/ on VM resets — labeled, and
    # never shadowing a full-recipe row.
    bmj = _find(f"baselines_{size}_mini", "results.json")
    if bmj is not None:
        for k, v in json.loads(bmj.read_text()).items():
            if k not in table:
                table[f"{k} (mini)"] = v
    # Flagships train with the horizon-weighted loss (tag h4w); the
    # per-size sweep rows are plain h4. Prefer the weighted run.
    gj = (_find(f"gde_{size}_ref_h4w", "result.json")
          or _find(f"gde_{size}_ref_h4", "result.json"))
    if gj is not None:
        g = json.loads(gj.read_text())
        table["gde"] = {
            "best_val_mse": min(g["history"]["val_loss"]),
            **g["metrics"],
        }
    for base in args.models:
        for model in (base, f"{base} (mini)"):
            r = table.get(model)
            if not r:
                continue
            rows.append((size, model, r.get("best_val_mse"),
                         r.get("mean_error"), r.get("success_rate@1.0")))

if not rows:
    sys.exit("no results found under runs/ or results_data/sizes/")

print("| size | model | val MSE | mean err (cells) | success@1.0 |")
print("|---|---|---|---|---|")
for size, model, mse, err, s1 in rows:
    print(f"| {size} | {model} | {fmt(mse)} | {fmt(err)} | {fmt(s1)} |")
