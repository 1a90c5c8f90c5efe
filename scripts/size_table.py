"""Assemble the multi-size model-comparison table (reference
train_baselines.py:455-461 sweeps tiny/small/medium10/large; this repo
adds medium-19-9 and extralarge).

Reads runs/baselines_<short>/results.json (medium_baselines_table.py
output) and runs/gde_<short>_ref_h4/result.json (medium_gde_ref_scale.py
output) for each size and prints one markdown table of next-step val MSE
/ mean position error / success@1.0 per (size, model).

Usage: python scripts/size_table.py [--sizes tiny small medium10 large]
"""
import argparse
import json
import pathlib
import sys

RUNS = pathlib.Path("/root/repo/runs")
DEFAULT_SIZES = ["tiny", "small", "medium10", "medium", "large",
                 "extralarge"]

p = argparse.ArgumentParser()
p.add_argument("--sizes", nargs="*", default=DEFAULT_SIZES)
p.add_argument("--models", nargs="*",
               default=["gde", "gru", "lstm", "pos_gru", "pos_lstm"])
args = p.parse_args()


def fmt(v):
    return f"{v:.4f}" if isinstance(v, (int, float)) else "—"


rows = []
for size in args.sizes:
    table = {}
    bj = RUNS / f"baselines_{size}" / "results.json"
    if bj.exists():
        table.update(json.loads(bj.read_text()))
    gj = RUNS / f"gde_{size}_ref_h4" / "result.json"
    if gj.exists():
        g = json.loads(gj.read_text())
        table["gde"] = {
            "best_val_mse": min(g["history"]["val_loss"]),
            **g["metrics"],
        }
    for model in args.models:
        r = table.get(model)
        if not r:
            continue
        rows.append((size, model, r.get("best_val_mse"),
                     r.get("mean_error"), r.get("success_rate@1.0")))

if not rows:
    sys.exit("no results found under runs/")

print("| size | model | val MSE | mean err (cells) | success@1.0 |")
print("|---|---|---|---|---|")
for size, model, mse, err, s1 in rows:
    print(f"| {size} | {model} | {fmt(mse)} | {fmt(err)} | {fmt(s1)} |")
