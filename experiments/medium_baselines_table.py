"""GDE-vs-baselines comparison on the medium-19-9 dataset (VERDICT item 10;
reference train_baselines.py:338-531 implies exactly this table).

Trains GRU / LSTM / PositionOnly-GRU / PositionOnly-LSTM on the same data
as the reference-scale GDE run, evaluates all with the shared metric suite,
and writes runs/baselines_medium/table.md. GDE numbers are read from
runs/gde_medium_ref/result.json if present (run medium_gde_ref_scale.py
first).
"""
import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


DATA = pathlib.Path("/root/repo/datasets")  # default; --data_dir overrides

p = argparse.ArgumentParser()
p.add_argument("--data_dir", default="/root/repo/datasets",
               help="dataset .h5 directory (smokes point this at "
                    "the committed tests/fixtures/datasets)")
p.add_argument("--epochs", type=int, default=30,
               help="baselines plateau far earlier than GDE's 200 (simple "
               "recurrent regressors; curves land in the result json)")
p.add_argument("--models", nargs="*",
               default=["gru", "lstm", "pos_gru", "pos_lstm"])
p.add_argument("--max_episodes", type=int, default=None)
p.add_argument("--env", default="tarware-medium-19agvs-9pickers-partialobs-v1")
p.add_argument("--out_dir", default=None,
               help="default: runs/baselines_<env-size-token>")
p.add_argument("--gde_result",
               default="/root/repo/runs/gde_medium_ref/result.json")
p.add_argument("--hidden_dim", type=int, default=128)
p.add_argument("--save_params", action="store_true",
               help="pickle each model's best params into the out dir "
               "(needed by baselines_multistep.py)")
p.add_argument("--cpu", action="store_true",
               help="force the CPU backend (smoke tests)")
args = p.parse_args()
DATA = pathlib.Path(args.data_dir)
if args.cpu:
    # Must run BEFORE importing swarm_ode_tpu: env/step.py creates jnp
    # constants at import, which initializes the default (axon) backend.
    import jax

    jax.config.update("jax_platforms", "cpu")

from swarm_ode_tpu import analysis  # noqa: E402
from swarm_ode_tpu.data.dataset import TrajectoryDataset  # noqa: E402
from swarm_ode_tpu.train.train_baselines import (  # noqa: E402
    BaselineTrainConfig,
    train_baseline,
)

ENV = args.env
SEEDS = [0, 1000, 2000, 3000, 4000]
OUT = pathlib.Path(args.out_dir) if args.out_dir else pathlib.Path(
    "/root/repo/runs/baselines_" + ENV.split("-")[1]
)
GDE_RESULT = pathlib.Path(args.gde_result)

# NOTE: subprocess dispatch happens BEFORE the dataset load — the parent
# never needs the windows itself (loading 499k reference-scale windows
# costs ~10 min of single-core time per process).
if len(args.models) > 1:
    # One subprocess per model: at reference scale each model device-puts
    # the ~6 GB episode tensor, and the previous model's copy is not
    # reliably released in-process (the large run OOMed on model #2 with
    # RESOURCE_EXHAUSTED) — process exit is the only guaranteed free.
    import subprocess

    for name in args.models:
        cmd = [sys.executable, __file__, "--models", name,
               "--epochs", str(args.epochs),
               "--env", ENV, "--out_dir", str(OUT),
               "--data_dir", str(DATA),
               "--gde_result", args.gde_result,
               "--hidden_dim", str(args.hidden_dim)]
        if args.max_episodes is not None:
            cmd += ["--max_episodes", str(args.max_episodes)]
        if args.save_params:
            cmd.append("--save_params")
        if args.cpu:
            cmd.append("--cpu")
        r = subprocess.run(cmd)
        if r.returncode != 0:
            print(f"[{name}] FAILED (exit {r.returncode}); continuing",
                  flush=True)
    sys.exit(0)

files = [str(DATA / f"warehouse_data_{ENV}_seed{s}.h5") for s in SEEDS]
files = [f for f in files if pathlib.Path(f).exists()]
ds = TrajectoryDataset.from_h5(files, seq_len=5,
                               max_episodes=args.max_episodes)
print(f"windows: {len(ds)} from {len(files)} files", flush=True)
OUT.mkdir(parents=True, exist_ok=True)

eval_idx = range(0, len(ds), max(1, len(ds) // 4000))
# Merge into any existing results so a partial retrain (--models subset)
# keeps the other models' committed rows.
rows = {}
if (OUT / "results.json").exists():
    rows = json.loads((OUT / "results.json").read_text())
    rows.pop("gde", None)  # re-read fresh below
for name in args.models:
    cfg = BaselineTrainConfig(
        model=name, num_epochs=args.epochs, hidden_dim=args.hidden_dim,
        device_dtype="uint8",
    )
    t0 = time.time()
    out = train_baseline(ds, cfg, verbose=True)
    if args.save_params:
        import pickle

        import jax as _jax

        with open(OUT / f"{name}_params.pkl", "wb") as fh:
            pickle.dump(_jax.device_get(out["params"]), fh)
    m = analysis.evaluate_baseline(
        out["model"], out["params"], ds,
        position_only=name.startswith("pos_"), indices=eval_idx,
    )
    rows[name] = {
        "best_val_mse": float(out["best_val_loss"]),
        "epochs": args.epochs,
        "wall_min": (time.time() - t0) / 60,
        "history": {k: [float(x) for x in v]
                    for k, v in out["history"].items()},
        **{k: float(v) for k, v in m.items()},
    }
    (OUT / "results.json").write_text(json.dumps(rows, indent=1))
    print(f"[{name}] done: val {rows[name]['best_val_mse']:.4f}", flush=True)

if GDE_RESULT.exists():
    g = json.loads(GDE_RESULT.read_text())
    rows["gde"] = {"best_val_mse": min(g["history"]["val_loss"]),
                   "epochs": g["epochs"], **g["metrics"]}

COLS = ["best_val_mse", "mean_error",
        "success_rate@0.5", "success_rate@1.0",
        "success_rate@1.5", "success_rate@2.0"]
lines = ["| model | " + " | ".join(COLS) + " |",
         "|" + "---|" * (len(COLS) + 1)]
for name, r in sorted(rows.items()):
    lines.append(
        "| " + name + " | "
        + " | ".join(f"{r.get(c, float('nan')):.4f}" for c in COLS) + " |"
    )
table = "\n".join(lines)
(OUT / "table.md").write_text(table + "\n")
print(table)
