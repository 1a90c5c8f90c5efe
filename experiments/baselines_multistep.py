"""Multi-step baselines for the trajectory-horizon table (VERDICT r2 item 2).

Scores the discrete baselines at horizons t = +1..+H on the SAME eval slice
as experiments/gde_multistep.py (seed4000, every len//3000-th valid window):

- pos_lstm / pos_gru: genuine autoregressive rollout — the predicted
  position is fed back as the newest frame of the sliding window. This is
  the only honest multi-step mode for them (their input is positions).
- lstm (full-obs): teacher-forced — predicts t+h from the TRUE observation
  window ending at t+h-1, i.e. it peeks at future observations. This is
  how the reference's result_analysis.ipynb multi_step cell scored
  multi-step and is an upper bound, labeled as such in RESULTS.md.

Requires pickled params from medium_baselines_table.py --save_params.
"""
import argparse
import json
import pathlib
import pickle
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--data_dir", default="/root/repo/datasets",
               help="dataset .h5 directory (smokes point this at "
                    "the committed tests/fixtures/datasets)")
ap.add_argument("--params_dir", default="/root/repo/runs/baselines_medium")
ap.add_argument("--env",
                default="tarware-medium-19agvs-9pickers-partialobs-v1")
ap.add_argument("--horizon", type=int, default=4)
ap.add_argument("--batch", type=int, default=64)
ap.add_argument("--max_episodes", type=int, default=40)
ap.add_argument("--max_batches", type=int, default=0, help="0 = all")
ap.add_argument("--hidden_dim", type=int, default=128)
ap.add_argument("--seed_file", type=int, default=4000)
ap.add_argument("--cpu", action="store_true",
                help="force the CPU backend (smoke tests)")
args = ap.parse_args()
DATA = pathlib.Path(args.data_dir)
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

from swarm_ode_tpu.data.dataset import TrajectoryDataset  # noqa: E402
from swarm_ode_tpu.train.train_baselines import MODEL_FACTORIES  # noqa: E402

# DATA set from --data_dir above
PDIR = pathlib.Path(args.params_dir)
OUT = PDIR / "multistep.json"
H = args.horizon
B = args.batch

ds = TrajectoryDataset.from_h5(
    [str(DATA / f"warehouse_data_{args.env}_seed{args.seed_file}.h5")],
    seq_len=5, max_episodes=args.max_episodes,
)
print(f"windows: {len(ds)}", flush=True)

idx = np.asarray(ds._index)
T = ds.episodes[0].shape[0]
valid = np.nonzero(idx[:, 1] + H < T - 1)[0][:: max(1, len(idx) // 3000)]
# Restrict to full windows (count == seq_len) so the autoregressive slide
# is well-defined; drops only the first seq_len-1 windows of each episode.
valid = valid[idx[valid, 1] >= ds.seq_len - 1]
if args.max_batches:
    valid = valid[: args.max_batches * B]
print(f"eval windows: {len(valid)}", flush=True)

models = {}
for name in ("pos_lstm", "pos_gru", "lstm"):
    pkl = PDIR / f"{name}_params.pkl"
    if pkl.exists():
        with open(pkl, "rb") as fh:
            models[name] = (
                MODEL_FACTORIES[name](ds, args.hidden_dim),
                pickle.load(fh),
            )
    else:
        print(f"[skip] {pkl} missing", flush=True)


def rollout_fn(model, params):
    @jax.jit
    def roll(pos_w):  # (B, T, N, 2) full windows -> (H, B, N, 2)
        def body(w, _):
            pred = model.apply(params, w)  # (B, N, 2)
            w = jnp.concatenate([w[:, 1:], pred[:, None]], axis=1)
            return w, pred

        _, preds = jax.lax.scan(body, pos_w, None, length=H)
        return preds

    return roll


def teacher_forced_fn(model, params):
    @jax.jit
    def pred1(obs_w):  # (B, T, N, obs_dim) -> (B, N, 2)
        return model.apply(params, obs_w)

    return pred1


fns = {
    name: (rollout_fn(*mp) if name.startswith("pos_")
           else teacher_forced_fn(*mp))
    for name, mp in models.items()
}

errs = {name: [[] for _ in range(H)] for name in models}
errs["persistence"] = [[] for _ in range(H)]
for i in range(0, len(valid) - B + 1, B):
    sel = valid[i : i + B]
    b = ds.batch(sel)
    pos_w = jnp.asarray(b["pos"])
    last_pos = np.stack(
        [np.asarray(ds._positions[idx[j, 0]][idx[j, 1]]) for j in sel]
    )
    true = {
        h: np.stack(
            [np.asarray(ds._positions[idx[j, 0]][idx[j, 1] + h]) for j in sel]
        )
        for h in range(1, H + 1)
    }
    for h in range(1, H + 1):
        errs["persistence"][h - 1].append(
            np.linalg.norm(last_pos - true[h], axis=-1).mean()
        )
    for name, f in fns.items():
        if name.startswith("pos_"):
            preds = np.asarray(f(pos_w))
            for h in range(1, H + 1):
                errs[name][h - 1].append(
                    np.linalg.norm(preds[h - 1] - true[h], axis=-1).mean()
                )
        else:  # teacher-forced full-obs window ending at t+h-1
            for h in range(1, H + 1):
                bh = ds.batch(sel + (h - 1))
                pred = np.asarray(f(jnp.asarray(bh["obs"])))
                errs[name][h - 1].append(
                    np.linalg.norm(pred - true[h], axis=-1).mean()
                )

rows = {}
for h in range(1, H + 1):
    rows[f"h{h}"] = {
        f"{name}_mean_error": float(np.mean(e[h - 1]))
        for name, e in errs.items()
    }
    print(
        f"horizon +{h}: "
        + "  ".join(f"{k}={v:.3f}" for k, v in rows[f"h{h}"].items()),
        flush=True,
    )
OUT.write_text(json.dumps(rows, indent=1))
print("saved", OUT)
