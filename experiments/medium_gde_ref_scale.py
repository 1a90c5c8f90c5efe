"""Reference-scale GDE training: 5 seed files of medium-19-9, 200 epochs
(reference scripts/train_gde.py:443-535 recipe).

The full 1000-episode dataset stays device-resident in uint8 (~6.1 GB of
the chip's 16 GB HBM; obs are integers in [0, 24], validated before
upload — bf16 at 12.2 GB left too little compile headroom and OOMed),
windows are cut on device, and the train step runs the structured batched
path — zero host transfers inside the epoch loop.

Usage: python experiments/medium_gde_ref_scale.py [--epochs N] [--probe]
  --probe: measure ms/batch over 200 steps and exit (for step-time checks).
"""
import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

SEEDS = [0, 1000, 2000, 3000, 4000]
DATA = pathlib.Path("/root/repo/datasets")  # default; --data_dir overrides

p = argparse.ArgumentParser()
p.add_argument("--data_dir", default="/root/repo/datasets",
               help="dataset .h5 directory (smokes point this at "
                    "the committed tests/fixtures/datasets)")
p.add_argument("--epochs", type=int, default=200)
p.add_argument("--batch_size", type=int, default=32)
p.add_argument("--max_episodes", type=int, default=None)
p.add_argument("--probe", action="store_true")
p.add_argument("--horizon", type=int, default=1,
               help="supervise the ODE at t=1..horizon (1 = ref recipe)")
p.add_argument("--horizon_weights", type=float, nargs="*", default=None,
               help="per-horizon loss weights (length == horizon); "
                    "e.g. '3 1 1 1' up-weights t=+1 so one model wins "
                    "both the 1-step and rollout regimes")
p.add_argument("--hidden_dim", type=int, default=64)
p.add_argument("--scan_chunk", type=int, default=0,
               help="max batches per epoch-scan dispatch (0 = whole epoch; "
                    "use ~2000 on large/h4 runs: the axon tunnel kills "
                    "dispatches running over ~80s — see NOTES.md)")
p.add_argument("--checkpoint_every", type=int, default=10,
               help="epochs between checkpoints (1-2 on flaky TPU hosts: "
                    "the axon worker can crash mid-run and the trainer "
                    "auto-resumes from the latest saved epoch)")
p.add_argument("--device_shard_episodes", type=int, default=0,
               help="rotate at most this many episodes through device "
                    "memory at a time (0 = whole dataset resident; "
                    "needed on extralarge, whose uint8 obs tensor "
                    "exceeds the 16 GB HBM)")
p.add_argument("--tag", default="", help="suffix for the output dir")
p.add_argument("--out_dir", default=None,
               help="output dir override (for smoke tests)")
p.add_argument("--cpu", action="store_true",
               help="force the CPU backend (smoke tests)")
p.add_argument("--env", default="tarware-medium-19agvs-9pickers-partialobs-v1")
args = p.parse_args()
DATA = pathlib.Path(args.data_dir)
if args.cpu:
    # Must run BEFORE importing swarm_ode_tpu: env/step.py creates jnp
    # constants at import, which initializes the default (axon) backend.
    import jax

    jax.config.update("jax_platforms", "cpu")

from swarm_ode_tpu.data.dataset import TrajectoryDataset  # noqa: E402
from swarm_ode_tpu.train.train_gde import GDETrainConfig, train_gde  # noqa: E402
from swarm_ode_tpu import analysis  # noqa: E402

ENV = args.env
OUT = pathlib.Path("/root/repo/runs/gde_" + ENV.split("-")[1] + "_ref")
if args.tag:
    OUT = pathlib.Path(str(OUT) + "_" + args.tag)
if args.out_dir:
    OUT = pathlib.Path(args.out_dir)

files = [str(DATA / f"warehouse_data_{ENV}_seed{s}.h5") for s in SEEDS]
files = [f for f in files if pathlib.Path(f).exists()]
print(f"{len(files)} dataset files", flush=True)
ds = TrajectoryDataset.from_h5(files, seq_len=5, max_episodes=args.max_episodes)
print(f"windows: {len(ds)} obs_dim: {ds.obs_dim} agents: "
      f"{ds.num_agvs}+{ds.num_pickers}", flush=True)

if args.probe:
    # Step-time probe: tiny subset resident, time the jitted train step.
    import jax
    import jax.numpy as jnp
    from swarm_ode_tpu.graphs.temporal import (
        TemporalWindow, build_temporal_graph,
    )
    from swarm_ode_tpu.models.gde import GraphODE
    from swarm_ode_tpu.train.train_gde import _batch_loss
    import optax

    model = GraphODE(node_dim=ds.obs_dim, num_agvs=ds.num_agvs,
                     num_pickers=ds.num_pickers, hidden_dim=args.hidden_dim)
    sample = ds.batch(list(range(args.batch_size)))
    w0 = TemporalWindow(obs=jnp.asarray(sample["obs"][0]),
                        count=jnp.int32(sample["count"][0]))
    g0 = build_temporal_graph(w0, ds.num_agvs, 5.0)
    params = model.init(jax.random.PRNGKey(0), g0, jnp.array([0.0, 1.0]))
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
    opt_state = tx.init(params)
    loss_fn = _batch_loss(model, ds.num_agvs, 5.0)
    batch = {
        "obs": jnp.asarray(sample["obs"]),
        "count": jnp.asarray(sample["count"], jnp.int32),
        "next_pos": jnp.asarray(sample["next_pos"]),
        "weight": jnp.ones((args.batch_size,), jnp.float32),
    }

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state, loss = step(params, opt_state, batch)
    jax.block_until_ready(loss)
    t0 = time.time()
    for _ in range(200):
        params, opt_state, loss = step(params, opt_state, batch)
    jax.block_until_ready(loss)
    ms = (time.time() - t0) / 200 * 1e3
    print(f"train step: {ms:.2f} ms/batch (B={args.batch_size})")
    sys.exit(0)

OUT.mkdir(parents=True, exist_ok=True)
cfg = GDETrainConfig(
    num_epochs=args.epochs,
    batch_size=args.batch_size,
    hidden_dim=args.hidden_dim,
    device_dtype="uint8",
    device_shard_episodes=args.device_shard_episodes,
    horizon=args.horizon,
    horizon_weights=(tuple(args.horizon_weights)
                     if args.horizon_weights else None),
    epoch_scan_chunk=args.scan_chunk,
    checkpoint_dir=str(OUT / "ckpt"),
    checkpoint_every=args.checkpoint_every,
)
t0 = time.time()
out = train_gde(ds, cfg)
wall = time.time() - t0
print(f"trained {args.epochs} epochs in {wall/60:.1f} min; "
      f"best val {out['best_val_loss']:.6f}", flush=True)

m = analysis.evaluate_gde(out["model"], out["params"], ds,
                          indices=range(0, len(ds), max(1, len(ds) // 4000)))
metrics = {k: round(float(v), 4) for k, v in m.items()}
print(json.dumps(metrics, indent=1), flush=True)
hist = {k: [float(x) for x in v] for k, v in out["history"].items()}
(OUT / "result.json").write_text(json.dumps(
    {"metrics": metrics, "history": hist, "wall_min": wall / 60,
     "epochs": args.epochs, "windows": len(ds)}, indent=1))
print("saved", OUT / "result.json")
