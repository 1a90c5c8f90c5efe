"""Export a trained GDE checkpoint as a hermetic serving blob.

Counterpart of export_policy.py for the flagship trajectory model
(serving.make_gde_fn / export_gde): window observations in, predicted
(horizon+1, N, 2) trajectory out, no Python model code at deploy time.

Usage:
  python experiments/export_gde.py --ckpt runs/gde_medium_ref_h4/ckpt \
      --env tarware-medium-19agvs-9pickers-partialobs-v1 --horizon 4
"""
import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--ckpt", required=True, help="CheckpointManager dir")
p.add_argument("--env",
               default="tarware-medium-19agvs-9pickers-partialobs-v1")
p.add_argument("--hidden_dim", type=int, default=64)
p.add_argument("--horizon", type=int, default=4)
p.add_argument("--window", type=int, default=5)
p.add_argument("--out", default=None,
               help="output path (default: <ckpt parent>/gde.stablehlo)")
p.add_argument("--cpu", action="store_true")
args = p.parse_args()
if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from swarm_ode_tpu.config import EnvConfig  # noqa: E402
from swarm_ode_tpu.env.layout import build_layout  # noqa: E402
from swarm_ode_tpu.env.observations import obs_lengths  # noqa: E402
from swarm_ode_tpu.env.state import make_params  # noqa: E402
from swarm_ode_tpu.graphs.temporal import (  # noqa: E402
    TemporalWindow,
    build_temporal_graph,
)
from swarm_ode_tpu.models.gde import GraphODE  # noqa: E402
from swarm_ode_tpu.serving import export_gde, load_gde, make_gde_fn  # noqa: E402
from swarm_ode_tpu.utils.checkpoint import CheckpointManager  # noqa: E402

cfg = EnvConfig.from_env_id(args.env)
env_params = make_params(cfg, build_layout(cfg))
N = int(env_params.num_agvs + env_params.num_pickers)
D = int(max(obs_lengths(env_params)))

model = GraphODE(node_dim=D, num_agvs=int(env_params.num_agvs),
                 num_pickers=int(env_params.num_pickers),
                 hidden_dim=args.hidden_dim)
w0 = TemporalWindow(obs=jnp.zeros((args.window, N, D), jnp.float32),
                    count=jnp.int32(args.window))
params0 = model.init(jax.random.PRNGKey(0),
                     build_temporal_graph(w0, model.num_agvs, 5.0),
                     jnp.array([0.0, 1.0]))
ck = CheckpointManager(args.ckpt)
restored = ck.restore({"params": jax.tree.map(np.asarray, params0)},
                      partial=True)
if restored is None:
    sys.exit(f"no checkpoint found under {args.ckpt}")
params = restored["params"]
print(f"restored step {ck.latest_step()}", flush=True)

fn = make_gde_fn(model, params, horizon=args.horizon)
blob = export_gde(fn, window=args.window, num_agents=N, obs_dim=D)

out = pathlib.Path(
    args.out or str(pathlib.Path(args.ckpt).parent / "gde.stablehlo")
)
out.write_bytes(blob)
meta = {
    "ckpt": args.ckpt, "env": args.env, "window": args.window,
    "num_agents": N, "obs_dim": D, "horizon": args.horizon,
    "hidden_dim": args.hidden_dim, "bytes": len(blob),
    "ckpt_step": int(ck.latest_step()),
}
pathlib.Path(str(out) + ".json").write_text(json.dumps(meta, indent=1))

# Round-trip sanity: served == direct on a random window.
rng = np.random.RandomState(0)
obs = rng.randint(0, 9, (args.window, N, D)).astype(np.float32)
want = np.asarray(fn(jnp.asarray(obs), jnp.int32(args.window)))
got = np.asarray(load_gde(blob)(obs, args.window))
np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
print(f"exported {out} ({len(blob)} bytes), round-trip exact", flush=True)
