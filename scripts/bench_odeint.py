"""Secondary benchmark: GDE odeint throughput, TPU (jax) vs CPU (torch).

North-star metric 2 (BASELINE.json): >= 50x CPU-reference odeint
throughput at matched tolerance. torchdiffeq/PyG are not in this image, so
the CPU reference is a plain-torch implementation of the identical
3-layer-SAGE euler odeint (validated to 1e-5 in tests/test_torch_parity.py).

Prints one JSON line with both throughputs and the speedup.
"""
import json
import sys
import time
from argparse import ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

p = ArgumentParser()
p.add_argument("--batch", type=int, default=1024)
p.add_argument("--nodes", type=int, default=140)  # 5-frame window x 28 agents
p.add_argument("--dim", type=int, default=435)  # medium partial obs dim
p.add_argument("--hidden", type=int, default=64)
p.add_argument("--steps", type=int, default=8)  # euler substeps
p.add_argument("--repeats", type=int, default=3)
p.add_argument("--torch_batch", type=int, default=8)


def main():
    args = p.parse_args()
    rng = np.random.RandomState(0)
    adj = (rng.rand(args.nodes, args.nodes) < 0.1).astype(np.float32)
    x0 = rng.randn(args.batch, args.nodes, args.dim).astype(np.float32)
    W = {
        "w1l": rng.randn(args.dim, args.hidden).astype(np.float32) * 0.1,
        "b1": rng.randn(args.hidden).astype(np.float32) * 0.1,
        "w1r": rng.randn(args.dim, args.hidden).astype(np.float32) * 0.1,
        "w2l": rng.randn(args.hidden, args.hidden).astype(np.float32) * 0.1,
        "b2": rng.randn(args.hidden).astype(np.float32) * 0.1,
        "w2r": rng.randn(args.hidden, args.hidden).astype(np.float32) * 0.1,
        "w3l": rng.randn(args.hidden, args.dim).astype(np.float32) * 0.1,
        "b3": rng.randn(args.dim).astype(np.float32) * 0.1,
        "w3r": rng.randn(args.hidden, args.dim).astype(np.float32) * 0.1,
    }

    # ---------------- jax / TPU ----------------
    import jax
    import jax.numpy as jnp

    from swarm_ode_tpu.ops.odeint import odeint

    adj_j = jnp.asarray(adj)
    deg = jnp.maximum(adj_j.sum(0), 1.0)[:, None]
    Wj = {k: jnp.asarray(v) for k, v in W.items()}

    def sage(y, wl, b, wr):
        return (adj_j.T @ y) / deg @ Wj[wl] + Wj[b] + y @ Wj[wr]

    def field(t, y):
        h = jax.nn.relu(sage(y, "w1l", "b1", "w1r"))
        h = jax.nn.relu(sage(h, "w2l", "b2", "w2r"))
        return sage(h, "w3l", "b3", "w3r")

    t_grid = jnp.array([0.0, 1.0], jnp.float32)

    @jax.jit
    def run(x):
        f = jax.vmap(lambda y: odeint(field, y, t_grid, method="euler",
                                      substeps=args.steps)[-1])
        return f(x)

    xj = jnp.asarray(x0)
    jax.block_until_ready(run(xj))
    best_jax = 0.0
    for _ in range(args.repeats):
        t0 = time.time()
        jax.block_until_ready(run(xj))
        dt = time.time() - t0
        best_jax = max(best_jax, args.batch * args.steps / dt)

    # ---------------- torch / CPU --------------
    import torch

    adj_t = torch.tensor(adj)
    deg_t = adj_t.sum(0).clamp(min=1.0)[:, None]
    Wt = {k: torch.tensor(v) for k, v in W.items()}

    def sage_t(y, wl, b, wr):
        return (adj_t.T @ y) / deg_t @ Wt[wl] + Wt[b] + y @ Wt[wr]

    def field_t(y):
        h = sage_t(y, "w1l", "b1", "w1r").relu()
        h = sage_t(h, "w2l", "b2", "w2r").relu()
        return sage_t(h, "w3l", "b3", "w3r")

    xb = torch.tensor(x0[: args.torch_batch])
    with torch.no_grad():
        # warmup
        y = xb.clone()
        y = y + (1.0 / args.steps) * field_t(y)
        best_torch = 0.0
        for _ in range(args.repeats):
            t0 = time.time()
            y = xb.clone()
            h = 1.0 / args.steps
            for _ in range(args.steps):
                y = y + h * field_t(y)
            dt = time.time() - t0
            best_torch = max(best_torch, args.torch_batch * args.steps / dt)

    print(
        json.dumps(
            {
                "metric": "gde_odeint_graph_steps_per_sec",
                "value": round(best_jax, 1),
                "unit": "graph-euler-steps/s",
                "torch_cpu_value": round(best_torch, 1),
                "vs_baseline": round(best_jax / best_torch, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
