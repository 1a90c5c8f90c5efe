import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from swarm_ode_tpu.config import EnvConfig
from swarm_ode_tpu.env.layout import build_layout
from swarm_ode_tpu.env.state import make_params
from swarm_ode_tpu.env import step as step_mod
from swarm_ode_tpu.policies import heuristic as H

ENVS = [
    # Best-known batch per size plus the next doubling where unprobed
    # (medium-19 knee measured at 2048, extralarge at 1024 — RESULTS.md
    # "Saturation probes").
    ("tarware-tiny-3agvs-2pickers-partialobs-v1", 2048),
    ("tarware-small-6agvs-3pickers-partialobs-v1", 2048),
    ("tarware-medium-10agvs-5pickers-partialobs-v1", 1024),
    ("tarware-medium-10agvs-5pickers-partialobs-v1", 2048),
    ("tarware-medium-19agvs-9pickers-partialobs-v1", 2048),
    ("tarware-large-15agvs-8pickers-partialobs-v1", 1024),
    ("tarware-large-15agvs-8pickers-partialobs-v1", 2048),
    ("tarware-extralarge-19agvs-9pickers-partialobs-v1", 1024),
]
for env_id, B in ENVS:
    cfg = EnvConfig.from_env_id(env_id)
    lay = build_layout(cfg); params = make_params(cfg, lay)
    policy = H.make_policy(params, lay)
    def one(key):
        es = step_mod.reset(params, key)
        h = H.init_state(params)
        def body(carry, _):
            es, hs = carry
            a, hs = policy(params, es, hs)
            es, rew, done, info = step_mod.step(params, es, a)
            return (es, hs), (info["shelf_deliveries"], info["clashes"])
        (es, hs), out = jax.lax.scan(body, (es, h), None, length=100)
        return tuple(o.sum() for o in out)
    run = jax.jit(jax.vmap(one))
    ks = jax.random.split(jax.random.PRNGKey(0), B)
    out = run(ks); jax.block_until_ready(out)
    t0=time.time(); out = run(jax.random.split(jax.random.PRNGKey(1), B)); jax.block_until_ready(out)
    dt=time.time()-t0
    d, c = [np.asarray(o) for o in out]
    print(f"{env_id}: B={B} {B*100/dt:,.0f} steps/s | deliveries/ep(x5) {d.mean()*5:.1f} clashes {c.mean()*5:.1f}", flush=True)
