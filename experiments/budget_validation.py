import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from swarm_ode_tpu.config import EnvConfig
from swarm_ode_tpu.env.layout import build_layout
from swarm_ode_tpu.env.state import make_params
from swarm_ode_tpu.env import step as step_mod
from swarm_ode_tpu.policies import heuristic as H

for budget in (0, 8):
    cfg = EnvConfig.from_env_id("tarware-medium-19agvs-9pickers-partialobs-v1",
                                replan_budget=budget)
    lay = build_layout(cfg); params = make_params(cfg, lay)
    policy = H.make_policy(params, lay)
    B = 1024
    def one(key):
        es = step_mod.reset(params, key)
        h = H.init_state(params)
        def body(carry, _):
            es, hs = carry
            a, hs = policy(params, es, hs)
            es, rew, done, info = step_mod.step(params, es, a)
            return (es, hs), (info["shelf_deliveries"], info["clashes"], info["stucks"], rew.sum())
        (es, hs), out = jax.lax.scan(body, (es, h), None, length=500)
        return tuple(o.sum() for o in out)
    run = jax.jit(jax.vmap(one))
    ks = jax.random.split(jax.random.PRNGKey(0), B)
    out = run(ks); jax.block_until_ready(out)
    t0=time.time(); out = run(jax.random.split(jax.random.PRNGKey(1), B)); jax.block_until_ready(out)
    dt=time.time()-t0
    d,c,s,r = [np.asarray(o) for o in out]
    print(f"budget={budget}: {B*500/dt:,.0f} steps/s | deliv {d.mean():.1f} "
          f"clash {c.mean():.1f} stuck {s.mean():.2f} return {r.mean():.1f}", flush=True)
