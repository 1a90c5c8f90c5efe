import sys, pathlib, time, glob
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from swarm_ode_tpu.config import EnvConfig
from swarm_ode_tpu.env.layout import build_layout
from swarm_ode_tpu.env.state import make_params
from swarm_ode_tpu.env import step as step_mod
from swarm_ode_tpu.policies import heuristic as H

cfg = EnvConfig.from_env_id("tarware-medium-19agvs-9pickers-partialobs-v1")
lay = build_layout(cfg); params = make_params(cfg, lay)
policy = H.make_policy(params, lay)

def mk(B, T):
    def one(key):
        es = step_mod.reset(params, key)
        h = H.init_state(params)
        def body(carry, _):
            es, hs = carry
            a, hs = policy(params, es, hs)
            es, rew, done, info = step_mod.step(params, es, a)
            return (es, hs), rew.sum()
        (es, hs), out = jax.lax.scan(body, (es, h), None, length=T)
        return out.sum()
    return jax.jit(jax.vmap(one))

for B in (1024, 2048):
    run = mk(B, 100)
    ks = jax.random.split(jax.random.PRNGKey(0), B)
    out = run(ks); jax.block_until_ready(out)
    t0=time.time(); out = run(jax.random.split(jax.random.PRNGKey(1), B)); jax.block_until_ready(out)
    print(f"B={B}: {B*100/(time.time()-t0):,.0f} steps/s", flush=True)

B = 1024
run = mk(B, 50)
ks = jax.random.split(jax.random.PRNGKey(0), B)
out = run(ks); jax.block_until_ready(out)
jax.profiler.start_trace("/tmp/jaxtrace3")
out = run(ks); jax.block_until_ready(out)
jax.profiler.stop_trace()
files = glob.glob("/tmp/jaxtrace3/**/*.xplane.pb", recursive=True)
from jax.profiler import ProfileData
pd = ProfileData.from_serialized_xspace(open(files[-1], "rb").read())
ops = {}
for plane in pd.planes:
    for line in plane.lines:
        for ev in line.events:
            if ev.name.startswith("jit_"): continue
            ops[ev.name] = ops.get(ev.name, 0) + ev.duration_ns
top = sorted(ops.items(), key=lambda kv: -kv[1])[:20]
for name, dur in top:
    print(f"{dur/1e6:9.2f} ms  {name[:110]}", flush=True)
