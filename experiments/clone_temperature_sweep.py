"""Temperature sweep: cloned dispatcher vs the hand-crafted heuristic.

Identical protocol for every row (8 lockstep envs x 500 steps x 4 env
seeds): the FIFO dispatcher, and DAgger clone checkpoints rolled with
claim-masked sequential sampling at softmax(logits/T)
(rl/coordination.coordinated_sample). The argmax brittleness finding and
the resulting table live in RESULTS.md; runs/clone_temperature_sweep.json
holds the raw rates.
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax; jax.config.update("jax_platforms","cpu")
import jax.numpy as jnp, numpy as np, json
from swarm_ode_tpu.config import EnvConfig
from swarm_ode_tpu.env import observations, step as step_mod
from swarm_ode_tpu.env.layout import build_layout
from swarm_ode_tpu.env.state import make_params
from swarm_ode_tpu.graphs.hetero import hetero_graph_from_obs
from swarm_ode_tpu.policies import heuristic as H
from swarm_ode_tpu.rl import coordination
from swarm_ode_tpu.train.run_rl import RLRunConfig, _make_network
from swarm_ode_tpu.utils.checkpoint import CheckpointManager
from swarm_ode_tpu.utils.metrics import pick_rate

env_id="tarware-medium-19agvs-9pickers-partialobs-v1"
cfg=EnvConfig.from_env_id(env_id); lay=build_layout(cfg); params=make_params(cfg,lay)
net=_make_network(RLRunConfig(net="gnn",hidden_dim=64),params.num_actions,params.num_agvs,params.num_pickers,coord_scale=1.0/max(params.grid_h,params.grid_w))
key=jax.random.PRNGKey(0)
es0=step_mod.reset(params,key)
tmpl=net.init(key,hetero_graph_from_obs(params,observations.observe(params,es0)))
rack_start=1+params.num_goals
E=8; steps=500
SEEDS=(300,301,302,303)

def load(ck):
    mgr=CheckpointManager(ck)
    return jax.tree.map(jnp.asarray, mgr.restore({"q_params":jax.tree.map(np.asarray,tmpl)})["q_params"])

def clone_run(p, temp):
    def act(o,e,k):
        out=net.apply(p,hetero_graph_from_obs(params,o))
        logits=jnp.concatenate([out["agv_q_values"],out["picker_q_values"]],0)
        masks=observations.compute_valid_action_masks(params,e)
        return coordination.coordinated_sample(logits/temp,masks,params.num_agvs,rack_start,k,active=~e.agent_busy)
    @jax.jit
    def run(key):
        kr,key=jax.random.split(key)
        es=jax.vmap(step_mod.reset,in_axes=(None,0))(params,jax.random.split(kr,E))
        obs=jax.vmap(lambda e:observations.observe(params,e))(es)
        def body(c,k):
            es,obs=c
            a=jax.vmap(act)(obs,es,jax.random.split(k,E))
            es2,_,_,info=jax.vmap(lambda e,ai:step_mod.step(params,e,ai))(es,a)
            return (es2,jax.vmap(lambda e:observations.observe(params,e))(es2)),(info["shelf_deliveries"].sum(),info["clashes"].sum())
        _,(d,c)=jax.lax.scan(body,(es,obs),jax.random.split(key,steps))
        return d.sum()/E, c.sum()/E
    return run

# Heuristic on the identical protocol.
policy=H.make_policy(params,lay)
@jax.jit
def heur_run(key):
    kr,key=jax.random.split(key)
    es=jax.vmap(step_mod.reset,in_axes=(None,0))(params,jax.random.split(kr,E))
    hs=jax.vmap(lambda _:H.init_state(params))(jnp.arange(E))
    def body(c,_):
        es,hs=c
        a,hs=jax.vmap(lambda e,h:policy(params,e,h))(es,hs)
        es2,_,_,info=jax.vmap(lambda e,ai:step_mod.step(params,e,ai))(es,a)
        return (es2,hs),(info["shelf_deliveries"].sum(),info["clashes"].sum())
    _,(d,c)=jax.lax.scan(body,(es,hs),None,length=steps)
    return d.sum()/E, c.sum()/E

out={}
rates=[]
for s in SEEDS:
    d,c=jax.tree.map(float,heur_run(jax.random.PRNGKey(s)))
    rates.append(pick_rate(d,steps))
out["heuristic"]={"rates":rates,"mean":sum(rates)/len(rates)}
print("heuristic", out["heuristic"], flush=True)

for name,ck in [("full_best","runs/dagger_medium_cpu/ckpt_best"),
                ("probe","runs/dagger_medium_cpu_probe/ckpt")]:
    p=load(ck)
    for T in (1.5,2.0,2.5):
        rates=[]
        run=clone_run(p,T)
        for s in SEEDS:
            d,c=jax.tree.map(float,run(jax.random.PRNGKey(s)))
            rates.append(pick_rate(d,steps))
        out[f"{name}_T{T}"]={"rates":rates,"mean":sum(rates)/len(rates)}
        print(name,T,out[f"{name}_T{T}"], flush=True)

json.dump(out, open("runs/clone_temperature_sweep.json","w"), indent=2)
