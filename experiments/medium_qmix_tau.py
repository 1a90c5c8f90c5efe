import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from swarm_ode_tpu.train import run_rl as R
from swarm_ode_tpu.rl.qmix import QMIXConfig
orig = R.QMIXAgent
class Patched(orig):
    def __init__(self, net, params, gs_dim, cfg):
        cfg = QMIXConfig(batch_size=cfg.batch_size, target_tau=0.005)
        super().__init__(net, params, gs_dim, cfg)
R.QMIXAgent = Patched
cfg = R.RLRunConfig(env_id="tarware-medium-19agvs-9pickers-partialobs-v1",
                    algo="qmix", net="gnode", num_envs=8, num_episodes=64,
                    hidden_dim=64, buffer_size=100_000, batch_size=64)
out = R.run_marl(cfg, verbose=False)
hist = out["history"]
print("losses:", [round(h["loss"],4) for h in hist])
print("pick rates:", [round(h["pick_rate"],1) for h in hist])
