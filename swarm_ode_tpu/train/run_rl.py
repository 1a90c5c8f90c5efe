"""Online MARL training loops (reference scripts run_gnode.py:1328-1531,
gru.py:1035-1275, graph.py:632-701).

Structure parity per episode: reset -> build graph -> masked epsilon-greedy
act -> env step -> store transition -> learn every step once the buffer is
warm -> periodic target sync -> per-episode stat line.

TPU-native: the entire episode (env stepping, graph building, action
selection, replay writes, gradient updates) runs as ONE `lax.scan` on
device; the host sees one transfer per episode. The reference's Python
deque + per-sample loops become the on-device ring buffer (rl/replay.py)
and vmapped batch losses.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from swarm_ode_tpu.config import EnvConfig
from swarm_ode_tpu.env import observations, step as step_mod
from swarm_ode_tpu.env.layout import build_layout
from swarm_ode_tpu.env.state import make_params
from swarm_ode_tpu.graphs.hetero import hetero_graph_from_obs, split_observation
from swarm_ode_tpu.models.gnode import HeteroGraphODENetwork
from swarm_ode_tpu.models.hetero_gnn import HeteroGNNEncoder, HeteroGNNNetwork
from swarm_ode_tpu.rl import replay
from swarm_ode_tpu.rl.coma import COMAAgent, COMAConfig
from swarm_ode_tpu.rl.dqn import DQNConfig, IQLAgent
from swarm_ode_tpu.rl.qmix import QMIXAgent, QMIXConfig
from swarm_ode_tpu.utils.logging import MetricsLogger
from swarm_ode_tpu.utils.metrics import pick_rate


@dataclasses.dataclass
class RLRunConfig:
    env_id: str = "tarware-medium-19agvs-9pickers-partialobs-v1"
    algo: str = "qmix"  # iql | qmix | coma
    net: str = "gnode"  # gnode | gnn | gru
    num_envs: int = 1  # vectorized envs feeding the shared replay buffer
    num_episodes: int = 100
    hidden_dim: int = 64
    buffer_size: int = 20_000
    batch_size: int = 32
    learn_every: int = 1
    target_sync_episodes: int = 20  # IQL (reference gru.py target sync)
    buffer_clear_episodes: int = 0  # clear replay every N episodes
    # (reference clears every 200, gru.py:1258-1260); 0 = never
    # Team reward for QMIX/COMA: 'mean' keeps the value scale independent of
    # agent count (stable on medium); 'sum' is the reference's convention
    # (run_gnode.py team reward) but diverges at 28 agents with gamma=0.999.
    team_reward: str = "mean"
    # n-step TD targets (1 = the reference's single-step); chains are
    # sampled from the ring buffer (rl/replay.sample_nstep) and never cross
    # episode boundaries.
    n_step: int = 3
    # R2D2 h-transform value rescaling for QMIX targets (rl/qmix.py):
    # bounds TD magnitudes at gamma=0.999 over 500-step horizons — the
    # round-1 medium-scale drift fix.
    value_transform: bool = True
    # QMIX stabilizers (rl/qmix.py QMIXConfig for the semantics). The
    # reference ran gamma=0.999 with hard target sync and no clamping
    # (run_gnode.py:1328) and its loop never trained successfully; the
    # defaults here reproduce that recipe, the knobs make it converge.
    gamma: Optional[float] = None  # None = per-algo default
    td_clip: float = 0.0
    huber_delta: float = 0.0
    target_tau: float = 0.0
    epsilon_decay: Optional[float] = None  # None = per-algo default
    # Exploration floor. The reference holds QMIX at 0.1; with 28 agents a
    # 10% per-agent random-action rate keeps corridors perpetually
    # disrupted, so the trained-policy pick rate reads far below greedy.
    epsilon_min: Optional[float] = None  # None = per-algo default
    # Initial exploration rate (None = per-algo default, 1.0). Set low
    # (e.g. 0.1) when warm-starting from cloned parameters (init_q_from):
    # full random exploration would erase the demonstrated behavior from
    # the replay stream before TD learning can evaluate it.
    epsilon_start: Optional[float] = None
    # COMA is on-policy: its updates sample only the freshest episode
    # stride (replay.sample_recent) instead of the whole buffer, this many
    # minibatches per stride. The reference sampled the full deque
    # (gru.py:432-440) — with its single-episode memory that WAS
    # on-policy; a shared multi-episode ring is not.
    coma_updates: int = 8
    # COMA optimizer/entropy knobs (rl/coma.py COMAConfig semantics).
    coma_lr_actor: float = 1e-3
    coma_lr_critic: float = 1e-3
    coma_entropy: float = 0.01
    coma_entropy_decay: float = 1.0
    seed: int = 0
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 100
    # Periodic pure-greedy evaluation probe (epsilon=0, no learning, no
    # buffer writes): every `eval_every` episodes, roll `eval_episodes`
    # fresh envs with training=False and log eval_pick_rate/eval_return.
    # The reference's own eval convention is greedy rollouts
    # (run_heuristic.py:30-58 stat lines); all training-time pick rates
    # here include epsilon-exploration noise. 0 = off.
    eval_every: int = 0
    eval_episodes: int = 8
    # Evaluate with training-time action semantics instead of greedy:
    # COMA samples its policy (the distribution the return was earned
    # with), value-based agents keep epsilon-greedy at their restored
    # epsilon. Diagnoses argmax-degenerate stochastic policies (the
    # trained COMA checkpoint delivers 0 under argmax — RESULTS.md).
    eval_stochastic: bool = False
    # Resume the agent state (params/target/opt/epsilon) from a previous
    # run's checkpoint dir. The reference has no resume anywhere
    # (SURVEY.md §5 checkpoint row).
    resume_from: Optional[str] = None
    # Warm-start the Q-network from behavior-cloned parameters
    # (train/train_bc.py checkpoints {'q_params': ...}) — RL from
    # demonstrations. The BC net must match net/hidden_dim. Applied at
    # init, before resume_from; QMIX/IQL only.
    init_q_from: Optional[str] = None
    # Conflict-masked sequential action selection (rl/coordination.py):
    # idle agents claim rack targets in confidence order so no two
    # same-type agents double-book a shelf in one macro step — the
    # structural lever from the round-3 QMIX plateau analysis
    # (RESULTS.md). IQL/QMIX: behavior (+ QMIX TD-target argmax). COMA:
    # sequential sampling scored under its exact density
    # (rl/coordination.sequential_log_prob), keeping the on-policy
    # gradient unbiased.
    coordinated: bool = False


def _make_network(cfg: RLRunConfig, action_size: int, num_agvs: int = 0,
                  num_pickers: int = 0, coord_scale: float = 1.0):
    node_dims = {"agv": 7, "picker": 4, "location": 2}
    if cfg.net == "gnode":
        return HeteroGraphODENetwork(node_dims, action_size, cfg.hidden_dim,
                                     coord_scale=coord_scale)
    if cfg.net == "gnode_comm":
        # gnode + one inter-agent attention round before the Q heads
        # (models/gnode.py::CommRound) — the round-3 plateau analysis'
        # architectural lever (VERDICT item 8).
        return HeteroGraphODENetwork(node_dims, action_size, cfg.hidden_dim,
                                     coord_scale=coord_scale, comm=True)
    if cfg.net == "gnn":
        net = HeteroGNNNetwork(action_size=action_size,
                               hidden_dim=cfg.hidden_dim,
                               coord_scale=coord_scale)

        class _Wrap:  # align flax module to init/apply composite protocol
            def init(self, key, g):
                return net.init(key, g)

            def apply(self, p, g):
                return net.apply(p, g)

        return _Wrap()
    if cfg.net == "gru":
        from swarm_ode_tpu.models.gru import HeteroGraphGRUNetwork

        net = HeteroGraphGRUNetwork(
            action_size=action_size, hidden_dim=cfg.hidden_dim,
            coord_scale=coord_scale,
        )
        h0 = (jnp.zeros((num_agvs, cfg.hidden_dim)),
              jnp.zeros((num_pickers, cfg.hidden_dim)))

        class _WrapGRU:
            init_hidden = h0

            def init(self, key, g):
                return net.init(key, g, *h0)

            def apply(self, p, g, h_agv=None, h_pick=None):
                if h_agv is None:
                    h_agv, h_pick = h0
                return net.apply(p, g, h_agv, h_pick)

        return _WrapGRU()
    raise ValueError(cfg.net)


def _agent_params(astate):
    p = astate.params
    return p["q"] if isinstance(p, dict) and "q" in p else p


def _feats(params, obs):
    a, p, l = split_observation(params, obs)
    return {"agv": a, "picker": p, "loc": l}


def _global_state(feats, scale: float = 1.0):
    """Flat global state for the mixers/critics: all node features
    concatenated (dimension == the reference's global obs length). `scale`
    tames the raw coordinate magnitudes so the hypernetwork mixers stay
    numerically stable."""
    return (
        jnp.concatenate(
            [feats["agv"].reshape(-1), feats["picker"].reshape(-1),
             feats["loc"].reshape(-1)]
        )
        * scale
    )


def run_marl(cfg: RLRunConfig, logger: Optional[MetricsLogger] = None,
             verbose: bool = True) -> Dict:
    env_cfg = EnvConfig.from_env_id(cfg.env_id)
    lay = build_layout(env_cfg)
    params = make_params(env_cfg, lay)
    action_size = params.num_actions
    steps = env_cfg.max_steps or 500
    if steps % max(1, cfg.learn_every):
        raise ValueError(
            f"learn_every={cfg.learn_every} must divide the episode length "
            f"({steps}): the episode runs as blocks of learn_every env "
            "steps with one gradient step per block"
        )
    key = jax.random.PRNGKey(cfg.seed)

    # Example graph for initialization.
    key, k0 = jax.random.split(key)
    es0 = step_mod.reset(params, k0)
    obs0 = observations.observe(params, es0)
    g0 = hetero_graph_from_obs(params, obs0)
    feats0 = _feats(params, obs0)
    gs_dim = int(_global_state(feats0).shape[0])

    gs_scale = 1.0 / float(max(params.grid_h, params.grid_w))
    net = _make_network(cfg, action_size, params.num_agvs,
                        params.num_pickers, coord_scale=gs_scale)
    is_gru = cfg.net == "gru"
    if is_gru and cfg.algo != "iql":
        # The reference pairs the GRU net with IQL only (gru.py:1035-1275).
        raise ValueError("net='gru' currently supports algo='iql'")
    if cfg.algo == "iql":
        dqn_cfg = DQNConfig(batch_size=cfg.batch_size,
                            coordinated=cfg.coordinated)
        if cfg.gamma is not None:
            dqn_cfg.gamma = cfg.gamma
        if cfg.epsilon_decay is not None:
            dqn_cfg.epsilon_decay = cfg.epsilon_decay
        if cfg.epsilon_min is not None:
            dqn_cfg.epsilon_min = cfg.epsilon_min
        if cfg.epsilon_start is not None:
            dqn_cfg.epsilon_start = cfg.epsilon_start
        agent = IQLAgent(net, params, dqn_cfg)
    elif cfg.algo == "qmix":
        qmix_cfg = QMIXConfig(batch_size=cfg.batch_size,
                              value_transform=cfg.value_transform,
                              td_clip=cfg.td_clip,
                              huber_delta=cfg.huber_delta,
                              target_tau=cfg.target_tau,
                              coordinated=cfg.coordinated)
        if cfg.gamma is not None:
            qmix_cfg.gamma = cfg.gamma
        if cfg.epsilon_decay is not None:
            qmix_cfg.epsilon_decay = cfg.epsilon_decay
        if cfg.epsilon_min is not None:
            qmix_cfg.epsilon_min = cfg.epsilon_min
        if cfg.epsilon_start is not None:
            qmix_cfg.epsilon_start = cfg.epsilon_start
        agent = QMIXAgent(net, params, gs_dim, qmix_cfg)
    elif cfg.algo == "coma":
        encoder = HeteroGNNEncoder(cfg.hidden_dim, 2, coord_scale=gs_scale)
        coma_cfg = COMAConfig(
            lr_actor=cfg.coma_lr_actor,
            lr_critic=cfg.coma_lr_critic,
            entropy_coef=cfg.coma_entropy,
            entropy_decay=cfg.coma_entropy_decay,
            coordinated=cfg.coordinated,
        )
        if cfg.gamma is not None:
            coma_cfg.gamma = cfg.gamma
        agent = COMAAgent(encoder, params, action_size, gs_dim,
                          cfg.hidden_dim, coma_cfg)
    else:
        raise ValueError(cfg.algo)

    key, ki = jax.random.split(key)
    astate = agent.init(ki, g0)

    if cfg.init_q_from:
        from swarm_ode_tpu.utils.checkpoint import CheckpointManager

        if cfg.algo not in ("iql", "qmix"):
            raise ValueError("init_q_from supports algo in (iql, qmix)")
        bck = CheckpointManager(cfg.init_q_from)
        q_template = (
            astate.params["q"] if cfg.algo == "qmix" else astate.params
        )
        restored = bck.restore(
            {"q_params": jax.tree.map(np.asarray, q_template)}
        )
        if restored is None:
            raise FileNotFoundError(
                f"init_q_from={cfg.init_q_from}: no checkpoint found"
            )
        qp = jax.tree.map(jnp.asarray, restored["q_params"])
        new_params = (
            {**astate.params, "q": qp} if cfg.algo == "qmix" else qp
        )
        astate = astate.replace(params=new_params, target_params=new_params)
        if verbose:
            print(f"[init] Q-network warm-started from {cfg.init_q_from}",
                  flush=True)

    ep_base = 0  # episode-number offset when resuming a previous run
    if cfg.resume_from:
        from swarm_ode_tpu.utils.checkpoint import CheckpointManager

        rck = CheckpointManager(cfg.resume_from)
        restored = rck.restore({"agent": jax.tree.map(np.asarray, astate)})
        if restored is None:
            raise FileNotFoundError(
                f"resume_from={cfg.resume_from}: no checkpoint found"
            )
        astate = jax.tree.map(jnp.asarray, restored["agent"])
        ep_base = int(rck.latest_step()) + cfg.num_envs
        if verbose:
            print(
                f"[resume] restored agent from {cfg.resume_from} "
                f"step {rck.latest_step()} (continuing at episode {ep_base})",
                flush=True,
            )

    example_item = {
        "obs_feats": feats0,
        "next_feats": feats0,
        "actions": jnp.zeros(params.num_agents, jnp.int32),
        "rewards": jnp.zeros(params.num_agents, jnp.float32),
        "global_state": _global_state(feats0, gs_scale),
        "next_global_state": _global_state(feats0, gs_scale),
        "done": jnp.bool_(False),
        "_t": jnp.int32(0),
        "_ep": jnp.int32(0),
    }
    if is_gru:
        example_item["extras"] = net.init_hidden
        example_item["next_extras"] = net.init_hidden
    buf = replay.init(example_item, cfg.buffer_size)

    off_policy = cfg.algo in ("iql", "qmix")

    gamma = agent.cfg.gamma

    def batch_from(sampled):
        # n-step aggregation: sampled carries per-link rewards (B, n, A),
        # validity and chain length m; next_* are already the chain-end
        # bootstrap values (rl/replay.sample_nstep).
        n = cfg.n_step
        disc = gamma ** jnp.arange(n, dtype=jnp.float32)  # (n,)
        valid = sampled["nstep_valid"].astype(jnp.float32)  # (B, n)
        gamma_eff = gamma ** sampled["nstep_m"].astype(jnp.float32)
        if cfg.algo == "iql":
            rew_n = jnp.sum(
                sampled["nstep_rewards"] * (disc * valid)[:, :, None], axis=1
            )  # (B, A)
            b = {
                "obs_feats": sampled["obs_feats"],
                "next_feats": sampled["next_feats"],
                "actions": sampled["actions"],
                "rewards": rew_n,
                "dones": sampled["done"],
                "gamma_eff": gamma_eff,
            }
            if is_gru:
                b["extras"] = sampled["extras"]
                b["next_extras"] = sampled["next_extras"]
            return b
        team_k = (
            sampled["nstep_rewards"].mean(-1)
            if cfg.team_reward == "mean"
            else sampled["nstep_rewards"].sum(-1)
        )  # (B, n)
        reward_n = jnp.sum(team_k * disc * valid, axis=1)
        return {
            "obs_feats": sampled["obs_feats"],
            "next_feats": sampled["next_feats"],
            "actions": sampled["actions"],
            "reward": reward_n,
            "global_state": sampled["global_state"],
            "next_global_state": sampled["next_global_state"],
            "done": sampled["done"],
            "gamma_eff": gamma_eff,
        }

    B = cfg.num_envs

    @jax.jit
    def run_episode(es, astate, buf, key, t0, ep_idx):
        """Whole (batched) episode on device: B envs step in lockstep and
        feed one shared replay buffer; a gradient step every
        cfg.learn_every env steps."""

        def per_env(es, obs, ka, astate, hidden, t_global):
            # obs is carried from the previous step's observe(es2) — one
            # observation build per env step, not two.
            feats = _feats(params, obs)
            g = hetero_graph_from_obs(params, obs)
            masks = observations.compute_valid_action_masks(params, es)
            if is_gru:
                out = net.apply(_agent_params(astate), g, *hidden)
                new_hidden = (out["agv_hidden"], out["picker_hidden"])
                actions = agent.act(astate, g, masks, ka, extras=hidden,
                                    active=~es.agent_busy)
            else:
                new_hidden = hidden
                actions = agent.act(astate, g, masks, ka,
                                    active=~es.agent_busy)
            es2, rew, done, info = step_mod.step(params, es, actions)
            obs2 = observations.observe(params, es2)
            feats2 = _feats(params, obs2)
            item = {
                "obs_feats": feats,
                "next_feats": feats2,
                "actions": actions,
                "rewards": rew,
                "global_state": _global_state(feats, gs_scale),
                "next_global_state": _global_state(feats2, gs_scale),
                "done": done,
            }
            item["_t"] = t_global
            item["_ep"] = ep_idx
            if is_gru:
                item["extras"] = hidden
                item["next_extras"] = new_hidden
            return es2, obs2, new_hidden, item, rew, info

        # Learning runs once per `learn_every` block. The block structure is
        # load-bearing for throughput: a flat scan with `t % learn_every`
        # masking would still COMPUTE the sample + gradient every step and
        # discard it (lax.scan traces one body), paying the full learner
        # cost regardless of cadence. Nesting the env steps in an inner
        # scan makes learn_every a real compute saving.
        L = max(1, cfg.learn_every)
        n_blocks = steps // L

        def block(carry, tb):
            es, obs, astate, buf, key, hidden = carry

            def env_body(ecarry, t):
                es, obs, buf, key, hidden = ecarry
                kas = jax.random.split(key, B + 1)
                key, kas = kas[0], kas[1:]
                es2, obs2, hidden, items, rew, info = jax.vmap(
                    per_env, in_axes=(0, 0, 0, None, 0, None)
                )(es, obs, kas, astate, hidden, t0 + t)
                buf = replay.add_batch(buf, items)
                out = (rew.sum(), info["shelf_deliveries"].sum(),
                       info["clashes"].sum(), info["stucks"].sum())
                return (es2, obs2, buf, key, hidden), out

            ts = tb * L + jnp.arange(L, dtype=jnp.int32)
            (es, obs, buf, key, hidden), outs4 = jax.lax.scan(
                env_body, (es, obs, buf, key, hidden), ts
            )
            if off_policy:
                key, ks = jax.random.split(key)
                # Warm start: chains need n_step * B slots of history.
                ready = buf.size >= cfg.batch_size + cfg.n_step * B
                sampled = replay.sample_nstep(
                    buf, ks, cfg.batch_size, cfg.n_step, stride=B
                )
                new_astate, aux = agent.learn(astate, batch_from(sampled))
                astate = jax.tree.map(
                    lambda n, o: jnp.where(ready, n, o), new_astate, astate
                )
                loss = jnp.where(ready, aux["loss"], 0.0)
            else:
                loss = jnp.float32(0.0)
            return (es, obs, astate, buf, key, hidden), (*outs4, loss)

        hidden0 = (
            jax.tree.map(
                lambda h: jnp.broadcast_to(h, (B,) + h.shape), net.init_hidden
            )
            if is_gru
            else jnp.zeros(B)
        )
        obs0 = jax.vmap(lambda e: observations.observe(params, e))(es)
        (es, _, astate, buf, key, _), outs = jax.lax.scan(
            block, (es, obs0, astate, buf, key, hidden0),
            jnp.arange(n_blocks, dtype=jnp.int32),
        )
        return es, astate, buf, key, outs

    coma_update = jax.jit(agent.update) if cfg.algo == "coma" else None

    E = cfg.eval_episodes

    @jax.jit
    def eval_probe(astate, key):
        """Pure-greedy evaluation (epsilon=0 via training=False): E fresh
        envs, no learning, no buffer writes. Matches the reference's greedy
        stat-line convention (run_heuristic.py:30-58)."""

        def per_env_eval(es, obs, ka, astate, hidden):
            g = hetero_graph_from_obs(params, obs)
            masks = observations.compute_valid_action_masks(params, es)
            if is_gru:
                out = net.apply(_agent_params(astate), g, *hidden)
                new_hidden = (out["agv_hidden"], out["picker_hidden"])
                actions = agent.act(astate, g, masks, ka,
                                    training=cfg.eval_stochastic,
                                    extras=hidden, active=~es.agent_busy)
            else:
                new_hidden = hidden
                actions = agent.act(astate, g, masks, ka,
                                    training=cfg.eval_stochastic,
                                    active=~es.agent_busy)
            es2, rew, done, info = step_mod.step(params, es, actions)
            obs2 = observations.observe(params, es2)
            return es2, obs2, new_hidden, rew, info

        key, kr = jax.random.split(key)
        es = jax.vmap(step_mod.reset, in_axes=(None, 0))(
            params, jax.random.split(kr, E)
        )
        obs = jax.vmap(lambda e: observations.observe(params, e))(es)
        hidden0 = (
            jax.tree.map(
                lambda h: jnp.broadcast_to(h, (E,) + h.shape),
                net.init_hidden,
            )
            if is_gru
            else jnp.zeros(E)
        )

        def body(carry, _):
            es, obs, key, hidden = carry
            kas = jax.random.split(key, E + 1)
            key, kas = kas[0], kas[1:]
            es2, obs2, hidden, rew, info = jax.vmap(
                per_env_eval, in_axes=(0, 0, 0, None, 0)
            )(es, obs, kas, astate, hidden)
            return (es2, obs2, key, hidden), (
                rew.sum(), info["shelf_deliveries"].sum(),
            )

        _, (rews, delivs) = jax.lax.scan(
            body, (es, obs, key, hidden0), None, length=steps
        )
        return rews.sum() / E, delivs.sum() / E

    if cfg.num_episodes == 0:
        # Evaluation-only mode: one greedy probe (eval_episodes fresh
        # envs, epsilon=0, no learning) on the restored-or-fresh agent.
        # Measures policy operators — e.g. coordinated action selection
        # (rl/coordination.py) — on trained checkpoints without touching
        # the parameters.
        key, ke = jax.random.split(key)
        er, ed = jax.tree.map(np.asarray, eval_probe(astate, ke))
        stats = {
            "episode": ep_base,
            "eval_return": float(er),
            "eval_deliveries": float(ed),
            "eval_pick_rate": pick_rate(float(ed), steps),
        }
        if verbose:
            print(
                f"[eval-only eps=0] pick_rate={stats['eval_pick_rate']:.2f}"
                f" deliveries={ed:.1f} return={er:.2f}"
                f" ({E} greedy episodes)",
                flush=True,
            )
        return {"agent_state": astate, "history": [stats]}

    history = []
    ckpt = None
    if cfg.checkpoint_dir:
        from swarm_ode_tpu.utils.checkpoint import CheckpointManager

        ckpt = CheckpointManager(cfg.checkpoint_dir)

    for ep in range(0, cfg.num_episodes, B):
        key, kr = jax.random.split(key)
        es = jax.vmap(step_mod.reset, in_axes=(None, 0))(
            params, jax.random.split(kr, B)
        )
        t0 = time.time()
        es, astate, buf, key, outs = run_episode(
            es, astate, buf, key, jnp.int32((ep_base + ep) * steps),
            jnp.int32(ep_base + ep),
        )
        rew_sum, deliv, clash, stuck, loss = jax.tree.map(np.asarray, outs)
        rew_sum, deliv, clash, stuck = (
            rew_sum / B, deliv / B, clash / B, stuck / B,
        )
        coma_aux = None
        if cfg.algo == "coma":
            window = steps * B  # exactly this stride's transitions
            for _ in range(max(1, cfg.coma_updates)):
                key, ks = jax.random.split(key)
                sampled = replay.sample_recent(
                    buf, ks, cfg.batch_size, window
                )
                astate, coma_aux = coma_update(
                    astate,
                    {
                        "obs_feats": sampled["obs_feats"],
                        "global_state": sampled["global_state"],
                        "actions": sampled["actions"],
                        "rewards": sampled["rewards"].mean(-1) if cfg.team_reward == "mean" else sampled["rewards"].sum(-1),
                        "next_global_state": sampled["next_global_state"],
                        "dones": sampled["done"],
                    },
                )
        if cfg.algo == "iql" and (ep + 1) % cfg.target_sync_episodes == 0:
            astate = agent.sync_target(astate)
        if cfg.buffer_clear_episodes and (
            (ep + B) % cfg.buffer_clear_episodes < B
        ):
            buf = replay.clear(buf)
        stats = {
            "episode": ep_base + ep,
            "return": float(rew_sum.sum()),
            "deliveries": int(deliv.sum()),
            "clashes": int(clash.sum()),
            "stucks": int(stuck.sum()),
            "pick_rate": pick_rate(int(deliv.sum()), steps),
            "loss": float(loss[loss != 0].mean()) if (loss != 0).any() else 0.0,
            "seconds": time.time() - t0,
        }
        if coma_aux is not None:
            stats["critic_loss"] = float(coma_aux["critic_loss"])
            stats["actor_loss"] = float(coma_aux["actor_loss"])
            stats["loss"] = stats["critic_loss"]
        if cfg.eval_every and (ep + B) % cfg.eval_every < B:
            key, ke = jax.random.split(key)
            er, ed = jax.tree.map(np.asarray, eval_probe(astate, ke))
            stats["eval_return"] = float(er)
            stats["eval_deliveries"] = float(ed)
            stats["eval_pick_rate"] = pick_rate(float(ed), steps)
            if verbose:
                print(
                    f"[eval eps=0] Episode {ep_base + ep}: "
                    f"pick_rate={stats['eval_pick_rate']:.2f} "
                    f"deliveries={ed:.1f} return={er:.2f} "
                    f"({E} greedy episodes)",
                    flush=True,
                )
        history.append(stats)
        if logger:
            logger.log(stats, step=ep)
        if verbose:
            print(
                f"[{cfg.algo}+{cfg.net}] Episode {ep_base + ep}: "
                f"| [Overall Pick Rate={stats['pick_rate']:.2f}]"
                f"| [Global return={stats['return']:.2f}]"
                f"| [Total shelf deliveries={stats['deliveries']}]"
                f"| [Total clashes={stats['clashes']}]"
                f"| [Total stuck={stats['stucks']}]"
                f" | [loss={stats['loss']:.4f}] [{stats['seconds']:.1f}s]",
                flush=True,
            )
        # ep advances in strides of B envs; fire when a multiple of
        # checkpoint_every falls inside this stride.
        if ckpt and (ep + B) % cfg.checkpoint_every < B:
            ckpt.save(ep_base + ep,
                      {"agent": jax.tree.map(np.asarray, astate)},
                      force=True)

    return {"agent_state": astate, "history": history}
