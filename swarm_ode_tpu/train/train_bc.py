"""Behavior cloning from logged dispatcher decisions (beyond-reference).

The collected datasets (data/collect.py, reference collect_data.py
schema) log, per step, the full observation array, every agent's macro
action, and the pre-step busy flags — i.e. exactly the decision record
of the FIFO heuristic dispatcher that outperforms every trained policy
in the repo (PARITY.md: pick rate 127.6). The reference never exploits
its own logs this way; here they become supervision.

Training: masked cross-entropy over each agent's valid actions
(masks_from_feats, same contract as the RL learners), weighted to the
real decision points — agents idle at the step (busy agents' stored
actions are ignored by the env, env/step.py Phase 1a) whose taken action
is valid under the reconstructed mask. The whole epoch is a scan of
jitted minibatch steps on device; observations stay float16 on host and
are staged per batch.

The cloned network is the SAME class the RL agents use
(train/run_rl._make_network), so its parameters drop into QMIX/IQL as a
warm start (run_rl.RLRunConfig.init_q_from) — RL-from-demonstrations.
Evaluation: pure-greedy rollouts (argmax over cloned logits), optionally
through the claim auction (rl/coordination.py).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from swarm_ode_tpu.config import EnvConfig
from swarm_ode_tpu.env import observations, step as step_mod
from swarm_ode_tpu.env.layout import build_layout
from swarm_ode_tpu.env.state import make_params
from swarm_ode_tpu.graphs.hetero import (
    hetero_graph_from_obs,
    masks_from_feats,
    split_observation,
)
from swarm_ode_tpu.rl import coordination
from swarm_ode_tpu.utils.metrics import pick_rate


@dataclasses.dataclass
class BCConfig:
    env_id: str = "tarware-medium-19agvs-9pickers-partialobs-v1"
    files: Optional[List[str]] = None  # HDF5 dataset paths
    net: str = "gnode"  # same registry as run_rl (gnode | gnn)
    hidden_dim: int = 64
    lr: float = 1e-3
    epochs: int = 10
    batch_size: int = 64
    val_frac: float = 0.1  # episode-level split
    step_stride: int = 1  # subsample steps within episodes
    max_episodes: int = 0  # 0 = all
    seed: int = 0
    checkpoint_dir: Optional[str] = None
    # Greedy rollout evaluation after training (0 = off).
    eval_episodes: int = 0
    eval_coordinated: bool = False


def load_decision_arrays(files: List[str], stride: int = 1,
                         max_episodes: int = 0):
    """Stack (obs, actions, busy) across episodes/files.

    Returns float16/int32/bool numpy arrays of shape (N, A, obs_len),
    (N, A), (N, A) plus per-row episode ids for the split."""
    obs_l, act_l, busy_l, ep_l = [], [], [], []
    ep_id = 0
    for path in files:
        with h5py.File(path, "r") as f:
            keys = sorted(k for k in f.keys() if k.startswith("episode_"))
            for k in keys:
                if max_episodes and ep_id >= max_episodes:
                    break
                g = f[k]["steps"]
                obs_l.append(g["observations"][::stride])
                act_l.append(g["actions"][::stride])
                busy_l.append(g["agent_busy"][::stride])
                ep_l.append(np.full(obs_l[-1].shape[0], ep_id, np.int32))
                ep_id += 1
    return (
        np.concatenate(obs_l).astype(np.float16),
        np.concatenate(act_l).astype(np.int32),
        np.concatenate(busy_l),
        np.concatenate(ep_l),
    )


def train_bc(cfg: BCConfig, verbose: bool = True, arrays=None,
             init_params=None) -> Dict:
    """Clone logged decisions. `arrays` overrides file loading with
    in-memory (obs, actions, busy, episode_ids) — the DAgger aggregation
    path; `init_params` continues from existing network parameters
    instead of a fresh init."""
    from swarm_ode_tpu.train.run_rl import RLRunConfig, _make_network

    env_cfg = EnvConfig.from_env_id(cfg.env_id)
    lay = build_layout(env_cfg)
    params = make_params(env_cfg, lay)
    gs_scale = 1.0 / float(max(params.grid_h, params.grid_w))
    net = _make_network(
        RLRunConfig(net=cfg.net, hidden_dim=cfg.hidden_dim),
        params.num_actions, params.num_agvs, params.num_pickers,
        coord_scale=gs_scale,
    )

    if arrays is None:
        arrays = load_decision_arrays(
            cfg.files, cfg.step_stride, cfg.max_episodes
        )
    obs_np, act_np, busy_np, ep_np = arrays
    n_eps = int(ep_np.max()) + 1
    rng = np.random.default_rng(cfg.seed)
    val_eps = set(
        rng.permutation(n_eps)[: max(1, int(n_eps * cfg.val_frac))].tolist()
    )
    is_val = np.isin(ep_np, list(val_eps))
    if verbose:
        print(
            f"[bc] {obs_np.shape[0]} steps from {n_eps} episodes "
            f"({is_val.sum()} val rows), idle fraction "
            f"{(~busy_np).mean():.3f}",
            flush=True,
        )

    key = jax.random.PRNGKey(cfg.seed)
    k0, key = jax.random.split(key)
    es0 = step_mod.reset(params, k0)
    g0 = hetero_graph_from_obs(params, observations.observe(params, es0))
    net_params = init_params if init_params is not None else net.init(k0, g0)

    import optax

    tx = optax.adam(cfg.lr)
    opt_state = tx.init(net_params)

    def logits_of(p, obs):
        g = hetero_graph_from_obs(params, obs)
        out = net.apply(p, g)
        return jnp.concatenate(
            [out["agv_q_values"], out["picker_q_values"]], axis=0
        )

    def batch_loss(p, obs_b, act_b, idle_b):
        def one(obs, act, idle):
            logits = logits_of(p, obs)
            a_f, p_f, l_f = split_observation(params, obs)
            masks = masks_from_feats(params, a_f, p_f, l_f)
            taken_valid = (
                jnp.take_along_axis(masks, act[:, None], -1)[:, 0] > 0
            )
            # Decision points: idle agents whose logged action is valid
            # under the reconstructed mask (rare capture-edge mismatches
            # would otherwise inject -log(~0) outliers).
            w = (idle & taken_valid).astype(jnp.float32)
            logp = jax.nn.log_softmax(
                jnp.where(masks > 0, logits, -1e9), axis=-1
            )
            ce = -jnp.take_along_axis(logp, act[:, None], -1)[:, 0]
            hit = (jnp.argmax(jnp.where(masks > 0, logits, -1e9), -1)
                   == act)
            return (ce * w).sum(), w.sum(), (hit * w).sum()

        ce, w, hit = jax.vmap(one)(obs_b, act_b, idle_b)
        wsum = jnp.maximum(w.sum(), 1.0)
        return ce.sum() / wsum, (hit.sum() / wsum, w.sum())

    tr_idx = np.where(~is_val)[0]
    va_idx = np.where(is_val)[0]
    B = cfg.batch_size

    # Stage the whole dataset on device once (float16 obs; medium 400
    # episodes ~1.6 GB HBM) and run each epoch as ONE lax.scan over
    # shuffled minibatch indices with device-side gathers. The previous
    # per-minibatch Python loop paid a BLOCKING device->host sync
    # (float(loss)) per batch — ~1000 tunnel round-trips per epoch, which
    # dominated wall time on chip (150-550 s/epoch measured in the r5
    # DAgger stage; compute itself is ~2 s). One sync per epoch instead.
    # Each distinct batch count recompiles the scan (DAgger growth does
    # this once per round) — seconds, vs minutes of RTT stalls.
    # NOTE: these must be passed to the jitted epoch functions as explicit
    # arguments, not closed over — closed-over arrays are embedded into the
    # lowered HLO as constants, and a ~265 MB constant blows the axon
    # tunnel's compile-request size limit (HTTP 413) at medium scale.
    obs_dev = jnp.asarray(obs_np)
    act_dev = jnp.asarray(act_np)
    idle_dev = jnp.asarray(~busy_np)

    def epoch_scan(p, opt_state, order, obs_all, act_all, idle_all, train):
        def body(carry, rows):
            p, opt_state, tot = carry
            obs_b = obs_all[rows].astype(jnp.float32)
            act_b = act_all[rows]
            idle_b = idle_all[rows]
            if train:
                (loss, (acc, w)), grads = jax.value_and_grad(
                    batch_loss, has_aux=True
                )(p, obs_b, act_b, idle_b)
                updates, opt_state = tx.update(grads, opt_state, p)
                p = optax.apply_updates(p, updates)
            else:
                loss, (acc, w) = batch_loss(p, obs_b, act_b, idle_b)
            tot = tot + jnp.stack([loss * w, acc * w, w])
            return (p, opt_state, tot), None

        (p, opt_state, tot), _ = jax.lax.scan(
            body, (p, opt_state, jnp.zeros(3, jnp.float32)), order
        )
        return p, opt_state, tot

    epoch_train = jax.jit(
        lambda p, o, idx, ob, ac, idl: epoch_scan(p, o, idx, ob, ac, idl, True),
        donate_argnums=(0, 1),
    )
    epoch_eval = jax.jit(
        lambda p, o, idx, ob, ac, idl: epoch_scan(
            p, o, idx, ob, ac, idl, False
        )[2]
    )

    def run_split(p, opt_state, idx, train):
        order = rng.permutation(idx) if train else idx
        n_b = len(order) // B
        if n_b == 0:
            return p, opt_state, 0.0, 0.0
        order = jnp.asarray(
            np.asarray(order[: n_b * B], np.int32).reshape(n_b, B)
        )
        if train:
            p, opt_state, tot = epoch_train(
                p, opt_state, order, obs_dev, act_dev, idle_dev
            )
        else:
            tot = epoch_eval(
                p, opt_state, order, obs_dev, act_dev, idle_dev
            )
        tot_l, tot_a, tot_w = (float(v) for v in np.asarray(tot))
        tot_w = max(tot_w, 1.0)
        return p, opt_state, tot_l / tot_w, tot_a / tot_w

    ckpt = None
    if cfg.checkpoint_dir:
        from swarm_ode_tpu.utils.checkpoint import CheckpointManager

        ckpt = CheckpointManager(cfg.checkpoint_dir)

    history = []
    best = (np.inf, None)
    for ep in range(cfg.epochs):
        t0 = time.time()
        net_params, opt_state, tr_l, tr_a = run_split(
            net_params, opt_state, tr_idx, True
        )
        _, _, va_l, va_a = run_split(net_params, opt_state, va_idx, False)
        history.append(
            {"epoch": ep, "train_loss": tr_l, "train_acc": tr_a,
             "val_loss": va_l, "val_acc": va_a,
             "seconds": time.time() - t0}
        )
        if va_l < best[0]:
            best = (va_l, jax.tree.map(np.asarray, net_params))
            if ckpt:
                ckpt.save(ep, {"q_params": best[1]}, force=True)
        if verbose:
            h = history[-1]
            print(
                f"[bc] epoch {ep}: train ce {tr_l:.4f} acc {tr_a:.3f} | "
                f"val ce {va_l:.4f} acc {va_a:.3f} "
                f"[{h['seconds']:.1f}s]",
                flush=True,
            )

    net_params = jax.tree.map(jnp.asarray, best[1])
    out = {"params": net_params, "history": history,
           "best_val_loss": best[0]}

    if cfg.eval_episodes:
        out["eval"] = evaluate_policy(
            params, net, net_params, cfg.eval_episodes,
            jax.random.PRNGKey(cfg.seed + 1),
            coordinated=cfg.eval_coordinated, verbose=verbose,
        )
    return out


def collect_dagger(params, layout, net, net_params, episodes, key,
                   beta: float = 0.0, coordinated: bool = True,
                   temperature: float = 0.0, steps: int = 0):
    """DAgger data collection: roll the CLONE (or a beta-mixture with the
    expert), label every visited state with the stateless expert oracle
    (policies/heuristic.make_stateless_expert — the dispatcher's action
    re-derived from the env state alone, no threaded bookkeeping).

    This is the fix for BC's compounding error: plain cloning only sees
    the expert's own states, so the clone's small mistakes drift it into
    states it was never taught to recover from (measured:
    runs/bc_medium_cpu_probe* — gnode clones decisions BETTER but rolls
    out far worse). Aggregating expert labels at clone-visited states
    trains exactly those recoveries (Ross et al. 2011).

    Returns (obs float16 (N, A, obs_len), expert_actions (N, A) int32,
    busy (N, A) bool) with N = episodes * steps, rolled as one jitted
    scan of `episodes` lockstep envs.
    """
    from swarm_ode_tpu.policies.heuristic import make_stateless_expert

    expert = make_stateless_expert(params, layout)
    E = episodes
    steps = steps or params.max_steps or 500
    rack_start = 1 + params.num_goals

    def clone_act(obs, es, k):
        g = hetero_graph_from_obs(params, obs)
        out = net.apply(net_params, g)
        scores = jnp.concatenate(
            [out["agv_q_values"], out["picker_q_values"]], axis=0
        )
        masks = observations.compute_valid_action_masks(params, es)
        if temperature > 0:
            # Collect under the SERVING operator (sampled at T): the
            # aggregated states then match the deployed policy's visit
            # distribution — the DAgger premise, applied to the operator
            # actually used at serving time (RESULTS.md temperature
            # table).
            return coordination.coordinated_sample(
                scores / temperature, masks, params.num_agvs, rack_start,
                k, active=~es.agent_busy,
            )
        if coordinated:
            return coordination.coordinated_argmax(
                scores, masks, params.num_agvs, rack_start,
                active=~es.agent_busy,
            )
        return jnp.argmax(
            jnp.where(masks > 0, scores, -jnp.inf), -1
        ).astype(jnp.int32)

    @jax.jit
    def run(key):
        kr, key = jax.random.split(key)
        es = jax.vmap(step_mod.reset, in_axes=(None, 0))(
            params, jax.random.split(kr, E)
        )
        obs = jax.vmap(lambda e: observations.observe(params, e))(es)

        def body(carry, k):
            es, obs = carry
            k, kc = jax.random.split(k)
            a_exp = jax.vmap(lambda e: expert(params, e))(es)
            a_clone = jax.vmap(clone_act)(obs, es, jax.random.split(kc, E))
            take_exp = jax.random.uniform(k, (E,)) < beta
            a = jnp.where(take_exp[:, None], a_exp, a_clone)
            es2, _, _, _ = jax.vmap(
                lambda e, ai: step_mod.step(params, e, ai)
            )(es, a.astype(jnp.int32))
            obs2 = jax.vmap(lambda e: observations.observe(params, e))(es2)
            return (es2, obs2), (obs, a_exp, es.agent_busy)

        _, (obs_seq, act_seq, busy_seq) = jax.lax.scan(
            body, (es, obs), jax.random.split(key, steps)
        )
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        return flat(obs_seq), flat(act_seq), flat(busy_seq)

    obs_seq, act_seq, busy_seq = run(key)
    return (
        np.asarray(obs_seq, np.float16),
        np.asarray(act_seq, np.int32),
        np.asarray(busy_seq),
    )


def evaluate_policy(params, net, net_params, episodes, key,
                    coordinated=False, temperature: float = 0.0,
                    verbose=True) -> Dict:
    """Rollout evaluation of a cloned policy, E fresh envs in lockstep —
    the reference's stat-line convention (run_heuristic.py:30-58).

    temperature=0: argmax over masked logits (optionally through the
    claim auction). temperature>0: coordinated sampling from
    softmax(logits/T) — the measured antidote to argmax brittleness: the
    over-fit medium clone rolls 72 under argmax but ~125 at T=1.5-2,
    essentially matching the dispatcher (RESULTS.md, the non-monotone
    imitation finding)."""
    E = episodes
    steps = params.max_steps or 500
    rack_start = 1 + params.num_goals

    def act(obs, es, k):
        g = hetero_graph_from_obs(params, obs)
        out = net.apply(net_params, g)
        logits = jnp.concatenate(
            [out["agv_q_values"], out["picker_q_values"]], axis=0
        )
        masks = observations.compute_valid_action_masks(params, es)
        if temperature > 0:
            return coordination.coordinated_sample(
                logits / temperature, masks, params.num_agvs, rack_start,
                k, active=~es.agent_busy,
            )
        if coordinated:
            return coordination.coordinated_argmax(
                logits, masks, params.num_agvs, rack_start,
                active=~es.agent_busy,
            )
        return jnp.argmax(
            jnp.where(masks > 0, logits, -jnp.inf), -1
        ).astype(jnp.int32)

    @jax.jit
    def roll(key):
        kr, key = jax.random.split(key)
        es = jax.vmap(step_mod.reset, in_axes=(None, 0))(
            params, jax.random.split(kr, E)
        )
        obs = jax.vmap(lambda e: observations.observe(params, e))(es)

        def body(carry, k):
            es, obs = carry
            actions = jax.vmap(act)(obs, es, jax.random.split(k, E))
            es2, rew, done, info = jax.vmap(
                lambda e, a: step_mod.step(params, e, a)
            )(es, actions)
            obs2 = jax.vmap(lambda e: observations.observe(params, e))(es2)
            return (es2, obs2), (
                rew.sum(), info["shelf_deliveries"].sum(),
                info["clashes"].sum(),
            )

        (_, _), (rews, delivs, clashes) = jax.lax.scan(
            body, (es, obs), jax.random.split(key, steps)
        )
        return rews.sum() / E, delivs.sum() / E, clashes.sum() / E

    r, d, c = jax.tree.map(float, roll(key))
    tag = f" T={temperature}" if temperature > 0 else (
        " coord" if coordinated else ""
    )
    res = {
        "episodes": E,
        "pick_rate": pick_rate(d, steps),
        "deliveries": d,
        "return": r,
        "clashes": c,
        "coordinated": bool(coordinated or temperature > 0),
        "temperature": temperature,
    }
    if verbose:
        print(
            f"[bc eval{tag}] "
            f"pick_rate={res['pick_rate']:.2f} deliveries={d:.1f} "
            f"clashes={c:.1f} ({E} episodes)",
            flush=True,
        )
    return res
