"""MAPPO: multi-agent PPO with a centralized value function.

Beyond-reference: the reference fork ships IQL/QMIX/COMA loops (none of
which it ever trained successfully — SURVEY.md §2.4); MAPPO is the
modern on-policy baseline those loops predate. The design here:

* **Actor = the shared composite network family** (train/run_rl
  ._make_network protocol: graph -> agv/picker per-action scores used as
  logits). That makes BC/DAgger checkpoints (train/train_bc.py) direct
  warm starts — clone the dispatcher, then let PPO improve on it.
* **Critic** = V(global_state) MLP (same flat global state the QMIX
  mixers consume), trained on GAE returns.
* **Coordinated mode** uses the claim auction end to end: behavior
  samples with coordinated_sample and the PPO ratio is exact because
  sequential_log_prob IS that sampler's density (rl/coordination.py).
* **TPU shape**: whole strides are single jitted programs — B lockstep
  envs scanned over T steps collecting (T, B, ...) trajectories on
  device, GAE as a reverse scan, then K PPO epochs as a scan over
  shuffled minibatch indices. No host round-trips inside a stride.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

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
class MAPPOConfig:
    env_id: str = "tarware-medium-19agvs-9pickers-partialobs-v1"
    net: str = "gnn"
    hidden_dim: int = 64
    critic_hidden: int = 128
    num_envs: int = 8
    num_strides: int = 100  # each stride = num_envs full episodes
    lr: float = 3e-4
    lr_critic: float = 1e-3
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    ppo_epochs: int = 2
    minibatch: int = 128
    entropy_coef: float = 0.01
    value_coef: float = 0.5
    max_grad_norm: float = 0.5
    # Team reward: mean over agents (value scale independent of A).
    coordinated: bool = True
    # Warm start: checkpoint dir holding {'q_params': ...} from
    # train/train_bc.py (net/hidden_dim must match).
    init_from: Optional[str] = None
    # Multi-chip data parallelism: shard the env dimension over the
    # first N devices (0 = single device). num_envs must be divisible.
    mesh_devices: int = 0
    seed: int = 0
    steps_override: int = 0  # 0 = env max_steps; short episodes for smokes
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 20  # strides
    eval_every: int = 0  # strides; 0 = off
    eval_episodes: int = 8


class ValueNet(nn.Module):
    hidden: int = 128

    @nn.compact
    def __call__(self, gs):  # (..., S) -> (...,)
        h = nn.relu(nn.Dense(self.hidden)(gs))
        h = nn.relu(nn.Dense(self.hidden)(h))
        return nn.Dense(1)(h)[..., 0]


def _global_state(feats, scale):
    return (
        jnp.concatenate(
            [feats["agv"].reshape(-1), feats["picker"].reshape(-1),
             feats["loc"].reshape(-1)]
        )
        * scale
    )


def run_mappo(cfg: MAPPOConfig, verbose: bool = True,
              logger=None) -> Dict:
    from swarm_ode_tpu.train.run_rl import RLRunConfig, _make_network

    env_cfg = EnvConfig.from_env_id(cfg.env_id)
    lay = build_layout(env_cfg)
    params = make_params(env_cfg, lay)
    T = cfg.steps_override or env_cfg.max_steps or 500
    B = cfg.num_envs
    A = params.num_agents
    rack_start = 1 + params.num_goals
    gs_scale = 1.0 / float(max(params.grid_h, params.grid_w))
    net = _make_network(
        RLRunConfig(net=cfg.net, hidden_dim=cfg.hidden_dim),
        params.num_actions, params.num_agvs, params.num_pickers,
        coord_scale=gs_scale,
    )
    critic = ValueNet(cfg.critic_hidden)

    key = jax.random.PRNGKey(cfg.seed)
    key, k0 = jax.random.split(key)
    es0 = step_mod.reset(params, k0)
    obs0 = observations.observe(params, es0)
    g0 = hetero_graph_from_obs(params, obs0)
    a_f, p_f, l_f = split_observation(params, obs0)
    gs0 = _global_state({"agv": a_f, "picker": p_f, "loc": l_f}, gs_scale)

    actor_params = net.init(k0, g0)
    critic_params = critic.init(k0, gs0)
    if cfg.init_from:
        from swarm_ode_tpu.utils.checkpoint import CheckpointManager

        restored = CheckpointManager(cfg.init_from).restore(
            {"q_params": jax.tree.map(np.asarray, actor_params)}
        )
        if restored is None:
            raise FileNotFoundError(f"init_from={cfg.init_from}")
        actor_params = jax.tree.map(jnp.asarray, restored["q_params"])
        if verbose:
            print(f"[mappo] actor warm-started from {cfg.init_from}",
                  flush=True)

    actor_tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm), optax.adam(cfg.lr)
    )
    critic_tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(cfg.lr_critic),
    )
    actor_opt = actor_tx.init(actor_params)
    critic_opt = critic_tx.init(critic_params)

    def logits_of(ap, obs):
        out = net.apply(ap, hetero_graph_from_obs(params, obs))
        return jnp.concatenate(
            [out["agv_q_values"], out["picker_q_values"]], axis=0
        )

    def feats_of(obs):
        a_f, p_f, l_f = split_observation(params, obs)
        return {"agv": a_f, "picker": p_f, "loc": l_f}

    def logp_taken(ap, obs, es_masks, actions, active):
        logits = logits_of(ap, obs)
        if cfg.coordinated:
            lp, ent = coordination.sequential_log_prob(
                logits, es_masks, actions, params.num_agvs, rack_start,
                active=active,
            )
            return lp, ent
        ml = jnp.where(es_masks > 0, logits, -1e9)
        lp = jax.nn.log_softmax(ml, axis=-1)
        taken = jnp.take_along_axis(lp, actions[:, None], -1)[:, 0]
        p = jnp.exp(lp)
        ent = -(p * jnp.where(p > 1e-8, lp, 0.0)).sum(-1)
        return taken, ent

    # ---------------- collection: one stride = B episodes of T steps ----
    def collect_impl(actor_params, critic_params, key):
        kr, key = jax.random.split(key)
        es = jax.vmap(step_mod.reset, in_axes=(None, 0))(
            params, jax.random.split(kr, B)
        )
        obs = jax.vmap(lambda e: observations.observe(params, e))(es)

        def body(carry, k):
            es, obs = carry

            def one(o, e, ki):
                logits = logits_of(actor_params, o)
                masks = observations.compute_valid_action_masks(params, e)
                active = ~e.agent_busy
                if cfg.coordinated:
                    a = coordination.coordinated_sample(
                        logits, masks, params.num_agvs, rack_start, ki,
                        active=active,
                    )
                else:
                    ml = jnp.where(masks > 0, logits, -1e9)
                    a = jax.random.categorical(ki, ml, axis=-1).astype(
                        jnp.int32
                    )
                lp, _ = logp_taken(actor_params, o, masks, a, active)
                return a, lp, masks, active

            ks = jax.random.split(k, B)
            a, lp, masks, active = jax.vmap(one)(obs, es, ks)
            es2, rew, done, info = jax.vmap(
                lambda e, ai: step_mod.step(params, e, ai)
            )(es, a)
            obs2 = jax.vmap(lambda e: observations.observe(params, e))(es2)
            gs = jax.vmap(lambda o: _global_state(feats_of(o), gs_scale))(
                obs
            )
            out = {
                "obs": obs, "gs": gs, "actions": a, "logp": lp,
                "active": active,
                "reward": rew.mean(-1),  # team mean
                "deliv": info["shelf_deliveries"],
            }
            return (es2, obs2), out

        (es_f, obs_f), traj = jax.lax.scan(
            body, (es, obs), jax.random.split(key, T)
        )
        gs_last = jax.vmap(
            lambda o: _global_state(feats_of(o), gs_scale)
        )(obs_f)
        v_last = critic.apply(critic_params, gs_last)  # (B,)
        # GAE over the time axis (episodes are fixed length: bootstrap
        # only at the stride end).
        v = critic.apply(critic_params, traj["gs"])  # (T, B)

        def gae_step(carry, inp):
            adv_next, v_next = carry
            r, v_t, is_last = inp
            delta = r + cfg.gamma * v_next * (1.0 - is_last) - v_t
            adv = delta + cfg.gamma * cfg.gae_lambda * adv_next * (
                1.0 - is_last
            )
            return (adv, v_t), adv

        is_last = jnp.zeros(T).at[T - 1].set(1.0)
        (_, _), advs = jax.lax.scan(
            gae_step,
            (jnp.zeros(B), v_last),
            (traj["reward"], v, jnp.broadcast_to(is_last[:, None], (T, B))),
            reverse=True,
        )
        returns = advs + v
        traj["adv"] = advs
        traj["ret"] = returns
        return traj

    # Multi-chip: dp-shard the env dimension of every (T, B, ...)
    # trajectory array over a 1-D device mesh and let XLA partition the
    # whole stride (the scaling-book recipe: annotate shardings, let the
    # compiler insert collectives). Per-env compute — rollout, policy
    # forward, GAE — is embarrassingly parallel over envs, so collection
    # runs without any cross-device traffic; the PPO update's shuffled
    # minibatches and the replicated-parameter gradients become
    # all-gathers/all-reduces over ICI. The per-env trajectory math is
    # bitwise identical to the single-device run
    # (tests/test_mappo.py::test_mappo_mesh_parity).
    if cfg.mesh_devices:
        from jax.sharding import Mesh, NamedSharding
        from jax.sharding import PartitionSpec as P

        if B % cfg.mesh_devices:
            raise ValueError(
                f"num_envs={B} must divide over mesh_devices="
                f"{cfg.mesh_devices}"
            )
        mesh = Mesh(
            np.asarray(jax.devices()[: cfg.mesh_devices]), ("dp",)
        )
        dp = NamedSharding(mesh, P(None, "dp"))
        traj_shardings = {
            "obs": dp, "gs": dp, "actions": dp, "logp": dp,
            "active": dp, "reward": dp, "deliv": dp, "adv": dp,
            "ret": dp,
        }
        collect = jax.jit(collect_impl, out_shardings=traj_shardings)
    else:
        collect = jax.jit(collect_impl)

    # ---------------- update: K epochs of shuffled minibatches ----------
    N = T * B
    MB = cfg.minibatch
    n_mb = N // MB

    def flat(x):
        return x.reshape((N,) + x.shape[2:])

    @jax.jit
    def update(actor_params, critic_params, actor_opt, critic_opt, traj,
               key):
        data = {k: flat(v) for k, v in traj.items() if k != "deliv"}
        adv = data["adv"]
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)

        def loss_fn(ap, cp, idx):
            obs_b = data["obs"][idx]
            act_b = data["actions"][idx]
            lp_old = data["logp"][idx]
            active_b = data["active"][idx]
            adv_b = adv[idx]
            ret_b = data["ret"][idx]

            def one(o, a_t, act_flags):
                f = feats_of(o)
                masks = masks_from_feats(
                    params, f["agv"], f["picker"], f["loc"]
                )
                return logp_taken(ap, o, masks, a_t, act_flags)

            lp_new, ent = jax.vmap(one)(obs_b, act_b, active_b)  # (MB, A)
            # Shared team advantage broadcast to every agent's ratio.
            ratio = jnp.exp(lp_new - lp_old)
            r_adv = ratio * adv_b[:, None]
            clipped = (
                jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps)
                * adv_b[:, None]
            )
            pg = -jnp.minimum(r_adv, clipped).mean()
            v = critic.apply(cp, data["gs"][idx])
            v_loss = jnp.mean((v - ret_b) ** 2)
            ent_mean = ent.mean()
            total = pg + cfg.value_coef * v_loss - cfg.entropy_coef * ent_mean
            return total, (pg, v_loss, ent_mean)

        def mb_step(carry, idx):
            ap, cp, ao, co = carry
            (_, aux), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(ap, cp, idx)
            ag, cg = grads
            au, ao = actor_tx.update(ag, ao, ap)
            ap = optax.apply_updates(ap, au)
            cu, co = critic_tx.update(cg, co, cp)
            cp = optax.apply_updates(cp, cu)
            return (ap, cp, ao, co), aux

        def epoch(carry, k):
            perm = jax.random.permutation(k, N)[: n_mb * MB].reshape(
                n_mb, MB
            )
            carry, aux = jax.lax.scan(mb_step, carry, perm)
            return carry, jax.tree.map(lambda x: x.mean(), aux)

        carry = (actor_params, critic_params, actor_opt, critic_opt)
        carry, aux = jax.lax.scan(
            epoch, carry, jax.random.split(key, cfg.ppo_epochs)
        )
        ap, cp, ao, co = carry
        aux = jax.tree.map(lambda x: x.mean(), aux)
        return ap, cp, ao, co, {
            "pg_loss": aux[0], "v_loss": aux[1], "entropy": aux[2]
        }

    # ---------------- eval: greedy rollouts --------------------------
    E = cfg.eval_episodes

    @jax.jit
    def eval_probe(actor_params, key):
        kr, key = jax.random.split(key)
        es = jax.vmap(step_mod.reset, in_axes=(None, 0))(
            params, jax.random.split(kr, E)
        )
        obs = jax.vmap(lambda e: observations.observe(params, e))(es)

        def body(carry, _):
            es, obs = carry

            def one(o, e):
                logits = logits_of(actor_params, o)
                masks = observations.compute_valid_action_masks(params, e)
                if cfg.coordinated:
                    return coordination.coordinated_argmax(
                        logits, masks, params.num_agvs, rack_start,
                        active=~e.agent_busy,
                    )
                return jnp.argmax(
                    jnp.where(masks > 0, logits, -jnp.inf), -1
                ).astype(jnp.int32)

            a = jax.vmap(one)(obs, es)
            es2, rew, _, info = jax.vmap(
                lambda e, ai: step_mod.step(params, e, ai)
            )(es, a)
            obs2 = jax.vmap(lambda e: observations.observe(params, e))(es2)
            return (es2, obs2), (rew.sum(), info["shelf_deliveries"].sum())

        _, (rews, delivs) = jax.lax.scan(body, (es, obs), None, length=T)
        return rews.sum() / E, delivs.sum() / E

    ckpt = None
    if cfg.checkpoint_dir:
        from swarm_ode_tpu.utils.checkpoint import CheckpointManager

        ckpt = CheckpointManager(cfg.checkpoint_dir)

    history = []
    for stride in range(cfg.num_strides):
        t0 = time.time()
        key, kc, ku = jax.random.split(key, 3)
        traj = collect(actor_params, critic_params, kc)
        actor_params, critic_params, actor_opt, critic_opt, aux = update(
            actor_params, critic_params, actor_opt, critic_opt, traj, ku
        )
        deliv = float(np.asarray(traj["deliv"]).sum()) / B
        stats = {
            "stride": stride,
            "episode": stride * B,
            "pick_rate": pick_rate(deliv, T),
            "deliveries": deliv,
            "return": float(np.asarray(traj["reward"]).sum()) / B,
            "pg_loss": float(aux["pg_loss"]),
            "v_loss": float(aux["v_loss"]),
            "entropy": float(aux["entropy"]),
            "seconds": time.time() - t0,
        }
        if cfg.eval_every and (stride + 1) % cfg.eval_every == 0:
            key, ke = jax.random.split(key)
            er, ed = jax.tree.map(float, eval_probe(actor_params, ke))
            stats["eval_pick_rate"] = pick_rate(ed, T)
            stats["eval_return"] = er
        history.append(stats)
        if logger:
            logger.log(stats, step=stride)
        if verbose:
            msg = (
                f"[mappo] stride {stride} (ep {stats['episode']}): "
                f"pick_rate={stats['pick_rate']:.2f} "
                f"return={stats['return']:.2f} pg={stats['pg_loss']:.4f} "
                f"v={stats['v_loss']:.4f} H={stats['entropy']:.3f} "
                f"[{stats['seconds']:.1f}s]"
            )
            if "eval_pick_rate" in stats:
                msg += f" | eval={stats['eval_pick_rate']:.2f}"
            print(msg, flush=True)
        if ckpt and (stride + 1) % cfg.checkpoint_every == 0:
            ckpt.save(
                stride,
                {"q_params": jax.tree.map(np.asarray, actor_params),
                 "critic": jax.tree.map(np.asarray, critic_params)},
                force=True,
            )

    return {
        "actor_params": actor_params,
        "critic_params": critic_params,
        "history": history,
    }
