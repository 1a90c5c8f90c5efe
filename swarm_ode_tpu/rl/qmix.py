"""QMIX: monotonic value decomposition over graph Q-networks.

Parity: QMIXAgent (reference run_gnode.py:718-932) — double-DQN target
action selection, hypernetwork mixer over the taken per-agent Q-values,
team reward, epsilon-greedy behavior, periodic hard target sync, grad clip
10.0 — and the simpler GraphMARL_QMIX loop (graph.py:190-334, clip 1.0).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from swarm_ode_tpu.env.state import EnvParams
from swarm_ode_tpu.graphs.hetero import (
    HeteroGraph,
    build_hetero_graph,
    masks_from_feats,
)
from swarm_ode_tpu.models.qmix import HeteroQMIXMixer
from swarm_ode_tpu.rl import coordination


@dataclasses.dataclass
class QMIXConfig:
    # Defaults follow the reference learning_config (run_gnode.py:1328):
    # lr 1e-4, gamma 0.999, epsilon decay 0.999 to 0.1.
    lr: float = 1e-4
    gamma: float = 0.999
    epsilon_start: float = 1.0
    epsilon_decay: float = 0.999
    epsilon_min: float = 0.1
    grad_clip: float = 10.0
    batch_size: int = 32
    update_target_freq: int = 200
    # Polyak soft target updates (0 = reference-style hard sync every
    # update_target_freq steps). Small tau (e.g. 5e-3) is the standard
    # stabilizer for per-step TD training.
    target_tau: float = 0.0
    mixing_embed_dim: int = 32
    hypernet_embed: int = 64
    # Invertible value rescaling (R2D2's h-transform): targets become
    # h(R + gamma_eff * h^-1(Q_next)). Bounds TD magnitudes under
    # gamma=0.999 long horizons — the round-1 medium-scale drift fix.
    value_transform: bool = False
    # Raw-space clamp on the bootstrap value and TD target (0 = off). The
    # achievable return is bounded by r_max/(1-gamma); any larger target is
    # pure overestimation spiral (the round-1/2 5k-run loss blow-up), so
    # clamping at a loose multiple of that bound cannot clip real signal.
    td_clip: float = 0.0
    # Huber loss on the TD error (0 = plain MSE). Caps the per-sample
    # gradient scale so one outlier target can't swing the whole batch.
    huber_delta: float = 0.0
    # Conflict-masked sequential action selection (rl/coordination.py):
    # idle agents claim rack targets in confidence order so no two
    # same-type agents double-book a shelf in the same macro step — the
    # round-3 plateau analysis' structural lever. Applies to both the
    # behavior policy (act) and the TD-target argmax (learn), so the
    # bootstrap evaluates the joint policy actually executed.
    coordinated: bool = False


_H_EPS = 1e-2


def h_transform(x):
    return jnp.sign(x) * (jnp.sqrt(jnp.abs(x) + 1.0) - 1.0) + _H_EPS * x


def h_inverse(y):
    # Closed-form inverse of h (R2D2, Pohlen et al. 2018 eq. 2).
    s = jnp.sign(y)
    a = jnp.abs(y)
    num = jnp.sqrt(1.0 + 4.0 * _H_EPS * (a + 1.0 + _H_EPS)) - 1.0
    return s * ((num / (2.0 * _H_EPS)) ** 2 - 1.0)


@struct.dataclass
class QMIXState:
    params: Any  # {'q': ..., 'mixer': ...}
    target_params: Any
    opt_state: Any
    epsilon: jnp.ndarray
    step: jnp.ndarray


class QMIXAgent:
    def __init__(self, network, env_params: EnvParams,
                 global_state_dim: int, config: QMIXConfig = QMIXConfig()):
        self.net = network
        self.env_params = env_params
        self.cfg = config
        self.mixer = HeteroQMIXMixer(
            num_agents=env_params.num_agents,
            mixing_embed_dim=config.mixing_embed_dim,
            hypernet_embed=config.hypernet_embed,
        )
        self.global_state_dim = global_state_dim
        self.tx = optax.chain(
            optax.clip_by_global_norm(config.grad_clip),
            optax.adam(config.lr),
        )

    def init(self, key, example_graph: HeteroGraph) -> QMIXState:
        k1, k2 = jax.random.split(key)
        q_params = self.net.init(k1, example_graph)
        mixer_params = self.mixer.init(
            k2,
            jnp.zeros((1, self.env_params.num_agents)),
            jnp.zeros((1, self.global_state_dim)),
        )
        params = {"q": q_params, "mixer": mixer_params}
        return QMIXState(
            params=params,
            target_params=params,
            opt_state=self.tx.init(params),
            epsilon=jnp.float32(self.cfg.epsilon_start),
            step=jnp.int32(0),
        )

    def q_values(self, q_params, graph: HeteroGraph) -> jnp.ndarray:
        out = self.net.apply(q_params, graph)
        return jnp.concatenate(
            [out["agv_q_values"], out["picker_q_values"]], axis=0
        )

    def act(self, state: QMIXState, graph, masks, key, training=True,
            active=None):
        q = self.q_values(state.params["q"], graph)
        if self.cfg.coordinated:
            return coordination.coordinated_epsilon_greedy(
                q, masks, self.env_params.num_agvs,
                1 + self.env_params.num_goals, state.epsilon, key,
                active=active, training=training,
            )
        masked_q = jnp.where(masks > 0, q, -jnp.inf)
        greedy = jnp.argmax(masked_q, axis=-1)
        k1, k2 = jax.random.split(key)
        logits = jnp.where(masks > 0, 0.0, -1e9)
        rand = jax.random.categorical(k1, logits, axis=-1)
        explore = (jax.random.uniform(k2, greedy.shape) < state.epsilon) & training
        return jnp.where(explore, rand, greedy).astype(jnp.int32)

    def _graph(self, feats):
        return build_hetero_graph(
            self.env_params, feats["agv"], feats["picker"], feats["loc"]
        )

    def learn(self, state: QMIXState, batch: Dict):
        """batch: obs_feats/next_feats, global_state/next_global_state
        (B, S), actions (B, A), reward (B,) team, done (B,)."""
        cfg = self.cfg

        def loss_fn(params):
            def q_taken_one(p, feats, actions):
                q = self.q_values(p, feats_g := self._graph(feats))
                return jnp.take_along_axis(
                    q, actions[:, None], -1
                ).squeeze(-1)

            q_taken = jax.vmap(
                lambda f, a: q_taken_one(params["q"], f, a)
            )(batch["obs_feats"], batch["actions"])  # (B, A)
            q_tot = self.mixer.apply(
                params["mixer"], q_taken, batch["global_state"]
            )  # (B,)

            # Double DQN: argmax by online net, evaluate by target net
            # (reference run_gnode.py:869-883), restricted to valid actions
            # (see graphs.hetero.masks_from_feats).
            def next_q_one(feats):
                g = self._graph(feats)
                masks = masks_from_feats(
                    self.env_params, feats["agv"], feats["picker"],
                    feats["loc"],
                )
                q_online = jnp.where(
                    masks > 0, self.q_values(params["q"], g), -1e9
                )
                if cfg.coordinated:
                    # Same claim auction as act(): busy agents (targets
                    # reconstructed from the stored features) select but
                    # never claim, so the target max ranges over the
                    # conflict-constrained joint actions the behavior
                    # policy can actually take.
                    a_star = coordination.coordinated_argmax(
                        q_online, masks, self.env_params.num_agvs,
                        1 + self.env_params.num_goals,
                        active=~coordination.busy_from_feats(
                            feats["agv"], feats["picker"]
                        ),
                    )
                else:
                    a_star = jnp.argmax(q_online, axis=-1)
                q_tgt = self.q_values(state.target_params["q"], g)
                return jnp.take_along_axis(
                    q_tgt, a_star[:, None], -1
                ).squeeze(-1)

            next_q = jax.vmap(next_q_one)(batch["next_feats"])  # (B, A)
            next_tot = self.mixer.apply(
                state.target_params["mixer"], next_q,
                batch["next_global_state"],
            )
            # n-step: 'reward' is the discounted n-step return and
            # 'gamma_eff' = gamma^m (defaults to 1-step).
            gamma_eff = batch.get("gamma_eff", cfg.gamma)
            not_done = 1.0 - batch["done"].astype(jnp.float32)
            boot = h_inverse(next_tot) if cfg.value_transform else next_tot
            if cfg.td_clip > 0:
                boot = jnp.clip(boot, -cfg.td_clip, cfg.td_clip)
            raw_target = batch["reward"] + gamma_eff * boot * not_done
            if cfg.td_clip > 0:
                raw_target = jnp.clip(raw_target, -cfg.td_clip, cfg.td_clip)
            target = (
                h_transform(raw_target) if cfg.value_transform else raw_target
            )
            target = jax.lax.stop_gradient(target)
            if cfg.huber_delta > 0:
                return jnp.mean(
                    optax.losses.huber_loss(q_tot, target,
                                            delta=cfg.huber_delta)
                )
            return jnp.mean((q_tot - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        step = state.step + 1
        if cfg.target_tau > 0:
            tau = cfg.target_tau
            target_params = jax.tree.map(
                lambda t, p: (1.0 - tau) * t + tau * p,
                state.target_params,
                params,
            )
        else:
            sync = (step % cfg.update_target_freq) == 0
            target_params = jax.tree.map(
                lambda t, p: jnp.where(sync, p, t), state.target_params, params
            )
        new_state = QMIXState(
            params=params,
            target_params=target_params,
            opt_state=opt_state,
            epsilon=jnp.maximum(
                state.epsilon * cfg.epsilon_decay, cfg.epsilon_min
            ),
            step=step,
        )
        return new_state, {"loss": loss, "epsilon": new_state.epsilon}
