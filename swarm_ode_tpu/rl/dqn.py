"""Independent Q-learning (IQL) over heterogeneous graph networks.

Parity: SimpleIndependentDQN (reference run_gnode.py:529-716; GRU variant
gru.py:513-706): epsilon-greedy masked action selection, per-agent TD
targets split by type, target network, grad clip 1.0, epsilon decay per
learn call. The reference loops over replay samples one by one
(run_gnode.py:624-676); here the whole batch is vmapped.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from swarm_ode_tpu.graphs.hetero import (
    HeteroGraph,
    build_hetero_graph,
    masks_from_feats,
)
from swarm_ode_tpu.env.state import EnvParams
from swarm_ode_tpu.rl import coordination


@dataclasses.dataclass
class DQNConfig:
    lr: float = 1e-3
    gamma: float = 0.99
    epsilon_start: float = 1.0
    epsilon_decay: float = 0.995
    epsilon_min: float = 0.01
    grad_clip: float = 1.0
    batch_size: int = 32
    # Conflict-masked sequential action selection (rl/coordination.py)
    # for the behavior policy only: IQL's per-agent TD target is an
    # independent max by definition (independent learners), so only
    # act() coordinates; the critic keeps the standard IQL semantics.
    coordinated: bool = False


@struct.dataclass
class DQNState:
    params: Any
    target_params: Any
    opt_state: Any
    epsilon: jnp.ndarray
    step: jnp.ndarray


class IQLAgent:
    """Functional IQL agent. `network` is a composite model with
    init(key, graph) / apply(params, graph) -> {'agv_q_values', ...}."""

    def __init__(self, network, env_params: EnvParams,
                 config: DQNConfig = DQNConfig()):
        self.net = network
        self.env_params = env_params
        self.cfg = config
        self.tx = optax.chain(
            optax.clip_by_global_norm(config.grad_clip),
            optax.adam(config.lr),
        )

    def init(self, key, example_graph: HeteroGraph) -> DQNState:
        params = self.net.init(key, example_graph)
        return DQNState(
            params=params,
            target_params=params,
            opt_state=self.tx.init(params),
            epsilon=jnp.float32(self.cfg.epsilon_start),
            step=jnp.int32(0),
        )

    # ------------------------------------------------------------------
    def q_values(self, params, graph: HeteroGraph, extras=None) -> jnp.ndarray:
        """(A_total, action_size) stacked AGV-then-picker Q values.

        `extras` carries recurrent state for GRU networks (reference
        gru.py:513-706 stores hidden states alongside transitions)."""
        if extras is None:
            out = self.net.apply(params, graph)
        else:
            out = self.net.apply(params, graph, *extras)
        return jnp.concatenate(
            [out["agv_q_values"], out["picker_q_values"]], axis=0
        )

    def act(self, state: DQNState, graph: HeteroGraph, masks: jnp.ndarray,
            key, training: bool = True, extras=None,
            active=None) -> jnp.ndarray:
        """Masked epsilon-greedy (reference run_gnode.py:572-612)."""
        q = self.q_values(state.params, graph, extras)
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
        random_actions = jax.random.categorical(k1, logits, axis=-1)
        explore = (
            jax.random.uniform(k2, greedy.shape) < state.epsilon
        ) & training
        return jnp.where(explore, random_actions, greedy).astype(jnp.int32)

    # ------------------------------------------------------------------
    def _graphs_from_feats(self, feats):
        return build_hetero_graph(
            self.env_params, feats["agv"], feats["picker"], feats["loc"]
        )

    def learn(self, state: DQNState, batch: Dict) -> tuple:
        """One gradient step on a sampled batch.

        batch: dict with 'obs_feats'/'next_feats' ({'agv','picker','loc'}
        each (B, ..., D)), 'actions' (B, A), 'rewards' (B, A), 'dones' (B,).
        """
        cfg = self.cfg
        A = self.env_params.num_agvs

        has_extras = "extras" in batch

        def td_loss(params):
            def one(feats, next_feats, actions, rewards, done, gamma_eff,
                    *extras):
                ex = nex = None
                if has_extras:
                    ex, nex = extras
                g = self._graphs_from_feats(feats)
                gn = self._graphs_from_feats(next_feats)
                q = self.q_values(params, g, ex)  # (N, act)
                qn = self.q_values(state.target_params, gn, nex)
                # Mask the bootstrap max to valid next actions (see
                # graphs.hetero.masks_from_feats).
                next_masks = masks_from_feats(
                    self.env_params, next_feats["agv"], next_feats["picker"],
                    next_feats["loc"],
                )
                qn = jnp.where(next_masks > 0, qn, -1e9)
                q_taken = jnp.take_along_axis(
                    q, actions[:, None], axis=-1
                ).squeeze(-1)
                # 'rewards' may be a discounted n-step return with
                # gamma_eff = gamma^m (1-step by default).
                target = rewards + gamma_eff * qn.max(-1) * (1.0 - done)
                target = jax.lax.stop_gradient(target)
                err = (q_taken - target) ** 2
                # Reference computes separate AGV / picker losses then sums
                # (run_gnode.py:638-674) — same total as summing both splits.
                if self.env_params.num_pickers == 0:
                    return err.mean()
                return err[:A].mean() + err[A:].mean()

            B = batch["actions"].shape[0]
            args = [
                batch["obs_feats"],
                batch["next_feats"],
                batch["actions"],
                batch["rewards"],
                batch["dones"].astype(jnp.float32),
                batch.get("gamma_eff", jnp.full(B, cfg.gamma)),
            ]
            if has_extras:
                args += [batch["extras"], batch["next_extras"]]
            losses = jax.vmap(one)(*args)
            return losses.mean()

        loss, grads = jax.value_and_grad(td_loss)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        epsilon = jnp.maximum(
            state.epsilon * cfg.epsilon_decay, cfg.epsilon_min
        )
        new_state = DQNState(
            params=params,
            target_params=state.target_params,
            opt_state=opt_state,
            epsilon=epsilon,
            step=state.step + 1,
        )
        return new_state, {"loss": loss, "epsilon": epsilon}

    def sync_target(self, state: DQNState) -> DQNState:
        """Copy online -> target (reference run_gnode.py:564-566)."""
        return state.replace(target_params=state.params)
