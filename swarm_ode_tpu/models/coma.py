"""COMA actors, centralized critic, and counterfactual advantage.

Parity: COMAActorNetwork / COMACriticNetwork / counterfactual baseline
(reference gru.py:182-404) and the type-level variant's structure
(run_gnode.py:169-527). The reference's training wiring is only partially
functional (SURVEY.md §2.4 M9); here the pieces are complete and tested.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class COMAActor(nn.Module):
    """embedding -> hidden -> hidden -> action logits
    (reference gru.py:182-203)."""

    action_dim: int
    hidden_dim: int = 64

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(nn.Dense(self.hidden_dim)(obs))
        h = nn.relu(nn.Dense(self.hidden_dim)(h))
        return nn.Dense(self.action_dim)(h)


def masked_action_probs(logits: jnp.ndarray, action_mask=None) -> jnp.ndarray:
    """Softmax with -1e9 masking (reference gru.py:205-213)."""
    if action_mask is not None:
        logits = jnp.where(action_mask > 0, logits, -1e9)
    return jax.nn.softmax(logits, axis=-1)


class COMACritic(nn.Module):
    """Centralized critic: (global state, all one-hot actions) -> per-agent
    Q (reference gru.py:224-266)."""

    n_agents: int
    action_dim: int
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, global_state: jnp.ndarray, all_actions: jnp.ndarray):
        """global_state: (B, S); all_actions: (B, N) int -> (B, N)."""
        onehot = jax.nn.one_hot(all_actions, self.action_dim)
        onehot = onehot.reshape(all_actions.shape[0], -1)
        h = jnp.concatenate([global_state, onehot], axis=-1)
        h = nn.relu(nn.Dense(self.hidden_dim)(h))
        h = nn.relu(nn.Dense(self.hidden_dim)(h))
        h = nn.relu(nn.Dense(self.hidden_dim)(h))
        return nn.Dense(self.n_agents)(h)


def counterfactual_advantage(
    critic_apply,
    critic_params,
    global_state: jnp.ndarray,  # (B, S)
    all_actions: jnp.ndarray,  # (B, N)
    action_probs: jnp.ndarray,  # (B, action_dim) for agent_idx
    agent_idx: int,
    action_dim: int,
) -> jnp.ndarray:
    """COMA counterfactual advantage for one agent
    (reference gru.py:360-404): A_i = Q(s, u) - sum_a pi_i(a) Q(s, (u_-i, a)).
    Vectorized over the action sweep instead of the reference's Python loop.
    """
    current_q = critic_apply(critic_params, global_state, all_actions)[:, agent_idx]

    def q_for(a):
        cf = all_actions.at[:, agent_idx].set(a)
        return critic_apply(critic_params, global_state, cf)[:, agent_idx]

    cf_q = jax.vmap(q_for)(jnp.arange(action_dim))  # (A, B)
    baseline = jnp.sum(action_probs.T * cf_q, axis=0)  # (B,)
    return current_q - baseline
