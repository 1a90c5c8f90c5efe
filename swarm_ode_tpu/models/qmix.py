"""QMIX mixing networks.

Parity:
  * `QMixer` — hypernetwork mixer with |W| monotonicity and ELU hidden
    layer (reference graph.py:146-183).
  * `HeteroQMIXMixer` — the state-encoder variant used by QMIXAgent
    (reference run_gnode.py:934-1009).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class QMixer(nn.Module):
    """Q_tot = w2(s)^T · elu(W1(s) q + b1(s)) + b2(s), weights through abs
    (reference graph.py:146-183)."""

    num_agents: int
    state_dim: int
    mixing_embed_dim: int = 32

    @nn.compact
    def __call__(self, agent_qs: jnp.ndarray, states: jnp.ndarray):
        """agent_qs: (B, N); states: (B, state_dim) -> (B, 1)."""
        B = agent_qs.shape[0]
        E, N = self.mixing_embed_dim, self.num_agents
        w1 = jnp.abs(nn.Dense(E * N, name="hyper_w1")(states)).reshape(B, N, E)
        b1 = nn.Dense(E, name="hyper_b1")(states).reshape(B, 1, E)
        hidden = nn.elu(jnp.einsum("bn,bne->be", agent_qs, w1)[:, None, :] + b1)
        w2 = jnp.abs(nn.Dense(E, name="hyper_w2")(states)).reshape(B, E, 1)
        b2 = nn.Dense(1, name="hyper_b2")(states).reshape(B, 1, 1)
        q_tot = jnp.einsum("bie,bej->bij", hidden, w2) + b2
        return q_tot.reshape(B, 1)


class HeteroQMIXMixer(nn.Module):
    """State-encoder hypernetwork mixer (reference run_gnode.py:950-1009):
    encode the global state, then a two-layer monotonic mix of the taken
    Q-values."""

    num_agents: int
    mixing_embed_dim: int = 32
    hypernet_embed: int = 64

    @nn.compact
    def __call__(self, all_q_taken: jnp.ndarray, global_state: jnp.ndarray):
        """all_q_taken: (B, N); global_state: (B, S) -> (B,)."""
        B, N = all_q_taken.shape
        E = self.mixing_embed_dim
        s = nn.Dense(self.hypernet_embed, name="state_enc1")(global_state)
        s = nn.relu(s)
        s = nn.Dense(self.hypernet_embed, name="state_enc2")(s)
        w1 = nn.relu(nn.Dense(E * self.num_agents, name="hyper_w1")(s))
        w1 = jnp.abs(w1)[:, : N * E].reshape(B, E, N)
        b1 = nn.Dense(E, name="hyper_b1")(s)  # (B, E)
        hidden = nn.elu(jnp.einsum("ben,bn->be", w1, all_q_taken) + b1)
        # NOTE: the reference's hyper_w2 emits a scalar then reshapes it to E
        # values — a latent shape bug (run_gnode.py:963-967,:1004; SURVEY.md
        # §2.6). Working equivalent: emit E mixing weights.
        w2h = nn.relu(nn.Dense(E, name="hyper_w2a")(s))
        w2 = jnp.abs(nn.Dense(E, name="hyper_w2b")(w2h))  # (B, E)
        b2h = nn.relu(nn.Dense(E, name="hyper_b2a")(s))
        b2 = nn.Dense(1, name="hyper_b2b")(b2h)  # (B, 1)
        q_tot = (hidden * w2).sum(-1, keepdims=True) + b2
        return q_tot.squeeze(-1)
